"""Observability: circuit stats, per-gate bandwidth accounting, profiling.

The tracing/metrics subsystem (SURVEY.md §5 — absent in the reference
beyond ``pipeline_depth``): gate-count/pass statistics from the compiled
plan, HBM-traffic estimates per pass (2 x 2^n x sizeof(amp) bytes moved per
gate sweep), a wall-clock profiler that synchronizes correctly over the
remote TPU transport, and a ``jax.profiler`` trace hook for Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from rustqip_tpu.builder.circuit_objects import (
    MeasurementObject,
    flatten_pipeline,
)


@dataclass
class CircuitStats:
    """Static circuit statistics (pre- and post-compilation)."""

    n_qubits: int
    pipeline_depth: int
    unrolled_gates: int
    measurements: int
    gate_counts: Dict[str, int] = field(default_factory=dict)
    fused_passes: Optional[int] = None
    bytes_per_pass: Optional[int] = None
    est_hbm_traffic_bytes: Optional[int] = None

    def __str__(self) -> str:
        lines = [
            f"qubits: {self.n_qubits}",
            f"pipeline depth: {self.pipeline_depth} "
            f"({self.unrolled_gates} unrolled gates, "
            f"{self.measurements} measurements)",
            f"gate counts: {self.gate_counts}",
        ]
        if self.fused_passes is not None:
            lines.append(
                f"fused passes: {self.fused_passes} "
                f"(~{self.est_hbm_traffic_bytes / 1e9:.2f} GB HBM traffic)"
            )
        return "\n".join(lines)


def circuit_stats(builder, compiled: bool = True) -> CircuitStats:
    """Gate-count / pass / bandwidth statistics for a builder's circuit."""
    flat = flatten_pipeline(builder.pipeline)
    counts: Dict[str, int] = {}
    measurements = 0
    for _, co in flat:
        if isinstance(co.obj, MeasurementObject):
            measurements += 1
            continue
        kind = type(co.obj).__name__
        name = getattr(co.obj, "name", None)
        key = name if name else kind
        counts[key] = counts.get(key, 0) + 1
    stats = CircuitStats(
        n_qubits=builder.n,
        pipeline_depth=builder.pipeline_depth(),
        unrolled_gates=len(flat) - measurements,
        measurements=measurements,
        gate_counts=counts,
    )
    if compiled:
        cc = builder.compile()
        stats.fused_passes = cc.num_sweeps
        amp_bytes = np.dtype(builder.dtype).itemsize
        stats.bytes_per_pass = 2 * (1 << builder.n) * amp_bytes
        stats.est_hbm_traffic_bytes = stats.fused_passes * stats.bytes_per_pass
    return stats


def profile_circuit(
    builder, iters: int = 5, seed: int = 0
) -> Dict[str, float]:
    """Wall-clock profile: compile time + steady-state run time.

    Synchronizes via scalar fetches (block_until_ready is unreliable over
    the axon relay transport).
    """
    import jax

    cc = builder.compile()
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    re, im, _ = cc.run(initial_index=0, key=key)
    float(re[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        re, im, _ = cc.run(initial_index=0, key=key)
    float(re[0])
    steady_s = (time.time() - t0) / iters
    sweeps = cc.num_sweeps
    out = {
        "compile_plus_first_s": compile_s,
        "steady_run_s": steady_s,
        "gate_passes": float(cc.num_passes),
        "hbm_sweeps": float(sweeps),
        "ms_per_sweep": steady_s / max(sweeps, 1) * 1e3,
    }
    amp_bytes = np.dtype(builder.dtype).itemsize
    out["effective_gbps"] = (
        sweeps * 2 * (1 << builder.n) * amp_bytes / steady_s / 1e9
        if steady_s > 0
        else float("inf")
    )
    return out


def _kernel_ok(builder) -> bool:
    """Whether ``apply_ops_ri`` will take the Pallas window-kernel path
    for this builder's circuit — read from the compiled circuit's own
    fixed policy (Pallas available + f32 planes; sharded circuits force
    False), so the profilers' sweep decomposition is identical to
    execution by construction."""
    return builder.compile()._kernel_ok


def pass_breakdown(builder) -> list:
    """Static per-sweep breakdown of the compiled circuit.

    Returns one dict per HBM sweep (strip window), in execution order:
    which fused ops it retires, the window's row bits and step-type
    composition (``mix``/``low``/``cbf``/``rbf``/``cmix``/``diag``), whether the Pallas
    kernel takes it, and the estimated HBM bytes it moves. Host-side only
    (no device work) — the static half of the ROADMAP "per-pass timing
    breakdown" (the reference has no tracing at all, SURVEY.md §5).
    Sweep boundaries come from the engine's own ``plan_sweeps`` with the
    backend's real kernel availability, so they match execution exactly.
    """
    from rustqip_tpu.engine.compile import MeasureEntry
    from rustqip_tpu.engine.real_apply import plan_sweeps

    cc = builder.compile()
    n = cc.n
    kernel_ok = _kernel_ok(builder)
    amp_bytes = np.dtype(builder.dtype).itemsize
    sweep_bytes = 2 * (1 << n) * amp_bytes
    out = []

    def emit(ops, repeat=1):
        for kind, payload, run in plan_sweeps(n, ops, kernel_ok):
            if kind == "op":
                out.append(
                    {
                        "kind": type(payload).__name__,
                        "ops": 1,
                        "repeat": repeat,
                        "steps": {},
                        "kernel": False,
                        "est_bytes": sweep_bytes,
                    }
                )
                continue
            hq, steps = payload
            counts: Dict[str, int] = {}
            for s in steps:
                counts[s[0]] = counts.get(s[0], 0) + 1
            out.append(
                {
                    "kind": "window",
                    "ops": len(run),
                    "repeat": repeat,
                    "row_bits": list(hq),
                    "steps": counts,
                    "kernel": kind == "kwindow",
                    "est_bytes": sweep_bytes,
                }
            )

    for seg in cc.segments:
        if isinstance(seg, MeasureEntry):
            out.append(
                {
                    "kind": "measure",
                    "ops": 0,
                    "repeat": 1,
                    "steps": {},
                    "kernel": False,
                    "est_bytes": sweep_bytes,
                }
            )
            continue
        if isinstance(seg, tuple) and seg[0] == "repeat":
            emit(seg[2], repeat=seg[1])
            continue
        emit(seg)
    return out


def _collect_runs(cc, kernel_ok: bool) -> list:
    """The op run of each HBM sweep of a compiled circuit, in execution
    order (measurement segments skipped) — the shared sweep-boundary
    walk behind both profilers, delegating to the engine's own
    ``plan_sweeps`` so boundaries match execution."""
    from rustqip_tpu.engine.compile import MeasureEntry
    from rustqip_tpu.engine.real_apply import plan_sweeps

    runs = []
    for seg in cc.segments:
        if isinstance(seg, MeasureEntry):
            continue
        ops = seg[2] if isinstance(seg, tuple) and seg[0] == "repeat" else seg
        for _kind, _payload, run in plan_sweeps(cc.n, ops, kernel_ok):
            runs.append(list(run))
    return runs


def _initial_pair(dim: int, rdtype, seed):
    """Initial (re, im) planes for profiling: ``seed=None`` -> |0..0>;
    an int seeds a random normalized state (gate cost is state-independent
    on this engine, but a random state exercises non-trivial values
    through every lane)."""
    import jax.numpy as jnp

    if seed is None:
        return (
            jnp.zeros(dim, rdtype).at[0].set(1.0),
            jnp.zeros(dim, rdtype),
        )
    rng = np.random.default_rng(seed)
    v = rng.normal(size=dim) + 1j * rng.normal(size=dim)
    v /= np.linalg.norm(v)
    return (
        jnp.asarray(v.real, dtype=rdtype),
        jnp.asarray(v.imag, dtype=rdtype),
    )


def profile_passes(builder, iters: int = 3, seed=None) -> list:
    """Measured per-sweep timing: run each sweep's op run as its own
    donated jit program and report ms + effective GB/s per sweep.

    ``seed``: None profiles from |0..0>; an int profiles from a seeded
    random normalized state.

    NOTE: costs one XLA compile per distinct sweep — cheap on CPU,
    minutes-per-sweep over the axon TPU relay (use ``pass_breakdown`` for
    the free static view). Scalar-fetch synchronization throughout.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from rustqip_tpu.engine.real_apply import apply_ops_ri

    cc = builder.compile()
    n = cc.n
    rdtype = cc.rdtype
    amp_bytes = np.dtype(builder.dtype).itemsize
    sweep_bytes = 2 * (1 << n) * amp_bytes
    breakdown = pass_breakdown(builder)
    runs = _collect_runs(cc, _kernel_ok(builder))
    dim = 1 << n
    re, im = _initial_pair(dim, rdtype, seed)
    results = []
    gates = iter(b for b in breakdown if b["kind"] != "measure")
    for run_ops in runs:
        info = next(gates)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(a, b, run_ops=tuple(run_ops)):
            return apply_ops_ri(n, list(run_ops), a, b)

        re, im = step(re, im)
        float(re[0])  # sync (compile + first run excluded from timing)
        t0 = time.time()
        for _ in range(iters):
            re, im = step(re, im)
        float(re[0])
        dt = (time.time() - t0) / iters
        results.append(
            {
                **info,
                "ms": dt * 1e3,
                "gbps": sweep_bytes / dt / 1e9 if dt > 0 else float("inf"),
            }
        )
    return results


def profile_passes_fused(
    builder, extra_reps: int = 7, iters: int = 2, seed=None
) -> list:
    """Measured per-sweep timing from ONE compiled program.

    ``seed``: None profiles from |0..0>; an int profiles from a seeded
    random normalized state (regenerated per timed execution — the planes
    are donated).

    ``profile_passes`` costs one XLA compile per sweep — minutes each over
    the axon TPU relay. This variant compiles a single jit program whose
    per-sweep repeat counts are a runtime int32 vector (each sweep wrapped
    in a ``lax.fori_loop`` with a traced bound): sweep k's cost is
    recovered as ``(T(ones + e_k * extra_reps) - T(ones)) / extra_reps``.
    One compile, ``num_sweeps + 1`` timed executions. Extra repeats of a
    unitary sweep change the final state but not its shape or norm — the
    profiled program is for timing, not for results.

    Sweeps inside a ``repeat`` segment are profiled at one iteration of
    the loop body; measurement segments are skipped (as in
    ``profile_passes``).

    NOTE (axon relay): the single program wraps every sweep in a
    while_loop, which defeats the relay compile cache's reuse across
    sweeps — one compile, but a big one (observed >15 min for a
    Pallas-window circuit). On a standard TPU install the one-compile
    trade is strictly better; over the relay prefer ``pass_breakdown``
    for quick looks.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from rustqip_tpu.engine.real_apply import apply_ops_ri

    cc = builder.compile()
    n = cc.n
    rdtype = cc.rdtype
    amp_bytes = np.dtype(builder.dtype).itemsize
    sweep_bytes = 2 * (1 << n) * amp_bytes
    breakdown = [b for b in pass_breakdown(builder) if b["kind"] != "measure"]
    runs = _collect_runs(cc, _kernel_ok(builder))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def prog(re, im, reps):
        for k, run_ops in enumerate(runs):
            ops_k = tuple(run_ops)

            def body(_, carry, ops_k=ops_k):
                r, i = carry
                return apply_ops_ri(n, list(ops_k), r, i)

            re, im = jax.lax.fori_loop(0, reps[k], body, (re, im))
        return re, im

    dim = 1 << n
    nr = len(runs)

    def timed(reps_np):
        reps = jnp.asarray(reps_np, dtype=jnp.int32)
        best = float("inf")
        for _ in range(iters):
            re, im = _initial_pair(dim, rdtype, seed)
            t0 = time.time()
            re, im = prog(re, im, reps)
            float(re[0])  # scalar-fetch sync (relay-safe)
            best = min(best, time.time() - t0)
        return best

    ones = np.ones(nr, np.int32)
    timed(ones)  # compile + warm
    t_base = timed(ones)
    results = []
    for k in range(nr):
        reps = ones.copy()
        reps[k] += extra_reps
        delta = timed(reps) - t_base
        dt = max(delta, 0.0) / extra_reps
        # A non-positive delta means the sweep's cost is below the
        # per-call noise floor — flag it instead of reporting gbps=inf.
        below_floor = delta <= 0
        results.append(
            {
                **breakdown[k],
                "ms": dt * 1e3,
                "gbps": (
                    float("nan")
                    if below_floor
                    else sweep_bytes / dt / 1e9
                ),
                "below_noise_floor": below_floor,
            }
        )
    return results


@contextlib.contextmanager
def trace(log_dir: str):
    """Perfetto/XProf trace of everything inside the block
    (``jax.profiler`` — view with xprof/tensorboard)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
