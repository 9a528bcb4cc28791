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


@contextlib.contextmanager
def trace(log_dir: str):
    """Perfetto/XProf trace of everything inside the block
    (``jax.profiler`` — view with xprof/tensorboard)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
