"""Shared A/B wiring for the circuit benches (arith_bench, grover_bench).

Both benches lower a builder circuit through THE SAME pipeline as
``engine/compile._plan`` (swap deferral + fusion with the butterfly
keep-predicate + window-aware ``joint_ok``) and time steady-state
execution of the planned sweeps (donated buffers, scalar-fetch sync).
Factored here so the two benches' policy wiring cannot drift — a hatch
semantics change lands in both arms of both benches at once.

Env hatches (mirroring engine/compile):

- ``RUSTQIP_TPU_PALLAS=1``   REQUIRED on the axon relay host, where the
  kernel path defaults off — without it both arms silently benchmark
  the same dense plan.
- ``RUSTQIP_TPU_KEEP_BUTTERFLY=0`` + ``RUSTQIP_TPU_WINDOW_FUSION=0``
  together give the DENSE arm (plain greedy fusion, no kernel windows).
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

from rustqip_tpu.engine import pallas_kernels, relabel
from rustqip_tpu.engine.compile import UnitaryEntry
from rustqip_tpu.engine.fusion import fuse_ops
from rustqip_tpu.engine.real_apply import (
    apply_ops_ri,
    butterfly_eligible,
    plan_sweeps,
    window_joint_ok,
)


def lower_circuit(cc):
    """CompiledCircuit -> (n, raw_ops, fused_ops, plan, keep_on) via the
    production lowering pipeline with the bench env hatches applied."""
    n = cc.n
    raw = [e.op for e in cc.entries if isinstance(e, UnitaryEntry)]
    pos = list(range(n))
    raw = relabel.defer_swaps_ops(n, raw, pos) + relabel.materialize(pos)
    keep_on = (
        pallas_kernels.available()
        and os.environ.get("RUSTQIP_TPU_KEEP_BUTTERFLY", "1") != "0"
    )
    keep = (lambda op: butterfly_eligible(n, op)) if keep_on else None
    joint_ok = None
    if (
        pallas_kernels.available()
        and os.environ.get("RUSTQIP_TPU_WINDOW_FUSION", "1") != "0"
    ):
        joint_ok = window_joint_ok(n)
    qops = fuse_ops(raw, keep=keep, joint_ok=joint_ok)
    plan = plan_sweeps(n, qops, pallas_kernels.available())
    return n, raw, qops, plan, keep_on


def run_ab(name: str, cc, trials: int = 3, init=None):
    """Lower, report the plan, compile, and time ``trials`` steady-state
    device-side executions (median); prints the one-line result."""
    n, raw, qops, plan, keep_on = lower_circuit(cc)
    nk = sum(1 for kind, _, _ in plan if kind == "kwindow")
    print(
        f"{name} n={n}: {len(raw)} raw ops, {len(qops)} after fusion "
        f"(keep={'on' if keep_on else 'off'}), {len(plan)} sweeps "
        f"({nk} kernel)",
        file=sys.stderr,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(re, im):
        return apply_ops_ri(n, qops, re, im)

    dim = 1 << n
    if init is None:
        re = jnp.zeros(dim, jnp.float32).at[0].set(1.0)
    else:
        re = jnp.asarray(init, jnp.float32)
    im = jnp.zeros(dim, jnp.float32)
    t0 = time.time()
    r, i = step(re, im)
    float(r[0])
    print(f"compile+first: {time.time() - t0:.1f} s", file=sys.stderr)
    times = []
    for _ in range(trials):
        t0 = time.time()
        r, i = step(r, i)
        float(r[0])
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(
        f"{name}_n{n} keep={'on' if keep_on else 'off'}: {med * 1e3:.1f} ms "
        f"median ({len(raw) / med:.1f} raw gates/s; trials "
        f"{[round(t, 4) for t in times]})"
    )
    return med
