"""Arithmetic-adder end-to-end wall-clock on the default backend.

The reference's arithmetic macros (qip/src/macros/program/arithmetic.rs:
add/add_op) compile to CCX/CNOT carry chains — the op shape the round-3
controlled-butterfly kernel path targets. This bench builds `add` on a
k-bit + (k+1)-bit register pair (n = 3k+1 qubits), lowers it through the
SAME pipeline as engine/compile._plan (swap deferral + fusion with the
butterfly keep-predicate), and times steady-state execution of the
planned sweeps (donated buffers, scalar-fetch sync).

A/B the round-3 path with the env hatch (RUSTQIP_TPU_PALLAS=1 is
REQUIRED on the axon relay host, where the kernel path defaults off —
without it both arms silently benchmark the same dense plan):

    RUSTQIP_TPU_PALLAS=1 RUSTQIP_TPU_KEEP_BUTTERFLY=0 \
        python benches/arith_bench.py 9                      # dense
    RUSTQIP_TPU_PALLAS=1 python benches/arith_bench.py 9     # kernel

At k=9 (n=28) the plan goes 17 dense sweeps -> 8 sweeps (5 kernel
windows carrying the CCX/CNOT chains as masked roll butterflies).
With round 3's "cmix" steps (multi-controlled gates with HIGH row-bit
targets become inter-strip controlled butterflies) and window-aware
fusion, the same adder plans to 5 kernel sweeps, zero fallbacks.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rustqip_tpu.algos import arithmetic
from rustqip_tpu.builder.builder import LocalBuilder
from rustqip_tpu.engine import pallas_kernels, relabel
from rustqip_tpu.engine.compile import UnitaryEntry
from rustqip_tpu.engine.fusion import fuse_ops
from rustqip_tpu.engine.real_apply import (
    apply_ops_ri,
    butterfly_eligible,
    plan_sweeps,
)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    b = LocalBuilder()
    ra = b.register(k)
    rb = b.register(k + 1)
    rc = b.make_zeroed_temp_register(k)
    arithmetic.add(b, rc, ra, rb)
    cc = b.compile()
    n = cc.n
    raw = [e.op for e in cc.entries if isinstance(e, UnitaryEntry)]
    pos = list(range(n))
    raw = relabel.defer_swaps_ops(n, raw, pos) + relabel.materialize(pos)
    keep_on = (
        pallas_kernels.available()
        and os.environ.get("RUSTQIP_TPU_KEEP_BUTTERFLY", "1") != "0"
    )
    keep = (lambda op: butterfly_eligible(n, op)) if keep_on else None
    # Window-aware fusion, THE SAME predicate and gating engine/compile
    # uses (shared helper — the arms cannot drift): joint_ok keys on
    # kernel availability + RUSTQIP_TPU_WINDOW_FUSION, independent of
    # the KEEP_BUTTERFLY hatch.
    from rustqip_tpu.engine.real_apply import window_joint_ok

    joint_ok = None
    if (
        pallas_kernels.available()
        and os.environ.get("RUSTQIP_TPU_WINDOW_FUSION", "1") != "0"
    ):
        joint_ok = window_joint_ok(n)

    qops = fuse_ops(raw, keep=keep, joint_ok=joint_ok)
    kernel_ok = pallas_kernels.available()
    plan = plan_sweeps(n, qops, kernel_ok)
    nk = sum(1 for kind, _, _ in plan if kind == "kwindow")
    print(
        f"add k={k} n={n}: {len(raw)} raw ops, {len(qops)} after fusion "
        f"(keep={'on' if keep_on else 'off'}), {len(plan)} sweeps "
        f"({nk} kernel)",
        file=sys.stderr,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(re, im):
        return apply_ops_ri(n, qops, re, im)

    dim = 1 << n
    re = jnp.zeros(dim, jnp.float32).at[0].set(1.0)
    im = jnp.zeros(dim, jnp.float32)
    t0 = time.time()
    r, i = step(re, im)
    float(r[0])
    print(f"compile+first: {time.time() - t0:.1f} s", file=sys.stderr)
    times = []
    for _ in range(3):
        t0 = time.time()
        r, i = step(r, i)
        float(r[0])
        times.append(time.time() - t0)
    best = min(times)
    gps = len(raw) / best
    print(
        f"add_k{k}_n{n} keep={'on' if keep_on else 'off'}: {best * 1e3:.1f} ms "
        f"steady ({gps:.1f} raw gates/s; trials {[round(t, 4) for t in times]})"
    )


if __name__ == "__main__":
    main()
