"""Grover-iteration end-to-end wall-clock on the default backend.

Grover on n qubits is the second flagship shape (BASELINE.json config 2;
reference ingredients at qip/src/builder_traits.rs:541-568 — the
multi-controlled phase flip the reference decomposes into toffoli
ladders). One `grover_iteration` = oracle phase flip + diffusion: an
H-broadcast + X-broadcast + wide multi-controlled Z — a mix of h=3 mix
windows, butterfly chains, and an rmix seam window, i.e. every kernel
step class except diag.

A/B the window-fusion kernel path against plain greedy fusion (the env
hatches mirror benches/arith_bench.py; RUSTQIP_TPU_PALLAS=1 is REQUIRED
on the axon relay host, where the kernel path defaults off):

    RUSTQIP_TPU_PALLAS=1 python benches/grover_bench.py 28        # kernel
    RUSTQIP_TPU_PALLAS=1 RUSTQIP_TPU_WINDOW_FUSION=0 \
        python benches/grover_bench.py 28                         # dense

Round-3 history (same methodology as the retired /tmp/grover_ab.py,
recorded in BENCH_NOTES.md): window-aware fusion took one n=28
iteration from 855.8 ms (plain greedy) to 181.1 ms (24 kernel sweeps).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rustqip_tpu.algos.grover import grover_iteration
from rustqip_tpu.builder.builder import LocalBuilder
from rustqip_tpu.engine import pallas_kernels, relabel
from rustqip_tpu.engine.compile import UnitaryEntry
from rustqip_tpu.engine.fusion import fuse_ops
from rustqip_tpu.engine.real_apply import (
    apply_ops_ri,
    butterfly_eligible,
    plan_sweeps,
    window_joint_ok,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    marked = (1 << n) - 3
    b = LocalBuilder()
    r = b.register(n)
    grover_iteration(b, r, marked)
    cc = b.compile()
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
    kernel_ok = pallas_kernels.available()
    plan = plan_sweeps(n, qops, kernel_ok)
    nk = sum(1 for kind, _, _ in plan if kind == "kwindow")
    print(
        f"grover n={n}: {len(raw)} raw ops, {len(qops)} after fusion "
        f"(keep={'on' if keep_on else 'off'}), {len(plan)} sweeps "
        f"({nk} kernel)",
        file=sys.stderr,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(re, im):
        return apply_ops_ri(n, qops, re, im)

    dim = 1 << n
    re = jnp.full(dim, 1.0 / (dim**0.5), jnp.float32)
    im = jnp.zeros(dim, jnp.float32)
    t0 = time.time()
    r_, i_ = step(re, im)
    float(r_[0])
    print(f"compile+first: {time.time() - t0:.1f} s", file=sys.stderr)
    times = []
    for _ in range(5):
        t0 = time.time()
        r_, i_ = step(r_, i_)
        float(r_[0])
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(
        f"grover_n{n} keep={'on' if keep_on else 'off'}: {med * 1e3:.1f} ms "
        f"median/iteration ({len(raw) / med:.1f} raw gates/s; trials "
        f"{[round(t, 4) for t in times]})"
    )


if __name__ == "__main__":
    main()
