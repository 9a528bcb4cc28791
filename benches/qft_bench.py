"""QFT-28 end-to-end wall-clock on the default backend.

The reference's closest shape is the qfft example circuit
(qip/src/qfft.rs:7-40) scaled to a realistic state size. Builds QFT-28
through the builder + fusion stack and times steady-state execution of
the compiled op sequence (donated buffers, scalar-fetch sync).

Measured on v5e (RUSTQIP_TPU_PALLAS=1): 0.425 s steady — six HBM
sweeps (5 Pallas windows + the bit-reversal transpose) for 48 fused
ops / 406 raw gates. Round 1: 0.98 s.

Usage: RUSTQIP_TPU_PALLAS=1 python benches/qft_bench.py [n]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rustqip_tpu.algos.qfft import qfft
from rustqip_tpu.builder.builder import LocalBuilder, _lower_item
from rustqip_tpu.engine import pallas_kernels
from rustqip_tpu.engine.compile import UnitaryEntry
from rustqip_tpu.engine.fusion import fuse_ops
from rustqip_tpu.engine.real_apply import apply_ops_ri, plan_sweeps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    b = LocalBuilder()
    qfft(b, b.register(n))
    entries = []
    for item in b.pipeline:
        entries.extend(_lower_item(item))
    qops = fuse_ops([e.op for e in entries if isinstance(e, UnitaryEntry)])
    kernel_ok = pallas_kernels.available()
    print(
        f"n={n}: {len(qops)} fused ops, "
        f"{len(plan_sweeps(n, qops, kernel_ok))} sweeps "
        f"({'kernel' if kernel_ok else 'XLA-fallback'} plan)",
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
    print(f"qft_{n} steady: {best:.3f} s (trials {[round(t, 3) for t in times]})")


if __name__ == "__main__":
    main()
