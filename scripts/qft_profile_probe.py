"""One-compile QFT-28 sweep-group cost breakdown on the real TPU.

Times four branches of ONE jitted program (lax.cond ladder, so the relay
charges a single compile): the full 6-sweep QFT plan, the four strided
h<=3 windows (qubits 0..10), the single rbf/cbf mega-window (qubits
11..27), and the bit-reversal transpose. Used to decide where the
remaining QFT-28 time goes (VERDICT r3 item: lazy qubit relabeling vs
roofline proof).

Usage: RUSTQIP_TPU_PALLAS=1 timeout 1500 python scripts/qft_profile_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
from jax import lax

from rustqip_tpu.algos.qfft import qfft
from rustqip_tpu.builder.builder import LocalBuilder, _lower_item
from rustqip_tpu.engine import pallas_kernels
from rustqip_tpu.engine.compile import UnitaryEntry
from rustqip_tpu.engine.fusion import fuse_ops
from rustqip_tpu.engine.real_apply import apply_ops_ri, plan_sweeps


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    b = LocalBuilder()
    qfft(b, b.register(n))
    entries = []
    for item in b.pipeline:
        entries.extend(_lower_item(item))
    qops = fuse_ops([e.op for e in entries if isinstance(e, UnitaryEntry)])
    kernel_ok = pallas_kernels.available()
    plan = plan_sweeps(n, qops, kernel_ok)
    log(f"n={n}: {len(qops)} fused ops, {len(plan)} sweeps, kernel={kernel_ok}")

    groups = {"full": [], "strided": [], "mega": [], "transpose": []}
    for kind, payload, run in plan:
        groups["full"].extend(run)
        if kind == "op":
            groups["transpose"].extend(run)
        elif kind in ("kwindow", "window"):
            hq = payload[0]
            # the final mega-window is the one containing rbf/cbf steps
            if any(s[0] in ("rbf", "cbf", "low") for s in payload[1]):
                groups["mega"].extend(run)
            else:
                groups["strided"].extend(run)
    names = list(groups)
    for name in names:
        sub = plan_sweeps(n, groups[name], kernel_ok)
        log(f"group {name}: {len(groups[name])} ops, {len(sub)} sweeps")

    branches = [
        (lambda a, bb, ops=tuple(groups[name]): apply_ops_ri(
            n, list(ops), a, bb
        ))
        for name in names
    ]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(re, im, which):
        return lax.switch(which, branches, re, im)

    dim = 1 << n
    re = jnp.zeros(dim, jnp.float32).at[0].set(1.0)
    im = jnp.zeros(dim, jnp.float32)
    t0 = time.time()
    re, im = step(re, im, jnp.int32(0))
    float(re[0])
    log(f"compile+first: {time.time() - t0:.1f} s")

    reps = 5
    for k, name in enumerate(names):
        re, im = step(re, im, jnp.int32(k))  # warm branch
        float(re[0])
        t0 = time.time()
        for _ in range(reps):
            re, im = step(re, im, jnp.int32(k))
        float(re[0])
        dt = (time.time() - t0) / reps
        log(f"branch {name}: {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
