"""TPU micro-probe: gex recombination cost per XOR stage, one chip.

The generalized-permutation exchange (parallel/shard_ops.py, "gex"
entries) recombines each XOR stage as, per nonzero slot,

    acc += where(sel, dr[srcl] * v, 0)

— a whole-flat-shard int32 gather plus a masked multiply-accumulate
(shard_ops.py ~:696). The repo's measured facts say index gathers along
a 128-wide middle axis are pathological on this chip (146-344 ms vs a
37.8 ms transpose at n=28); this probes what THE ACTUAL GEX SHAPE costs
at real shard sizes, shard-locally on one chip, same-session:

  A. arbitrary-index flat gather + where-MAC   [production gex shape]
  B. XOR-mask-index flat gather + where-MAC    [permutation-structured f]
  C. XOR mask via bit-axis flip (relayout candidate for XOR-structured
     sources: reshape keeps the 128 lane axis intact, flips row-bit
     axes, lane bits XOR via a 128-col static take)
  D. where-MAC alone (no gather)               [floor]

Shard sizes: 2^21 (n=24 / 8 devices) and 2^25 (n=28 / 8 devices), f32
re/im plane pairs — a stage moves both planes. Reports ms/stage; a gex
op with h global bits and s slots costs ~ 2^h * s stages of this plus
2^h-1 ppermutes. Ref asymptotics being matched:
qip-iterators/src/iterators/qubit_iterators.rs:223.

Raw numbers to stdout; one JSON line per (size, variant).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPU = "--cpu" in sys.argv
import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(x.reshape(-1)[0])


def timeit(tag, size, fn, *args, trials=5):
    t0 = time.time()
    out = fn(*args)
    sync(out[0])
    compile_s = time.time() - t0
    ts = []
    for _ in range(trials):
        t0 = time.time()
        out = fn(*args)
        sync(out[0])
        ts.append(time.time() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(
        json.dumps(
            {
                "tag": tag,
                "shard_elems_log2": int(np.log2(size)),
                "ms_per_stage": round(med * 1e3, 2),
                "trials_ms": [round(t * 1e3, 2) for t in ts],
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )
    return out


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    sizes = [1 << 15] if CPU else [1 << 21, 1 << 25]
    for size in sizes:
        rng = np.random.default_rng(7)
        xr = jnp.asarray(rng.normal(size=size).astype(np.float32))
        xi = jnp.asarray(rng.normal(size=size).astype(np.float32))
        flat = np.arange(size, dtype=np.int64)
        # Arbitrary mixing permutation (odd multiplier => bijection).
        arb = jnp.asarray((flat * 2654435761 % size).astype(np.int32))
        flat = flat.astype(np.int32)
        mask = (size >> 1) | 5  # one high row bit + two lane bits
        xorm = jnp.asarray(flat ^ mask)
        vr = jnp.asarray(rng.normal(size=size).astype(np.float32))
        sel = jnp.asarray((flat & 1).astype(bool))

        @jax.jit
        def stage_gather(srcl, r, i, v, s):
            gr, gi = r[srcl], i[srcl]
            return jnp.where(s, gr * v, 0), jnp.where(s, gi * v, 0)

        @jax.jit
        def stage_floor(r, i, v, s):
            return jnp.where(s, r * v, 0), jnp.where(s, i * v, 0)

        rows = size // 128
        rbits = int(np.log2(rows))
        row_mask = mask >> 7
        lane_mask = mask & 127
        lane_perm = jnp.asarray(
            (np.arange(128, dtype=np.int32) ^ lane_mask)
        )

        @jax.jit
        def stage_flip(r, i, v, s):
            # XOR on row bits = flipping the set row-bit axes of a
            # (2,)*rbits x 128 view (lane axis stays 128-wide — no tiny
            # trailing dims); XOR on lane bits = one static 128-col take.
            outs = []
            for x in (r, i):
                y = x.reshape((2,) * rbits + (128,))
                axes = [
                    t
                    for t in range(rbits)
                    if (row_mask >> (rbits - 1 - t)) & 1
                ]
                if axes:
                    y = jnp.flip(y, axes)
                y = y.reshape(rows, 128)
                if lane_mask:
                    y = jnp.take(y, lane_perm, axis=1)
                outs.append(y.reshape(-1))
            gr, gi = outs
            return jnp.where(s, gr * v, 0), jnp.where(s, gi * v, 0)

        timeit("A_arbitrary_gather", size, stage_gather, arb, xr, xi, vr, sel)
        out_b = timeit("B_xor_gather", size, stage_gather, xorm, xr, xi, vr, sel)
        out_c = timeit("C_xor_flip", size, stage_flip, xr, xi, vr, sel)
        np.testing.assert_allclose(
            np.asarray(out_c[0]), np.asarray(out_b[0]), atol=1e-6
        )
        print("C==B bit-exact check passed", file=sys.stderr)
        timeit("D_mac_floor", size, stage_floor, xr, xi, vr, sel)


if __name__ == "__main__":
    main()
