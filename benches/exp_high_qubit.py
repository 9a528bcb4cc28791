"""TPU experiment: high-qubit gate-pass formulations at n=28 (f32 planes).

Measures steady-state applies/sec for several implementations of H on
qubit 0 (the worst-stride case) and the paired H(0)+H(27) sweep, to pick
the round-2 hot-path design. Diagnostics to stderr, one JSON line per
variant to stdout.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 28
REPS = 30
STEPS = 4
INV = np.float32(1.0 / np.sqrt(2.0))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, step, re, im, reps_per_step=REPS):
    t0 = time.time()
    re, im = step(re, im)
    float(re[0, 0])
    log(f"{name}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(STEPS):
        re, im = step(re, im)
    float(re[0, 0])
    dt = time.time() - t0
    rate = reps_per_step * STEPS / dt
    gbps = rate * (1 << N) * 8 * 2 / 1e9
    print(json.dumps({"variant": name, "applies_per_sec": round(rate, 2),
                      "gbps": round(gbps, 1)}), flush=True)
    return rate


def h_low(re, im, B):
    # H on qubit 27 -> 128x128 matmul (XLA path)
    return re @ B, im @ B


def main():
    R, C = 1 << (N - 7), 128
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import make_matrix_op
    from rustqip_tpu.engine.real_apply import apply_op_ri

    B = np.kron(np.eye(64), gates.H).astype(np.float32)  # H on last col qubit
    Bj = jnp.asarray(B.T)

    op_hi = make_matrix_op([0], gates.H.reshape(-1))
    op_lo = make_matrix_op([N - 1], gates.H.reshape(-1))

    re = jnp.zeros((R, C), jnp.float32).at[0, 0].set(1.0)
    im = jnp.zeros((R, C), jnp.float32)

    # v0: current engine path, alternating H(0)/H(27) — bench parity check
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v0(re, im):
        r, i = re.reshape(-1), im.reshape(-1)
        for k in range(REPS):
            r, i = apply_op_ri(N, op_hi if k % 2 == 0 else op_lo, r, i)
        return r.reshape(R, C), i.reshape(R, C)

    # v1: current engine path, H(0) only (isolate the high-qubit cost)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v1(re, im):
        r, i = re.reshape(-1), im.reshape(-1)
        for _ in range(REPS):
            r, i = apply_op_ri(N, op_hi, r, i)
        return r.reshape(R, C), i.reshape(R, C)

    # v2: H(0) as contiguous half-split + concat (no stack/transpose)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v2(re, im):
        for _ in range(REPS):
            outs = []
            for x in (re, im):
                x0, x1 = x[: R // 2], x[R // 2 :]
                outs.append(
                    jnp.concatenate(((x0 + x1) * INV, (x0 - x1) * INV), axis=0)
                )
            re, im = outs
        return re, im

    # v3: H(27) only via XLA matmul (low-qubit reference)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v3(re, im):
        for _ in range(REPS):
            re, im = h_low(re, im, Bj)
        return re, im

    # v4: paired sweep H(0)+H(27): butterfly + matmul in one expression
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v4(re, im):
        for _ in range(REPS // 2):
            outs = []
            for x in (re, im):
                x0, x1 = x[: R // 2], x[R // 2 :]
                outs.append(
                    jnp.concatenate(
                        (((x0 + x1) * INV) @ Bj, ((x0 - x1) * INV) @ Bj),
                        axis=0,
                    )
                )
            re, im = outs
        return re, im

    # v5: H(0) via (2, R/2*C) reshape + 2x2 matmul from the left
    H2 = jnp.asarray(np.array([[1, 1], [1, -1]], np.float32) * INV)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def v5(re, im):
        for _ in range(REPS):
            r2 = re.reshape(2, -1)
            i2 = im.reshape(2, -1)
            re = (H2 @ r2).reshape(R, C)
            im = (H2 @ i2).reshape(R, C)
        return re, im

    log(f"device: {jax.devices()[0]}")
    for name, fn in [("v0_engine_alternating", v0),
                     ("v1_engine_H0", v1),
                     ("v2_concat_H0", v2),
                     ("v3_xla_H27", v3),
                     ("v4_paired_sweep", v4),
                     ("v5_2xmatmul_H0", v5)]:
        re = jnp.zeros((R, C), jnp.float32).at[0, 0].set(1.0)
        im = jnp.zeros((R, C), jnp.float32)
        reps = REPS if name != "v4_paired_sweep" else REPS  # v4 retires 2/sweep
        try:
            timeit(name, fn, re, im, reps_per_step=reps)
        except Exception as e:
            log(f"{name} failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
