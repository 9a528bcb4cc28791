"""TPU experiment: round-2 engine (concat reassembly) at n=28.

Variants: bench-style alternating H(0)/H(27), H(0) only, H on middle
qubit 14 (general strip case), and QFT-28 wall-clock at fusion caps 5/7.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, step, reps_per_step=REPS):
    dim = 1 << N
    re = jnp.zeros(dim, jnp.float32).at[0].set(1.0)
    im = jnp.zeros(dim, jnp.float32)
    t0 = time.time()
    re, im = step(re, im)
    float(re[0])
    log(f"{name}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(STEPS):
        re, im = step(re, im)
    float(re[0])
    dt = time.time() - t0
    rate = reps_per_step * STEPS / dt
    print(json.dumps({"variant": name, "applies_per_sec": round(rate, 2),
                      "gbps_effective": round(rate * dim * 16 / 1e9, 1)}),
          flush=True)


def main():
    from rustqip_tpu.engine.real_apply import apply_ops_ri
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import make_matrix_op

    log(f"device: {jax.devices()[0]}")

    def engine_step(ops):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(re, im):
            return apply_ops_ri(N, ops, re, im)
        return step

    alt = [make_matrix_op([(i % 2) * (N - 1)], gates.H.reshape(-1))
           for i in range(REPS)]
    timeit("engine_alternating", engine_step(alt))

    h0 = [make_matrix_op([0], gates.H.reshape(-1))] * REPS
    timeit("engine_H0", engine_step(h0))

    hmid = [make_matrix_op([14], gates.H.reshape(-1))] * REPS
    timeit("engine_H14", engine_step(hmid))

    # mixed-support dense 2q gate spanning row+col qubits
    cn = [make_matrix_op([5, 27], gates.CNOT.reshape(-1))] * REPS
    timeit("engine_CX_5_27", engine_step(cn))

    # QFT-28 wall-clock through the full stack at fusion caps 5 and 7
    from rustqip_tpu.algos.qfft import qfft
    from rustqip_tpu.prelude import LocalBuilder

    for cap in (5, 7):
        b = LocalBuilder(dtype="f32", max_fused_qubits=cap)
        r = b.register(N)
        qfft(b, r)
        cc = b.compile()
        t0 = time.time()
        re, im, _ = cc.run(initial_index=12345, key=jax.random.PRNGKey(0))
        float(re[0])
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            re, im, _ = cc.run(initial_index=12345, key=jax.random.PRNGKey(0))
        float(re[0])
        dt = (time.time() - t0) / 3
        print(json.dumps({
            "variant": f"qft28_cap{cap}",
            "wall_s": round(dt, 3),
            "passes": cc.num_passes,
            "ms_per_pass": round(1e3 * dt / cc.num_passes, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
