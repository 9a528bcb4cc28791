"""Micro-benchmark suite mirroring the reference's bench harnesses.

Covers the shapes of ``qip/benches/state_bench.rs`` and
``qip-iterators/benches/matmul_bench.rs`` (SURVEY.md §6):

  1. dense single-qubit gate expanded to the full n-qubit matrix (n=3, 8)
  2. single H on qubit 0 of a large state (n=24 default; --big for 28)
  3. (n-1)-controlled identity (n=3, 8, 16)
  4. fused vs sequential multi-gate apply (n=5, 10, 16)
  5. sparse identity apply (n=5, 10, 16)
  6. optionally the native C++ CPU engine on the same shapes (--native)
  7. optionally the library comparison of matmul_bench.rs (--libs):
     engine vs scipy CSR kron (reuse/build-each) vs numpy dense BLAS

Usage: python benches/state_bench.py [--big] [--native] [--cpu] [--libs]
Note: on the axon relay each distinct shape costs minutes of remote
compile; --cpu forces the CPU backend for quick local numbers.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    # Device-side slice, then a ONE-scalar fetch: np.asarray(x) here would
    # pull the whole state over the axon relay (~60 s/iteration at n=28,
    # observed) and time the tunnel, not the gate.
    return float(x.ravel()[0])


def time_apply(n, ops, iters=5, dtype=np.float64, inner=1):
    """Mean seconds per gate. ``inner`` repeats the op run device-side
    (lax.fori_loop) so dispatch latency amortizes — over the axon relay a
    single dispatch costs ~1 ms round-trip, which would swamp every
    small-n shape (the reference's in-process harness has no such
    overhead)."""
    import functools

    import jax
    import jax.numpy as jnp

    from rustqip_tpu.engine.real_apply import apply_ops_ri

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(re, im):
        if inner == 1:
            return apply_ops_ri(n, ops, re, im)

        def body(_, c):
            r, i = c
            return apply_ops_ri(n, ops, r, i)

        return jax.lax.fori_loop(0, inner, body, (re, im))

    re = jnp.zeros(1 << n, dtype).at[0].set(1.0)
    im = jnp.zeros(1 << n, dtype)
    re, im = step(re, im)
    sync(re)
    t0 = time.time()
    for _ in range(iters):
        re, im = step(re, im)
    sync(re)
    dt = (time.time() - t0) / iters / inner / max(len(ops), 1)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="include n=24/28 cases")
    ap.add_argument("--native", action="store_true", help="also time the C++ engine")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--libs",
        action="store_true",
        help="library comparison (scipy CSR / numpy dense; matmul_bench.rs)",
    )
    ap.add_argument(
        "--one-per-class",
        action="store_true",
        help="largest size per shape class only (bounds TPU relay "
        "compiles: ~6 programs instead of ~17)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import (
        expand_op_matrix,
        make_control_op,
        make_matrix_op,
        make_sparse_matrix_op,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rows = []

    lite = args.one_per_class
    # Device-side repeat factor: amortizes the ~1 ms relay dispatch on
    # TPU for shapes whose gate cost is far below it; on CPU (or the big
    # n>=24 states, where one pass is ms-scale) a plain dispatch loop is
    # accurate and keeps peak memory at one state.
    rep = 1 if args.cpu else 16

    # 1. dense single-qubit gate expanded to the full n-qubit matrix
    for n in (8,) if lite else (3, 8):
        full = expand_op_matrix(gates.H, [0], n)
        op = make_matrix_op(list(range(n)), full.reshape(-1))
        rows.append(
            (f"dense full-matrix H, n={n}", time_apply(n, [op], inner=rep))
        )

    # 2. single H on qubit 0 of a large state
    big_ns = (16, 20, 24) + ((28,) if args.big else ())
    if lite:
        big_ns = big_ns[-1:]
    for n in big_ns:
        op = make_matrix_op([0], gates.H.reshape(-1))
        dtype = np.float32 if n >= 24 else np.float64
        # n>=24: a pass is ms-scale but so is relay dispatch (~1.4-7 ms
        # amortized, CLAUDE.md) — a small device-side repeat still pays;
        # the donated fori_loop carry keeps peak memory at one state.
        rows.append(
            (f"H on qubit 0, n={n}",
             time_apply(n, [op], dtype=dtype,
                        inner=rep if n < 24 else min(rep, 4)))
        )

    # 3. (n-1)-controlled identity
    for n in (16,) if lite else (3, 8, 16):
        inner = make_matrix_op([n - 1], np.eye(2).reshape(-1))
        op = make_control_op(list(range(n - 1)), inner)
        rows.append(
            (f"(n-1)-controlled identity, n={n}",
             time_apply(n, [op], inner=rep))
        )

    # 4. fused vs sequential multi-gate
    from rustqip_tpu.engine.fusion import fuse_ops

    for n in (16,) if lite else (5, 10, 16):
        ops = [make_matrix_op([q % n], gates.H.reshape(-1)) for q in range(6)]
        seq = time_apply(n, ops, inner=rep)
        fused = fuse_ops(ops)
        fus = time_apply(n, fused, inner=rep) * len(fused) / len(ops)
        rows.append((f"sequential 6 gates, n={n}", seq))
        rows.append((f"fused 6 gates ({len(fused)} passes), n={n}", fus))

    # 5. sparse identity
    for n in (16,) if lite else (5, 10, 16):
        sp = make_sparse_matrix_op([0, 1], [[(i, 1.0)] for i in range(4)])
        rows.append(
            (f"sparse identity [0,1], n={n}", time_apply(n, [sp], inner=rep))
        )

    print(f"{'case':48s} {'s/gate':>12s} {'GB/s (c128)':>12s}")
    for name, dt in rows:
        nq = int(name.rsplit("n=", 1)[1])
        gbps = (1 << nq) * 16 * 2 / dt / 1e9
        print(f"{name:48s} {dt:12.3e} {gbps:12.1f}")

    if args.native:
        from rustqip_tpu.engine.cpu_native import load_library, native_apply_op

        if load_library() is None:
            print("native engine unavailable", file=sys.stderr)
            return
        print("\nnative C++ engine:")
        for n in (16, 20, 24):
            state = np.zeros(1 << n, dtype=np.complex128)
            state[0] = 1.0
            op = make_matrix_op([0], gates.H.reshape(-1))
            t0 = time.time()
            iters = 3
            for _ in range(iters):
                state = native_apply_op(n, op, state)
            dt = (time.time() - t0) / iters
            print(f"{'H on qubit 0, n=' + str(n):48s} {dt:12.3e}")

    if args.libs:
        bench_libs()


def bench_libs():
    """Library-comparison analog of the reference's matmul_bench.rs
    (qip vs sprs CSR kron vs ndarray BLAS vs faer,
    qip-iterators/benches/matmul_bench.rs:19-221): the engine's
    structured apply vs generic sparse (scipy CSR kron, reuse AND
    build-each) and dense (numpy BLAS) matrix-vector products, H on
    qubit 0, n=12 (all) and n=20 (CSR only — a 2^20-square dense matrix
    does not fit)."""
    import scipy.sparse as sp

    from rustqip_tpu.engine.cpu_native import load_library, native_apply_op
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import make_matrix_op

    have_native = load_library() is not None
    H2 = gates.H

    def timeit(f, iters=5):
        f()  # warm
        t0 = time.time()
        for _ in range(iters):
            f()
        return (time.time() - t0) / iters

    print("\nlibrary comparison (H on qubit 0, complex128):")
    for n in (12, 20):
        v = np.zeros(1 << n, dtype=np.complex128)
        v[0] = 1.0
        op = make_matrix_op([0], gates.H.reshape(-1))
        rows = []

        import jax.numpy as jnp

        from rustqip_tpu.engine.apply import apply_op as engine_apply

        import jax

        @jax.jit
        def eng(x):
            return engine_apply(n, op, x)

        xj = jnp.asarray(v)
        rows.append(("engine (XLA)", timeit(lambda: np.asarray(eng(xj)))))
        if have_native:
            rows.append(
                ("engine (C++)",
                 timeit(lambda: native_apply_op(n, op, v)))
            )
        csr = sp.kron(
            sp.csr_matrix(H2), sp.identity(1 << (n - 1), format="csr"),
            format="csr",
        )
        rows.append(("scipy CSR kron (reuse)", timeit(lambda: csr @ v)))

        def build_each():
            m = sp.kron(
                sp.csr_matrix(H2),
                sp.identity(1 << (n - 1), format="csr"),
                format="csr",
            )
            return m @ v

        rows.append(("scipy CSR kron (build each)", timeit(build_each)))
        if n <= 12:
            dense = np.kron(H2, np.eye(1 << (n - 1), dtype=np.complex128))
            rows.append(("numpy dense BLAS (reuse)", timeit(lambda: dense @ v)))
        for name, dt in rows:
            print(f"  n={n:2d} {name:32s} {dt:12.3e} s")


if __name__ == "__main__":
    main()
