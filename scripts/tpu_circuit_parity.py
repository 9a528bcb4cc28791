"""End-to-end random-circuit parity on the REAL TPU backend.

Complements scripts/kernel_parity.py (10 fixed synthetic windows): this
drives a seeded RANDOM op stream through the full production pipeline —
``compile_pipeline`` (window-aware fusion, swap deferral, sweep
planning, Mosaic window kernels via RUSTQIP_TPU_PALLAS=1) — on the real
chip, and compares against a forced-CPU per-op complex reference
computed in a subprocess (same seed, no shared compiled code paths
beyond the op constructors). Catches Mosaic-only miscompiles and
planner/compile interactions the fixed windows cannot see.

Usage (healthy relay):  python scripts/tpu_circuit_parity.py [seed]
The CPU leg:            python scripts/tpu_circuit_parity.py seed --cpu

Mirrors the reference's engine-vs-kron fuzz discipline
(/root/reference/qip-iterators/src/matrix_ops.rs:221-375) at the scale
the kron oracle cannot reach.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 20
N_OPS = 18
REF_PATH = "/tmp/tpu_circuit_parity_ref_{seed}.npz"


def random_ops(rng):
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import (
        PhaseProductOp,
        make_control_op,
        make_matrix_op,
        make_swap_op,
    )

    def rand_u(k):
        m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
            size=(1 << k, 1 << k)
        )
        q, _ = np.linalg.qr(m)
        return q

    def rand_op():
        kind = rng.integers(0, 10)
        qs = list(rng.choice(N, size=4, replace=False))
        if kind == 0:
            g = [gates.H, gates.T, gates.X, gates.Y][rng.integers(0, 4)]
            return make_matrix_op([int(qs[0])], g.reshape(-1))
        if kind == 1:
            return make_control_op(
                [int(qs[0])],
                make_matrix_op([int(qs[1])], gates.X.reshape(-1)),
            )
        if kind == 2:
            return make_control_op(
                [int(qs[0]), int(qs[1])],
                make_matrix_op([int(qs[2])], gates.X.reshape(-1)),
            )
        if kind == 3:
            ang = float(rng.uniform(-3, 3))
            ph = complex(np.cos(ang), np.sin(ang))
            return PhaseProductOp(
                (((int(qs[0]), int(qs[1])), (1, 1, 1, ph)),)
            )
        if kind == 4:
            return make_matrix_op([int(q) for q in qs[:2]], rand_u(2).reshape(-1))
        if kind == 5:
            return make_matrix_op([int(q) for q in qs[:3]], rand_u(3).reshape(-1))
        if kind == 6:  # 3-controlled 1q dense (cmix shapes)
            return make_control_op(
                [int(qs[0]), int(qs[1]), int(qs[2])],
                make_matrix_op([int(qs[3])], rand_u(1).reshape(-1)),
            )
        if kind == 7:  # traced-function op: affine permutation + phase
            import jax.numpy as jnp

            from rustqip_tpu.ops.matrix_ops import make_fn_op

            k = 5
            fqs = [int(q) for q in rng.choice(N, size=k, replace=False)]
            a = int(rng.integers(0, 1 << (k - 1))) * 2 + 1  # odd: bijective
            c = int(rng.integers(0, 1 << k))
            t = float(rng.uniform(-3, 3))
            return make_fn_op(
                fqs,
                lambda row: (
                    (a * row + c) % (1 << k),
                    jnp.exp(1j * t * row),
                ),
                tag=f"affine:{a}:{c}:{t}",
            )
        if kind == 8:  # traced DIAGONAL phase oracle (elementwise fast
            # path on a single chip; zero-comm 'fndiag' schedule sharded)
            import jax.numpy as jnp

            from rustqip_tpu.ops.matrix_ops import make_fn_op

            k = 5
            fqs = [int(q) for q in rng.choice(N, size=k, replace=False)]
            t = float(rng.uniform(-3, 3))
            return make_fn_op(
                fqs,
                lambda row: (row, jnp.exp(1j * t * row)),
                tag=f"phase-oracle:{t}",
                diagonal=True,
            )
        return make_swap_op([int(qs[0])], [int(qs[1])])

    return [rand_op() for _ in range(N_OPS)]


def initial_state(rng):
    dim = 1 << N
    s = rng.normal(size=dim) + 1j * rng.normal(size=dim)
    return (s / np.linalg.norm(s)).astype(np.complex64)


def cpu_leg(seed: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rustqip_tpu.engine.real_apply import apply_op_ri

    rng = np.random.default_rng(seed)
    ops = random_ops(rng)
    state0 = initial_state(rng)
    er = jnp.asarray(state0.real)
    ei = jnp.asarray(state0.imag)
    for op in ops:
        er, ei = apply_op_ri(N, op, er, ei)
    np.savez(
        REF_PATH.format(seed=seed),
        re=np.asarray(er),
        im=np.asarray(ei),
    )
    print(f"cpu leg done (seed {seed})", file=sys.stderr)


def tpu_leg(seed: int):
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    from rustqip_tpu.engine.compile import UnitaryEntry, compile_pipeline

    rng = np.random.default_rng(seed)
    ops = random_ops(rng)
    state0 = initial_state(rng)
    cc = compile_pipeline(N, [UnitaryEntry(op) for op in ops], np.complex64)
    t0 = time.time()
    re, im, _ = cc.run(initial_state=state0)
    compile_s = time.time() - t0
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.load(REF_PATH.format(seed=seed))
    want = ref["re"] + 1j * ref["im"]
    diff = float(np.max(np.abs(got - want)))
    ok = diff <= 2e-4  # c64 per-op accumulation over N_OPS random ops
    print(
        json.dumps(
            {
                "seed": seed,
                "n": N,
                "n_ops": N_OPS,
                "max_abs_diff": diff,
                "tol": 2e-4,
                "compile_s": round(compile_s, 1),
                "ok": ok,
            }
        )
    )
    return 0 if ok else 1


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1] != "--cpu" else 42
    if "--cpu" in sys.argv:
        cpu_leg(seed)
        return 0
    os.environ.setdefault("RUSTQIP_TPU_PALLAS", "1")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(seed), "--cpu"],
        check=True,
        timeout=900,
    )
    return tpu_leg(seed)


if __name__ == "__main__":
    sys.exit(main())
