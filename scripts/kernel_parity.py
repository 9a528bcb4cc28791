"""TPU parity gate for the PRODUCTION Pallas window-kernel path.

The kernel used on real TPU is ``_window_sweep_pipelined`` (inner
``emit_pipeline``, strided in/out block index maps —
engine/pallas_kernels.py); interpret-mode tests deliberately exercise the
other branch (BlockSpec + assemble) because emit_pipeline needs real
device info. This script closes that gap (VERDICT r2 weak #2): it drives
the kernel path against the complex XLA apply path (engine/apply.apply_op
— the kron-oracle-tested reference implementation, cf. the reference's
engine-vs-kron harness discipline, qip-iterators/src/matrix_ops.rs:221-375)
on ten engineered windows covering every kernel step kind — low
(Karatsuba complex matmul), lowr (real 2-dot matmul), mix (strip linear
combination), diag (in-body phase evaluation), cbf (lane-roll butterfly),
rbf (sublane-roll butterfly), rmix (non-scalar row-block strip-pair
matmuls), cmix (inter-strip controlled butterflies for high-row targets)
— at n=20, and asserts <= 1e-6 max abs amplitude disagreement.

Everything runs in ONE jit program (one relay compile): kernel outputs and
oracle outputs never leave the device; only per-window max-abs-diffs are
fetched. Run on the real TPU:

    timeout 900 python scripts/kernel_parity.py

Prints one JSON line: {"windows": [...], "max_diff": ..., "ok": true}.
Record each session's result in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ["RUSTQIP_TPU_PALLAS"] = "1"  # production kernel path, always

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

N = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _rand_u(k: int, seed: int) -> np.ndarray:
    r = np.random.default_rng(seed)
    m = r.normal(size=(1 << k, 1 << k)) + 1j * r.normal(size=(1 << k, 1 << k))
    q, _ = np.linalg.qr(m)
    return q


def build_sequences(n: int):
    """Five op sequences, each planning to kernel windows that together
    cover every step kind. Returns [(name, ops, expected_kinds)]."""
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import (
        PhaseProductOp,
        make_matrix_op,
    )

    H = gates.H.reshape(-1)
    T = gates.T.reshape(-1)

    def cp(a, b, ang):
        return PhaseProductOp(
            (((a, b), (1, 1, 1, complex(np.cos(ang), np.sin(ang)))),)
        )

    seqs = []
    # 1. headline shape: alternating row-bit H (mix) / col-bit T (cbf).
    #    ODD counts of each (3 H, 3 T) so the step-merge pass composes the
    #    run to one surviving mix + one cbf instead of cancelling it
    #    outright (8 alternating Hs — the old shape — now plans to [],
    #    which is correct but exercises nothing). This IS the merged
    #    production shape of bench.py's fused arm.
    seqs.append((
        "alternating",
        [make_matrix_op([(i % 2) * (n - 1)], H if i % 2 == 0 else T)
         for i in range(6)],
        {"mix", "cbf"},
    ))
    # 2. QFT-like ladder: col-bit H (cbf) + ROW-to-col controlled phases —
    #    mixed row+col monomials force in-body diag evaluation (col-only
    #    phases would convert to dense (C, C) matrices and join low runs)
    ops = []
    for i, q in enumerate((n - 1, n - 2, n - 3)):
        ops.append(make_matrix_op([q], H))
        for d, t in enumerate((3 + i, 5 + i)):
            ops.append(cp(t, q, np.pi / (2 << d)))
    seqs.append(("qft_ladder", ops, {"cbf", "diag"}))
    # 3. dense col-qubit matmuls: complex 2q unitary (low/Karatsuba) then
    #    a REAL 2q matrix (lowr 2-dot path), composed with a T to keep a
    #    second complex step
    hh = np.kron(gates.H, gates.H)
    seqs.append((
        "dense_low",
        [
            make_matrix_op([n - 1, n - 2], _rand_u(2, 11).reshape(-1)),
            make_matrix_op([0], gates.Z.reshape(-1)),  # mix between lows
            make_matrix_op([n - 2, n - 3], hh.reshape(-1)),
            make_matrix_op([n - 1], T),
        ],
        {"low", "mix"},
    ))
    # 4. sublane butterflies: single-qubit gates on LOW row bits (rbf) —
    #    at n=20 row bits are qubits 0..12; bit p = n_m-1-q <= 8 needs
    #    q >= 4. Pair with a cbf to reach kernel applicability.
    seqs.append((
        "rbf_pair",
        [
            make_matrix_op([n - 8], _rand_u(1, 21).reshape(-1)),  # bit 0
            make_matrix_op([n - 10], H),                          # bit 2
            make_matrix_op([n - 1], _rand_u(1, 22).reshape(-1)),  # cbf
        ],
        {"rbf", "cbf"},
    ))
    # 5. everything at once: mix + diag + low + cbf + rbf in one window
    seqs.append((
        "mixed_all",
        [
            make_matrix_op([1], gates.X.reshape(-1)),              # mix
            cp(2, n - 2, 0.77),                                    # diag
            make_matrix_op([n - 2], _rand_u(1, 32).reshape(-1)),   # cbf
            make_matrix_op([n - 1, n - 3], _rand_u(2, 31).reshape(-1)),
            make_matrix_op([n - 9], T),                            # rbf
            make_matrix_op([1], H),                                # mix
        ],
        {"mix", "diag", "low", "cbf", "rbf"},
    ))
    # 6. rmix: disjoint dense 3q unitaries straddling the row/col seam
    #    (non-scalar row blocks -> per-strip-pair C x C matmuls); both
    #    must retire in ONE sweep (reference apply_ops one-pass
    #    semantics, qip-iterators/src/matrix_ops.rs:158-219)
    seqs.append((
        "rmix_disjoint",
        [
            make_matrix_op([1, n - 6, n - 5], _rand_u(3, 41).reshape(-1)),
            make_matrix_op([2, n - 4, n - 3], _rand_u(3, 42).reshape(-1)),
        ],
        {"rmix"},
    ))
    # 7. pure-mix: a Toffoli on row qubits (the bench's unfused shape) —
    #    mix-only windows ride the kernel since round 3 (the XLA
    #    slice/concat fallback measured ~2.5 physical passes per sweep)
    ccx = np.eye(8, dtype=np.complex128)
    ccx[[6, 7]] = ccx[[7, 6]]
    seqs.append((
        "pure_mix_ccx",
        [make_matrix_op([3, 4, 5], ccx.reshape(-1))],
        {"mix"},
    ))
    # 8. controlled butterflies (late round 3): CCX/CNOT/MCZ chains whose
    #    targets sit on lane or low-row bits ride the kernel as masked
    #    roll butterflies, controls at ANY position (the arithmetic-
    #    library path: add-n28 plans 17 sweeps -> 8 this way)
    from rustqip_tpu.ops.matrix_ops import make_control_op

    X = gates.X.reshape(-1)
    seqs.append((
        "ctrl_butterfly",
        [
            make_control_op([0, 1], make_matrix_op([10], X)),    # rbf 2ctrl
            make_control_op([10], make_matrix_op([n - 1], X)),   # cbf rctrl
            make_control_op([2, n - 2], make_matrix_op([9], X)), # rbf mixed
            make_control_op(
                [0, 3, 5, n - 3], make_matrix_op([n - 1], gates.Z.reshape(-1))
            ),                                                   # wide MCZ
        ],
        {"cbf", "rbf"},
    ))
    # 9. lone rmix: ONE dense op straddling the row/col seam — the shape
    #    window-aware fusion (joint_ok) produces for Grover's diffusion
    #    corner; kernel-applicable as a single-step window since round 3's
    #    review pass (one read+write vs ~2.5 XLA strip passes)
    seqs.append((
        "lone_rmix",
        [make_matrix_op([0, 1, n - 1], _rand_u(3, 51).reshape(-1))],
        {"rmix"},
    ))
    # 10. cmix (round 3): multi-controlled 1q gates whose targets sit on
    #     HIGH row bits (above the rbf in-block range) — the target joins
    #     the window bit set and the 2x2 runs between strip PAIRS, masked
    #     by control iotas. The arithmetic library's carry/overflow ops
    #     (3-4 controls onto a high target) take this path: add-n28 plans
    #     32 sweeps -> 5, times_mod-n47 1323 -> 295, all-kernel.
    #     n=20 (n_m=13): qubits 0..3 sit on row bits 12..9.
    seqs.append((
        "cmix_high_targets",
        [
            make_control_op([6, n - 2], make_matrix_op([0], X)),
            make_control_op(
                [4, 9, n - 1], make_matrix_op([1], gates.H.reshape(-1))
            ),
            make_control_op([2, 12], make_matrix_op([0], gates.Y.reshape(-1))),
        ],
        {"cmix"},
    ))
    return seqs


def check_plans(n: int, seqs) -> list:
    """Assert each sequence plans to kernel windows with the expected step
    kinds; return the per-sequence kind sets (host-side, no device)."""
    from rustqip_tpu.engine.real_apply import plan_sweeps

    all_kinds = []
    for name, ops, expected in seqs:
        plan = plan_sweeps(n, ops, kernel_ok=True)
        kinds = set()
        for kind, payload, _run in plan:
            assert kind == "kwindow", (
                f"{name}: sweep fell off the kernel path ({kind})"
            )
            for s in payload[1]:
                kinds.add(s[0])
        missing = expected - kinds
        assert not missing, f"{name}: expected kernel steps {missing}"
        log(f"plan {name}: {len(plan)} kernel sweep(s), steps {sorted(kinds)}")
        all_kinds.append(sorted(kinds))
    covered = set().union(*(set(k) for k in all_kinds))
    assert {
        "low", "mix", "diag", "cbf", "rbf", "rmix", "cmix"
    } <= covered, covered
    return all_kinds


def main():
    import jax
    import jax.numpy as jnp

    from rustqip_tpu.engine import pallas_kernels
    from rustqip_tpu.engine.apply import apply_op
    from rustqip_tpu.engine.real_apply import apply_ops_ri

    n = N
    seqs = build_sequences(n)
    kinds = check_plans(n, seqs)

    if jax.default_backend() != "tpu" or not pallas_kernels.available():
        log("ERROR: this gate needs the real TPU kernel path")
        print(json.dumps({"ok": False, "error": "no tpu"}))
        sys.exit(2)

    rng = np.random.default_rng(0)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    v /= np.linalg.norm(v)
    re0 = np.asarray(v.real, dtype=np.float32)
    im0 = np.asarray(v.imag, dtype=np.float32)

    @jax.jit
    def parity(re, im):
        diffs = []
        for _name, ops, _exp in seqs:
            kr, ki = apply_ops_ri(n, ops, re, im)       # kernel path
            c = re.astype(jnp.complex64) + 1j * im.astype(jnp.complex64)
            for op in ops:                               # complex oracle
                c = apply_op(n, op, c)
            d = jnp.maximum(
                jnp.max(jnp.abs(kr - jnp.real(c))),
                jnp.max(jnp.abs(ki - jnp.imag(c))),
            )
            diffs.append(d)
        return jnp.stack(diffs)

    log(f"compiling parity program (n={n}, {len(seqs)} windows)...")
    t0 = time.time()
    diffs = parity(jnp.asarray(re0), jnp.asarray(im0))
    out = [float(x) for x in np.asarray(diffs)]
    compile_s = time.time() - t0
    log(f"compile+run: {compile_s:.1f}s")

    tol = 1e-6
    results = []
    ok = True
    for (name, _ops, _e), k, d in zip(seqs, kinds, out):
        line_ok = d <= tol
        ok &= line_ok
        results.append(
            {"window": name, "steps": k, "max_abs_diff": d, "ok": line_ok}
        )
        log(f"{'PASS' if line_ok else 'FAIL'} {name}: max|diff| = {d:.3g}")
    print(
        json.dumps(
            {
                "windows": results,
                "max_diff": max(out),
                "tol": tol,
                "n": n,
                "compile_s": round(compile_s, 1),
                "ok": bool(ok),
            }
        )
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
