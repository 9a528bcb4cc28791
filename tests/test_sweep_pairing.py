"""Sweep pairing in apply_ops_ri: scalar-high + low-run fusion must be
exactly equivalent to sequential per-op application."""

import numpy as np
import jax.numpy as jnp
import pytest

from rustqip_tpu.engine.real_apply import apply_op_ri, apply_ops_ri
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import (
    PhaseProductOp,
    make_control_op,
    make_matrix_op,
)

N = 10


def _rand_u(k, seed):
    r = np.random.default_rng(seed)
    m = r.normal(size=(1 << k, 1 << k)) + 1j * r.normal(
        size=(1 << k, 1 << k)
    )
    q, _ = np.linalg.qr(m)
    return q


def _check(ops):
    rng = np.random.default_rng(0)
    state = rng.normal(size=1 << N) + 1j * rng.normal(size=1 << N)
    state /= np.linalg.norm(state)
    re, im = jnp.asarray(state.real), jnp.asarray(state.imag)
    gr, gi = apply_ops_ri(N, ops, re, im)
    er, ei = re, im
    for op in ops:
        er, ei = apply_op_ri(N, op, er, ei)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    want = np.asarray(er) + 1j * np.asarray(ei)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_alternating_high_low():
    ops = [
        make_matrix_op([(i % 2) * (N - 1)], gates.H.reshape(-1))
        for i in range(8)
    ]
    _check(ops)


def test_low_run_composition():
    ops = [
        make_matrix_op([N - 1], gates.H.reshape(-1)),
        make_matrix_op([N - 2], _rand_u(1, 1).reshape(-1)),
        make_matrix_op([N - 1, N - 3], _rand_u(2, 2).reshape(-1)),
        make_matrix_op([N - 2], gates.T.reshape(-1)),
    ]
    _check(ops)


def test_scalar_high_then_low_run():
    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([N - 1], gates.H.reshape(-1)),
        make_matrix_op([N - 2], _rand_u(1, 3).reshape(-1)),
    ]
    _check(ops)


def test_two_bit_scalar_high_pairing():
    # scalar-high op on two row qubits (X(x)Z) followed by a low gate
    xz = np.kron(gates.X, gates.Z)
    ops = [
        make_matrix_op([0, 2], xz.reshape(-1)),
        make_matrix_op([N - 1], gates.H.reshape(-1)),
    ]
    _check(ops)


@pytest.mark.heavy
def test_mixed_sequence_with_unpairable_ops():
    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        PhaseProductOp((((0, N - 1), (1, 1, 1, -1)),)),  # breaks the pair
        make_matrix_op([N - 1], gates.H.reshape(-1)),
        make_control_op([0], make_matrix_op([N - 1], gates.X.reshape(-1))),
        make_matrix_op([1], gates.Y.reshape(-1)),
        make_matrix_op([3, N - 1], _rand_u(2, 4).reshape(-1)),  # mixed supp
        make_matrix_op([0], gates.H.reshape(-1)),  # trailing scalar-high
    ]
    _check(ops)


def test_col_only_phase_joins_low_run():
    # A diagonal entirely on column qubits converts to a (C, C) matrix and
    # composes into the adjacent low-qubit matmul run.
    ops = [
        make_matrix_op([N - 1], gates.H.reshape(-1)),
        PhaseProductOp((((N - 1, N - 2), (1, 1, 1, 1j)),)),
        make_matrix_op([N - 2], gates.H.reshape(-1)),
    ]
    _check(ops)
    # ... and pairs behind a scalar-high op.
    ops = [make_matrix_op([0], gates.H.reshape(-1))] + ops
    _check(ops)


def test_trailing_high_without_low():
    ops = [
        make_matrix_op([N - 1], gates.H.reshape(-1)),
        make_matrix_op([0], gates.H.reshape(-1)),
    ]
    _check(ops)


def test_long_alternating_window_single_sweep():
    # The whole alternating run must execute as ONE window sweep.
    from rustqip_tpu.engine.real_apply import _collect_window

    ops = [
        make_matrix_op([(i % 2) * (N - 1)], gates.H.reshape(-1))
        for i in range(12)
    ]
    window, j = _collect_window(N, ops, 0)
    assert j == 12
    assert window[0] == (0,)
    _check(ops)


def test_multi_bit_window_interleaved():
    # Three distinct row bits + interleaved low gates: one window (h=3).
    from rustqip_tpu.engine.real_apply import _collect_window

    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
        make_matrix_op([1], gates.X.reshape(-1)),
        make_matrix_op([N - 2], _rand_u(1, 7).reshape(-1)),
        make_matrix_op([2], gates.Y.reshape(-1)),
        make_matrix_op([0], gates.Z.reshape(-1)),
        make_matrix_op([N - 1], gates.H.reshape(-1)),
    ]
    window, j = _collect_window(N, ops, 0)
    assert j == len(ops)
    assert window[0] == (0, 1, 2)
    _check(ops)


def test_window_bit_cap_splits():
    # A 4th distinct row bit exceeds WINDOW_MAX_BITS and starts a new
    # window; results must still be exact.
    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([1], gates.H.reshape(-1)),
        make_matrix_op([2], gates.H.reshape(-1)),
        make_matrix_op([3], gates.H.reshape(-1)),
        make_matrix_op([N - 1], gates.H.reshape(-1)),
    ]
    _check(ops)


def test_two_qubit_scalar_high_in_window():
    # A 2-row-qubit gate (X(x)Z on bits 0,2) mixing inside a 3-bit window.
    xz = np.kron(gates.X, gates.Z)
    ops = [
        make_matrix_op([1], gates.H.reshape(-1)),
        make_matrix_op([0, 2], xz.reshape(-1)),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
        make_matrix_op([2], gates.H.reshape(-1)),
    ]
    _check(ops)


def test_window_planner_fuzz_random_circuits():
    """Property test: windowed execution (apply_ops_ri) must equal
    op-by-op execution (apply_op_ri) for random mixed sequences — guards
    the window collector / kernel-applicability seams against
    regressions."""
    import numpy as np
    from rustqip_tpu.engine.real_apply import apply_op_ri, apply_ops_ri
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import (
        PhaseProductOp,
        make_control_op,
        make_matrix_op,
        make_swap_op,
    )

    n = 10
    rng = np.random.default_rng(123)

    def rand_unitary(dim):
        m = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
        q, _ = np.linalg.qr(m)
        return q

    def rand_op():
        kind = rng.integers(0, 6)
        if kind == 0:  # single-qubit named gate
            g = [gates.H, gates.T, gates.X, gates.Y][rng.integers(0, 4)]
            return make_matrix_op([int(rng.integers(0, n))], g.reshape(-1))
        if kind == 1:  # random 1q unitary
            return make_matrix_op(
                [int(rng.integers(0, n))], rand_unitary(2).reshape(-1)
            )
        if kind == 2:  # random 2q unitary
            a, b = rng.choice(n, size=2, replace=False)
            return make_matrix_op([int(a), int(b)], rand_unitary(4).reshape(-1))
        if kind == 3:  # diagonal phase product
            a, b = rng.choice(n, size=2, replace=False)
            ang = rng.uniform(-3, 3)
            return PhaseProductOp(
                (((int(a), int(b)),
                  (1, 1, 1, complex(np.cos(ang), np.sin(ang)))),)
            )
        if kind == 4:  # swap pair
            a, b = sorted(rng.choice(n, size=2, replace=False))
            return make_swap_op([int(a)], [int(b)])
        ctrl, tgt = rng.choice(n, size=2, replace=False)
        return make_control_op(
            [int(ctrl)], make_matrix_op([int(tgt)], gates.X.reshape(-1))
        )

    for trial in range(8):
        ops = [rand_op() for _ in range(12)]
        v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        v /= np.linalg.norm(v)
        re = np.real(v).copy()
        im = np.imag(v).copy()
        wr, wi = apply_ops_ri(n, ops, re, im)
        sr, si = re, im
        for op in ops:
            sr, si = apply_op_ri(n, op, sr, si)
        np.testing.assert_allclose(
            np.asarray(wr), np.asarray(sr), atol=1e-10,
            err_msg=f"trial {trial}",
        )
        np.testing.assert_allclose(
            np.asarray(wi), np.asarray(si), atol=1e-10,
            err_msg=f"trial {trial}",
        )


def test_qft28_kernel_plan_sweep_budget():
    """Perf-regression guard: QFT-28 must plan to <= 8 HBM sweeps on the
    kernel path (measured 6 at 0.425 s on v5e; 41 at round start).
    Host-side planning only — no device work."""
    from rustqip_tpu.algos.qfft import qfft
    from rustqip_tpu.builder.builder import LocalBuilder, _lower_item
    from rustqip_tpu.engine.compile import UnitaryEntry
    from rustqip_tpu.engine.fusion import fuse_ops
    from rustqip_tpu.engine.real_apply import plan_sweeps

    n = 28
    b = LocalBuilder()
    qfft(b, b.register(n))
    entries = []
    for item in b.pipeline:
        entries.extend(_lower_item(item))
    qops = fuse_ops([e.op for e in entries if isinstance(e, UnitaryEntry)])
    plan = plan_sweeps(n, qops, True)
    assert len(plan) <= 8, [p[0] for p in plan]
    # every gate window must ride the kernel; the only non-kernel entry
    # is the single residual bit-reversal SwapOp (round 4's adaptive
    # 512-row diag blocks admit the middle rbf ladder into a strip
    # window, so the count dropped 5 -> 4 kwindows; assert structure,
    # not an exact count)
    kinds = [k for k, _, _ in plan]
    assert set(kinds) <= {"kwindow", "op"}, kinds
    assert kinds.count("op") == 1, kinds
    assert kinds.count("kwindow") >= 3, kinds


def test_headline_alternating_single_sweep_budget():
    """Perf-regression guard for the driver headline: 30 alternating
    H(0)/H(27) gates at n=28 must plan to ONE kernel sweep."""
    from rustqip_tpu.engine.real_apply import plan_sweeps
    from rustqip_tpu.ops import gates as g
    from rustqip_tpu.ops.matrix_ops import make_matrix_op

    n = 28
    ops = [
        make_matrix_op([(i % 2) * (n - 1)], g.H.reshape(-1))
        for i in range(30)
    ]
    plan = plan_sweeps(n, ops, True)
    assert len(plan) == 1 and plan[0][0] == "kwindow", [p[0] for p in plan]


def test_bench_unfused_shape_one_pass_per_gate():
    """The bench's second headline (Toffolis on rotating disjoint
    row-qubit triples, each filling the whole h<=3 window) must stay
    one-sweep-per-gate so the raw sweep path remains regression-visible
    (VERDICT r2 weak #3). Also checks the sequence is numerically exact
    vs op-by-op at a testable size."""
    import importlib.util
    import os

    from rustqip_tpu.engine.real_apply import plan_sweeps

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    fused, unfused = bench._build_ops(28, 30, 20)
    plan = plan_sweeps(28, unfused, True)
    assert len(plan) == 20, [k for k, _, _ in plan]
    assert all(len(run) == 1 for _, _, run in plan)
    fplan = plan_sweeps(28, fused, True)
    assert len(fplan) == 1 and fplan[0][0] == "kwindow"

    # Numeric equivalence at n=12 — the smallest size where the bench
    # quads (row bits 3..7, col bit n-1..n-4) stay distinct.
    n12 = 12
    _, small = bench._build_ops(n12, 8, 8)
    rng = np.random.default_rng(0)
    state = rng.normal(size=1 << n12) + 1j * rng.normal(size=1 << n12)
    state /= np.linalg.norm(state)
    re, im = jnp.asarray(state.real), jnp.asarray(state.imag)
    gr, gi = apply_ops_ri(n12, small, re, im)
    er, ei = re, im
    for op in small:
        er, ei = apply_op_ri(n12, op, er, ei)
    np.testing.assert_allclose(
        np.asarray(gr) + 1j * np.asarray(gi),
        np.asarray(er) + 1j * np.asarray(ei),
        atol=1e-10,
    )


def test_scalar_high_seam_op_keeps_col_bits_out_of_window():
    """A seam-straddling op whose sub-blocks are all v*I (col part acts
    as identity — _dense_plan's scalar demotion) classifies scalar-high;
    the window collector must add only its ROW bits to the window bit
    set (col indices crashed _row_segment_shape with a negative shift
    before the round-3 fix)."""
    X = np.array([[0, 1], [1, 0]], dtype=np.complex128)
    cases = [
        make_matrix_op([0, N - 1], np.kron(X, np.eye(2)).reshape(-1)),
        make_matrix_op(
            [0, N - 2, N - 1], np.kron(X, np.eye(4)).reshape(-1)
        ),
        make_matrix_op(
            [1, N - 1], np.kron(np.diag([1, 1j]), np.eye(2)).reshape(-1)
        ),
    ]
    rng = np.random.default_rng(5)
    state = rng.normal(size=1 << N) + 1j * rng.normal(size=1 << N)
    state /= np.linalg.norm(state)
    re, im = jnp.asarray(state.real), jnp.asarray(state.imag)
    for op in cases:
        gr, gi = apply_ops_ri(N, [op], re, im)
        er, ei = apply_op_ri(N, op, re, im)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(er), atol=1e-10)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(ei), atol=1e-10)


def test_disjoint_straddling_ops_single_sweep():
    """Two disjoint dense 3-qubit unitaries straddling the row/col seam
    (non-scalar row blocks) plan to ONE sweep via "rmix" steps — the
    reference's apply_ops/MultiOpIterator one-pass semantics for
    arbitrary disjoint op sets (qip-iterators/src/matrix_ops.rs:158-219,
    VERDICT r2 missing #1)."""
    from rustqip_tpu.engine.real_apply import plan_sweeps

    # N=10: row qubits 0..2, col qubits 3..9
    ops = [
        make_matrix_op([0, 4, 5], _rand_u(3, 21).reshape(-1)),
        make_matrix_op([1, 6, 7], _rand_u(3, 22).reshape(-1)),
    ]
    for kernel_ok in (False, True):
        plan = plan_sweeps(N, ops, kernel_ok)
        assert len(plan) == 1, [p[0] for p in plan]
        tags = [s[0] for s in plan[0][1][1]]
        assert tags == ["rmix", "rmix"], tags
    _check(ops)


def test_rmix_row_bit_cap_respected():
    """A dense op with MORE than RMIX_MAX_ROW_BITS row bits must NOT be
    admitted as an rmix step (VMEM bound: 2^h strips live)."""
    from rustqip_tpu.engine.real_apply import (
        RMIX_MAX_ROW_BITS,
        plan_sweeps,
    )

    k = RMIX_MAX_ROW_BITS + 1
    ops = [
        make_matrix_op(
            list(range(k)) + [5], _rand_u(k + 1, 31).reshape(-1)
        ),
    ]
    plan = plan_sweeps(N, ops, False)
    assert all(
        s[0] != "rmix" for _, w, _ in plan if isinstance(w, tuple)
        for s in (w[1] if len(w) == 2 and isinstance(w[1], list) else [])
    )
    _check(ops)


def test_rmix_interleaved_with_mixes():
    """rmix steps compose with scalar mixes, lane gates and multi-qubit
    scalar-high ops inside one window."""
    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([1, 4, 5], _rand_u(3, 41).reshape(-1)),
        make_matrix_op([9], gates.T.reshape(-1)),
        make_control_op([2], make_matrix_op([0], gates.X.reshape(-1))),
        make_matrix_op([1, 8], _rand_u(2, 42).reshape(-1)),
    ]
    _check(ops)


def test_controlled_seam_gates_fuse():
    """Seam-straddling CNOT/CCX chains — the bulk of arithmetic
    circuits — now admit to windows via dense normalization (identity
    sub-blocks demote to scalar mixes, the X block becomes one rmix
    matmul), instead of costing one pass per gate."""
    from rustqip_tpu.engine.real_apply import plan_sweeps

    # N=10: row qubits 0..2, col qubits 3..9
    ops = [
        make_control_op([0], make_matrix_op([5], gates.X.reshape(-1))),
        make_control_op([6], make_matrix_op([1], gates.X.reshape(-1))),
        make_control_op(
            [0, 4], make_matrix_op([7], gates.X.reshape(-1))
        ),
    ]
    for kernel_ok in (False, True):
        plan = plan_sweeps(N, ops, kernel_ok)
        assert len(plan) == 1, [p[0] for p in plan]
    _check(ops)


def test_small_sparse_joins_window():
    """A small sparse op (<= DENSE_CAP) normalizes to dense inside
    window collection and fuses with neighbors."""
    from rustqip_tpu.engine.real_apply import plan_sweeps
    from rustqip_tpu.ops.matrix_ops import make_sparse_matrix_op

    sp = make_sparse_matrix_op([1, 5], [[(i ^ 1, 1.0)] for i in range(4)])
    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        sp,
        make_matrix_op([N - 1], gates.T.reshape(-1)),
    ]
    plan = plan_sweeps(N, ops, False)
    assert len(plan) == 1, [p[0] for p in plan]
    _check(ops)


def _compiled_plan_kinds(build, monkeypatch):
    """Compile a circuit with the Pallas kernel path simulated on and
    return the sweep kinds its unitary segments plan to."""
    from rustqip_tpu.builder.builder import LocalBuilder
    from rustqip_tpu.engine import pallas_kernels, real_apply

    monkeypatch.setattr(pallas_kernels, "available", lambda: True)
    b = LocalBuilder(dtype=np.complex64)
    build(b)
    cc = b.compile()
    kinds = []
    for seg in cc.segments:
        if isinstance(seg, list):
            kinds += [
                k for k, _, _ in real_apply.plan_sweeps(cc.n, seg, True)
            ]
    return kinds


def _build_grover28(b):
    from rustqip_tpu.algos.grover import grover_iteration

    r = b.register(28)
    r = grover_iteration(b, r, 0x5A5A5A)
    b.measure(r)


def test_grover28_window_fusion_all_kernel(monkeypatch):
    """Perf-regression guard (round 3 window-aware fusion): one
    Grover-28 iteration must plan ENTIRELY to kernel sweeps — zero
    whole-state dense passes (measured ~161 ms each at n=28) and zero
    XLA strip fallbacks. Before ``joint_ok`` capped greedy joints to
    kernel-plannable shapes this planned 20 pathological dense passes.
    Host-side planning only — no device work."""
    monkeypatch.delenv("RUSTQIP_TPU_WINDOW_FUSION", raising=False)
    kinds = _compiled_plan_kinds(_build_grover28, monkeypatch)
    assert kinds and set(kinds) == {"kwindow"}, kinds
    assert len(kinds) <= 26, kinds


def test_window_fusion_hatch_reverts_to_plain_fusion(monkeypatch):
    """RUSTQIP_TPU_WINDOW_FUSION=0 restores plain greedy dense fusion
    (the A/B escape hatch): the same Grover-28 iteration then builds
    joints the window planner cannot kernel."""
    monkeypatch.setenv("RUSTQIP_TPU_WINDOW_FUSION", "0")
    kinds = _compiled_plan_kinds(_build_grover28, monkeypatch)
    assert set(kinds) != {"kwindow"}, kinds


def test_grover_search_repeat_body_window_fusion(monkeypatch):
    """Repeat-entry bodies get the same window-aware fusion as straight
    runs (code-review finding): ``grover_search`` routes its iteration
    through ``b.repeat``, and before ``joint_ok`` was plumbed into the
    repeat-body ``fuse_ops`` call the flagship circuit planned ~18
    whole-state dense passes per iteration while the unrolled guard test
    stayed green."""
    import collections

    from rustqip_tpu.algos.grover import grover_search
    from rustqip_tpu.builder.builder import LocalBuilder
    from rustqip_tpu.engine import pallas_kernels, real_apply

    monkeypatch.delenv("RUSTQIP_TPU_WINDOW_FUSION", raising=False)
    monkeypatch.setattr(pallas_kernels, "available", lambda: True)
    b = LocalBuilder(dtype=np.complex64)
    grover_search(b, 28, 0x5A5A5A, iterations=3)
    cc = b.compile()
    bodies = [
        s for s in cc.segments if isinstance(s, tuple) and s[0] == "repeat"
    ]
    assert bodies, "grover_search no longer uses repeat()"
    for _, _times, body in bodies:
        kinds = collections.Counter(
            k for k, _, _ in real_apply.plan_sweeps(cc.n, body, True)
        )
        assert set(kinds) == {"kwindow"}, dict(kinds)


def test_all_lane_controlled_ops_not_butterfly_kept():
    """A controlled gate whose ENTIRE support is on lane qubits must not
    be exempted from dense fusion (code-review finding): its fused-dense
    alternative is an all-lane C x C matmul that composes with
    neighboring lane ops — one ~5 ms matmul per chain beats one ~2.5 ms
    roll butterfly per gate. Seam-straddling controlled ops stay kept."""
    from rustqip_tpu.engine.fusion import fuse_ops
    from rustqip_tpu.engine.real_apply import butterfly_eligible

    n = 28  # lane qubits 21..27
    lane_cnot = make_control_op(
        [26], make_matrix_op([27], gates.X.reshape(-1))
    )
    assert not butterfly_eligible(n, lane_cnot)
    chain = [
        make_matrix_op([25], gates.H.reshape(-1)),
        lane_cnot,
        make_matrix_op([25], gates.H.reshape(-1)),
    ]
    fused = fuse_ops(chain, keep=lambda o: butterfly_eligible(n, o))
    assert len(fused) == 1, [type(o).__name__ for o in fused]
    # row-control + lane-target straddles the seam: still butterfly-kept
    seam_cnot = make_control_op(
        [5], make_matrix_op([27], gates.X.reshape(-1))
    )
    assert butterfly_eligible(n, seam_cnot)


def test_h_broadcast_plan_optimal_sweeps(monkeypatch):
    """H on all 28 qubits must plan to exactly 4 kernel sweeps — the
    plan-optimal decomposition under the default h<=4 ladder (round 5):
    the 12 high row qubits need ceil(12/4)=3 mix windows, and everything
    else (low row qubits as rbf butterflies, lane qubits as one composed
    low matmul) chains into ONE seam window. The pre-round-5 h<=3 ladder
    planned 5 (ceil(12/3)=4 mix windows)."""
    monkeypatch.delenv("RUSTQIP_TPU_WINDOW_FUSION", raising=False)

    def build(b):
        r = b.register(28)
        r = b.h(r)
        b.measure(r)

    kinds = _compiled_plan_kinds(build, monkeypatch)
    assert kinds == ["kwindow"] * 4, kinds
    monkeypatch.setenv("RUSTQIP_TPU_WINDOW_MAXH", "3,2,1")
    kinds = _compiled_plan_kinds(build, monkeypatch)
    assert kinds == ["kwindow"] * 5, kinds


def test_prefix_salvage_low_cap_plans_two_kernel_windows():
    """Prefix fallback in plan_sweeps: a run whose MAXIMAL collection is
    kernel-inapplicable only because of later ops (here: alternating
    CZ lows with a row-bit mix until the flushed low count exceeds
    WINDOW_KERNEL_MAX_LOW) must salvage the longest applicable PREFIX
    as a kernel window instead of surrendering the whole run to the XLA
    fallback. Snapshots are reported during the SAME collection pass
    (every prefix length checked — applicability is not monotone)."""
    from rustqip_tpu.engine.real_apply import (
        WINDOW_KERNEL_MAX_LOW,
        plan_sweeps,
    )

    n = 28
    cz = np.diag([1, 1, 1, -1]).astype(complex).reshape(-1)
    # The CX (row ctrl -> lane target) overlaps the lows' lane support,
    # so neither the CZs nor the CXs can compose across each other in
    # the step-merge pass — the low count genuinely exceeds the cap.
    # (A plain row-bit H here would let merge cancel EVERYTHING: H^2=I
    # and CZ^2=I — the old shape of this test now plans to [].)
    cx = make_control_op([10], make_matrix_op([n - 1], gates.X.reshape(-1)))
    ops = []
    for _ in range(WINDOW_KERNEL_MAX_LOW + 2):
        ops.append(make_matrix_op([n - 2, n - 1], cz))  # low (col qubits)
        ops.append(cx)
    plan = plan_sweeps(n, ops, True)
    assert [k for k, _, _ in plan] == ["kwindow", "kwindow"], (
        [k for k, _, _ in plan]
    )
    # first window stops exactly at the low cap (24 lows + 24 mixes)
    assert len(plan[0][2]) == 2 * WINDOW_KERNEL_MAX_LOW
    assert len(plan[1][2]) == 4


@pytest.mark.heavy
def test_prefix_salvage_execution_equivalence(monkeypatch):
    """The salvaged-prefix plan EXECUTES correctly end to end: CZ lows
    alternating with rbf butterflies past the low cap, run through
    apply_ops_ri with the kernel path simulated on (interpret-mode
    fallback off-TPU), vs per-op reference application."""
    from rustqip_tpu.engine import pallas_kernels
    from rustqip_tpu.engine.real_apply import (
        WINDOW_KERNEL_MAX_LOW,
        plan_sweeps,
    )

    monkeypatch.setattr(pallas_kernels, "available", lambda: True)
    n = 16
    cz = np.diag([1, 1, 1, -1]).astype(complex).reshape(-1)
    # lane-controlled rbf (ctrl on a col qubit): its support overlaps the
    # lows', so the step-merge pass cannot compose the CZs (or the CXs)
    # across each other — the low count genuinely exceeds the cap.
    cx = make_control_op(
        [n - 3], make_matrix_op([5], gates.X.reshape(-1))
    )  # rbf bit 3, ctrl ("c", 2)
    ops = []
    for _ in range(WINDOW_KERNEL_MAX_LOW + 2):
        ops.append(make_matrix_op([n - 2, n - 1], cz))
        ops.append(cx)
    plan = plan_sweeps(n, ops, True)
    kinds = [k for k, _, _ in plan]
    assert kinds.count("kwindow") == 2 and len(kinds) == 2, kinds

    rng = np.random.default_rng(7)
    state = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    state = (state / np.linalg.norm(state)).astype(np.complex64)
    re, im = jnp.asarray(state.real), jnp.asarray(state.imag)
    gr, gi = apply_ops_ri(n, ops, re, im)
    er, ei = re, im
    for op in ops:
        er, ei = apply_op_ri(n, op, er, ei)
    np.testing.assert_allclose(
        np.asarray(gr) + 1j * np.asarray(gi),
        np.asarray(er) + 1j * np.asarray(ei),
        atol=2e-4,
    )


def test_add28_cmix_plans_all_kernel(monkeypatch):
    """Perf-regression guard (round 3 "cmix"): the 28-qubit ripple
    adder's multi-controlled carry ops (3-4 controls onto HIGH row-bit
    targets — exactly the ops that used to cost one whole-state dense
    pass each) now ride kernel windows as inter-strip controlled
    butterflies. The full adder must plan to <= 8 kernel sweeps with
    ZERO dense/solo passes (was 32 sweeps: 16 XLA windows + 16
    kwindows)."""

    def build(b):
        from rustqip_tpu.algos.arithmetic import add

        rc = b.register(9)
        ra = b.register(9)
        rb = b.register(10)
        add(b, rc, ra, rb)

    kinds = _compiled_plan_kinds(build, monkeypatch)
    assert kinds and set(kinds) == {"kwindow"}, kinds
    assert len(kinds) <= 8, kinds


def test_window_vmem_admission():
    """Scoped-VMEM admission (round 3): Mosaic's kernel stack grows ~one
    (br, 128) block per step — a 65-step butterfly window (the k=9
    adder's carry ladder) OOMed XLA's 16 MiB scoped-VMEM default on v5e
    ("Scoped allocation with size 17.77M ... exceeded scoped vmem limit").
    window_sweep now REQUESTS its estimated need via CompilerParams
    (vmem_limit_bytes) and the planner rejects windows whose estimate
    exceeds WINDOW_VMEM_CEIL, so prefix salvage splits over-long chains
    into multiple sweeps instead of failing at compile time."""
    from rustqip_tpu.engine import pallas_kernels as pk
    from rustqip_tpu.engine.real_apply import _window_kernel_applicable

    steps = [("cbf", 0, (0j, 1 + 0j, 1 + 0j, 0j), (("r", 12),))] * 63
    # the measured failing shape: h=1, br=512, 63 butterfly steps — the
    # request must exceed the 16 MiB default (the actual OOM was 17.77M)
    req = pk.window_vmem_request(1, steps, 512)
    assert req > 16 * 2**20
    assert req <= pk.WINDOW_VMEM_CEIL
    # ...and the adder's real window is admitted by the planner
    assert _window_kernel_applicable(28, (11,), steps)
    # a chain long enough to exceed the ceiling is rejected outright
    long_steps = steps * 7
    assert (
        pk.window_vmem_request(2, long_steps, 512) > pk.WINDOW_VMEM_CEIL
    )
    assert not _window_kernel_applicable(28, (9, 10), long_steps)
