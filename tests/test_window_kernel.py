"""Pallas window-sweep kernel vs the engine, in interpret mode (the
Mosaic compile itself only runs on real TPU; interpret mode checks the
kernel body's semantics on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rustqip_tpu.engine.pallas_kernels import _BLOCK_ROWS, window_sweep
from rustqip_tpu.engine.real_apply import (
    _collect_window,
    _window_kernel_applicable,
    _window_seg_sizes,
    apply_op_ri,
    window_ksteps,
)
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import make_matrix_op

N = 19  # room for strided windows: bit 2 still has 512-row chunks


def _run_window_kernel(ops, n=N, allow_diag=False, max_h=None):
    R, C = 1 << (n - 7), 128
    rng = np.random.default_rng(0)
    sr = rng.normal(size=1 << n).astype(np.float32)
    si = rng.normal(size=1 << n).astype(np.float32)
    kw = {} if max_h is None else {"max_h": max_h}
    window, j = _collect_window(n, ops, 0, allow_diag=allow_diag, **kw)
    assert j == len(ops)
    hq, steps = window
    assert _window_kernel_applicable(n, hq, steps)
    ksteps = window_ksteps(n, hq, steps)
    re, im = jnp.asarray(sr), jnp.asarray(si)
    out_r, out_i = window_sweep(
        n,
        re.reshape(R, C),
        im.reshape(R, C),
        _window_seg_sizes(n, hq),
        ksteps,
        interpret=True,
    )
    got = np.asarray(out_r).reshape(-1) + 1j * np.asarray(out_i).reshape(-1)
    er, ei = re, im
    for op in ops:
        er, ei = apply_op_ri(n, op, er, ei)
    want = np.asarray(er) + 1j * np.asarray(ei)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.heavy
def test_alternating_window_kernel():
    _run_window_kernel(
        [make_matrix_op([(i % 2) * (N - 1)], gates.H.reshape(-1))
         for i in range(8)]
    )


@pytest.mark.heavy
def test_h2_window_kernel():
    _run_window_kernel([
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([1], gates.X.reshape(-1)),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
        make_matrix_op([0], gates.Y.reshape(-1)),
        make_matrix_op([N - 2], gates.H.reshape(-1)),
    ])


def test_strided_window_kernel():
    # Window bit NOT at the top: strips are strided block unions.
    _run_window_kernel([
        make_matrix_op([2], gates.H.reshape(-1)),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
        make_matrix_op([2], gates.H.reshape(-1)),
        make_matrix_op([N - 2], gates.H.reshape(-1)),
    ])


def test_strided_two_bit_window_kernel():
    _run_window_kernel([
        make_matrix_op([1], gates.H.reshape(-1)),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
        make_matrix_op([2], gates.X.reshape(-1)),
        make_matrix_op([N - 2], gates.H.reshape(-1)),
    ])


def _rand_u(rng, k):
    m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
        size=(1 << k, 1 << k)
    )
    q, _ = np.linalg.qr(m)
    return q


def test_rmix_window_kernel():
    """Dense ops straddling the row/col seam with NON-scalar row blocks
    ("rmix" steps: per-strip-pair C x C matmuls) — two disjoint 3-qubit
    unitaries retire in one kernel sweep (the reference's apply_ops
    one-pass semantics, qip-iterators/src/matrix_ops.rs:158-219)."""
    rng = np.random.default_rng(7)
    # N=19: col bits 12..18, row bits 0..11
    _run_window_kernel([
        make_matrix_op([1, 13, 14], _rand_u(rng, 3).reshape(-1)),
        make_matrix_op([2, 15, 16], _rand_u(rng, 3).reshape(-1)),
    ])


def test_lone_rmix_window_kernel():
    """A SINGLE dense op straddling the row/col seam (Grover-28's
    diffusion corner after window-aware fusion: a joint on two row
    qubits plus lane qubits) rides the kernel as a lone-rmix window —
    one read+write vs ~2.5 physical passes on the XLA strip fallback
    (same measured argument as pure-mix windows)."""
    rng = np.random.default_rng(11)
    _run_window_kernel([
        make_matrix_op([0, 1, N - 1], _rand_u(rng, 3).reshape(-1)),
    ])
    _run_window_kernel([
        make_matrix_op([0, 1, N - 2, N - 1], _rand_u(rng, 4).reshape(-1)),
    ])


def test_pure_mix_window_kernel():
    """A pure-mix window (all supports on row qubits, scalar blocks —
    e.g. the bench's one-sweep-per-gate Toffoli shape) rides the kernel:
    the XLA slice/concat fallback measured ~2.5 physical passes per
    sweep (13.2 ms/gate at n=28 vs the 5.2 ms HBM floor), so mix-only
    windows are kernel-applicable since round 3."""
    from rustqip_tpu.ops.matrix_ops import make_control_op

    ccx = np.eye(8, dtype=np.complex128)
    ccx[[6, 7]] = ccx[[7, 6]]
    # N=19: row qubits 0..11; CCX on a row triple = h=3 scalar-mix window
    _run_window_kernel(
        [make_matrix_op([3, 4, 5], ccx.reshape(-1))], allow_diag=True
    )
    # mixed permutation + phases: CZ then CCX on overlapping row bits
    _run_window_kernel(
        [
            make_control_op([1], make_matrix_op([2], gates.Z.reshape(-1))),
            make_matrix_op([1, 2, 3], ccx.reshape(-1)),
        ],
        allow_diag=True,
    )
    # h=1 single-mix window (a lone H on a row qubit — the state_bench
    # "H on qubit 0" shape, previously ~2-3 XLA passes)
    _run_window_kernel(
        [make_matrix_op([0], gates.H.reshape(-1))], allow_diag=True
    )


def test_pure_mix_window_planned_as_kernel_sweep():
    """plan_sweeps admits the bench's unfused Toffoli shape to the kernel
    (one kwindow per gate) when kernel_ok; RUSTQIP_TPU_KERNEL_PURE_MIX=0
    reverts mix-only windows to the XLA window path (escape hatch for
    Mosaic-compile-bound circuits)."""
    import os

    from rustqip_tpu.engine.real_apply import plan_sweeps

    ccx = np.eye(8, dtype=np.complex128)
    ccx[[6, 7]] = ccx[[7, 6]]
    ops = [
        make_matrix_op(list(t), ccx.reshape(-1))
        for t in ((3, 4, 5), (6, 7, 8), (9, 10, 11), (4, 6, 10))
    ]
    plan = plan_sweeps(28, ops, True)
    assert [k for k, _, _ in plan] == ["kwindow"] * 4
    assert all(len(run) == 1 for _, _, run in plan)

    os.environ["RUSTQIP_TPU_KERNEL_PURE_MIX"] = "0"
    try:
        plan = plan_sweeps(28, ops, True)
        assert [k for k, _, _ in plan] == ["window"] * 4
    finally:
        del os.environ["RUSTQIP_TPU_KERNEL_PURE_MIX"]


def test_controlled_butterflies_in_window_kernel():
    """ControlOps with a single-qubit dense inner become CONTROLLED
    in-block butterflies (round 3): the partner comes from the usual
    lane/sublane roll and the control mask reads absolute row/col iotas,
    so controls sit on ANY qubit. This is the path that lets CCX/CNOT
    chains — whose targets hug the row/col seam where strip windows
    cannot form — ride the kernel."""
    from rustqip_tpu.ops.matrix_ops import make_control_op

    X = gates.X.reshape(-1)
    # CNOT: high-row control -> lane target (cbf with row ctrl), plus a
    # plain cbf so the window is kernel-applicable at h=0
    _run_window_kernel(
        [
            make_control_op([0], make_matrix_op([N - 2], X)),
            make_matrix_op([N - 1], gates.H.reshape(-1)),
        ],
        allow_diag=True,
    )
    # CCX: row + lane controls -> low row-bit target (rbf, mixed ctrl)
    _run_window_kernel(
        [
            make_control_op([1, N - 3], make_matrix_op([9], X)),
            make_control_op([0], make_matrix_op([10], X)),
        ],
        allow_diag=True,
    )
    # wide multi-controlled Z (Grover diffusion shape): 6 controls at
    # arbitrary positions, lane target
    _run_window_kernel(
        [
            make_control_op(
                [0, 2, 5, 9, N - 3, N - 2],
                make_matrix_op([N - 1], gates.Z.reshape(-1)),
            ),
            make_matrix_op([N - 1], gates.H.reshape(-1)),
        ],
        allow_diag=True,
    )
    # arithmetic-style chain: several CCX/CNOTs retire in ONE sweep
    ops = [
        make_control_op([3, 4], make_matrix_op([10], X)),
        make_control_op([10], make_matrix_op([N - 1], X)),
        make_control_op([5, N - 1], make_matrix_op([9], X)),
        make_control_op([9], make_matrix_op([8], X)),
    ]
    from rustqip_tpu.engine.real_apply import plan_sweeps

    plan = plan_sweeps(N, ops, True)
    assert [k for k, _, _ in plan] == ["kwindow"], [k for k, _, _ in plan]
    _run_window_kernel(ops, allow_diag=True)


def test_arithmetic_adder_via_keep_fusion_and_kernel_plan():
    """End-to-end: a real adder circuit's op stream, fused with the
    compiler's butterfly keep-predicate, planned with kernel_ok, and
    every kwindow executed through the INTERPRET-mode kernel — must
    match op-by-op execution of the raw gate stream. This is the
    round-3 path that takes add-n28 from 17 sweeps (0 kernel) to 8
    (5 kernel windows)."""
    from rustqip_tpu.algos import arithmetic
    from rustqip_tpu.builder.builder import LocalBuilder
    from rustqip_tpu.engine import relabel
    from rustqip_tpu.engine.compile import UnitaryEntry
    from rustqip_tpu.engine.fusion import fuse_ops
    from rustqip_tpu.engine.real_apply import (
        _window_kernel_run,
        _window_seg_sizes,
        _window_sweep_ri,
        butterfly_eligible,
        plan_sweeps,
    )

    b = LocalBuilder()
    k = 6
    ra = b.register(k)
    rb = b.register(k + 1)
    rc = b.make_zeroed_temp_register(k)
    ra, rb, rc = arithmetic.add(b, rc, ra, rb)
    cc = b.compile()
    n = cc.n
    raw = [e.op for e in cc.entries if isinstance(e, UnitaryEntry)]
    pos = list(range(n))
    raw = relabel.defer_swaps_ops(n, raw, pos) + relabel.materialize(pos)
    fused = fuse_ops(raw, 5, keep=lambda op: butterfly_eligible(n, op))
    plan = plan_sweeps(n, fused, True)
    kinds = [kind for kind, _, _ in plan]
    assert "kwindow" in kinds, kinds

    rng = np.random.default_rng(17)
    state = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    state /= np.linalg.norm(state)
    re = jnp.asarray(state.real.astype(np.float32))
    im = jnp.asarray(state.imag.astype(np.float32))
    R, C = 1 << (n - 7), 128

    gr, gi = re, im
    for kind, payload, _run in plan:
        if kind == "kwindow":
            hq, steps = payload
            ksteps = window_ksteps(n, hq, steps)
            out_r, out_i = window_sweep(
                n,
                gr.reshape(R, C),
                gi.reshape(R, C),
                _window_seg_sizes(n, hq),
                ksteps,
                interpret=True,
            )
            gr, gi = out_r.reshape(-1), out_i.reshape(-1)
        elif kind == "window":
            gr, gi = _window_sweep_ri(n, payload, gr, gi)
        else:
            gr, gi = apply_op_ri(n, payload, gr, gi)

    er, ei = re, im
    for op in raw:
        er, ei = apply_op_ri(n, op, er, ei)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(er), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(ei), atol=1e-4)


def test_controlled_gates_in_window_kernel():
    """Seam-straddling CNOT/CCX normalize to dense ops inside window
    collection and run through the kernel (identity blocks demoted to
    scalar mixes; the X block as one rmix matmul)."""
    from rustqip_tpu.ops.matrix_ops import make_control_op

    _run_window_kernel([
        make_control_op([0], make_matrix_op([14], gates.X.reshape(-1))),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
        make_control_op(
            [1, 13], make_matrix_op([15], gates.X.reshape(-1))
        ),
        make_matrix_op([0], gates.H.reshape(-1)),
    ])


def test_rmix_mixed_with_scalar_steps():
    """rmix interleaved with plain mixes, lane matmuls, and rbf
    butterflies in one window."""
    rng = np.random.default_rng(11)
    _run_window_kernel([
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([1, 12, 13], _rand_u(rng, 3).reshape(-1)),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
        make_matrix_op([2, 0], gates.CNOT.reshape(-1)),
        make_matrix_op([N - 2], gates.H.reshape(-1)),
    ])


def test_low_heavy_window_kernel():
    rng = np.random.default_rng(5)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    u, _ = np.linalg.qr(m)
    _run_window_kernel([
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([N - 1, N - 3], u.reshape(-1)),
        make_matrix_op([N - 2], gates.S.reshape(-1)),
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([N - 1], gates.H.reshape(-1)),
    ])


def test_diag_window_kernel():
    # QFT-like ladder: H(high) + controlled-phase diagonals spanning row
    # and column qubits evaluate in-body.
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    rng = np.random.default_rng(7)
    terms = []
    for q in (0, 3, 8):
        ang = rng.uniform(-3, 3)
        terms.append(
            ((q, N - 1), (1, 1, 1, complex(np.cos(ang), np.sin(ang))))
        )
    diag = PhaseProductOp(tuple(terms))
    _run_window_kernel(
        [
            make_matrix_op([0], gates.H.reshape(-1)),
            diag,
            make_matrix_op([1], gates.H.reshape(-1)),
            make_matrix_op([N - 1], gates.T.reshape(-1)),
            diag,
        ],
        allow_diag=True,
    )


def test_diag_only_window_kernel_h0():
    # h = 0: composed low matmuls + a diagonal, one kernel sweep.
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    diag = PhaseProductOp((((2, N - 1), (1, 1j, 1, -1j)),))
    _run_window_kernel(
        [
            make_matrix_op([N - 1], gates.H.reshape(-1)),
            diag,
            make_matrix_op([N - 2], gates.H.reshape(-1)),
        ],
        allow_diag=True,
    )


def test_real_matrix_low_steps():
    # All-real composed B (Hadamard krons) takes the 2-dot "lowr" path
    # when collected for the XLA window (no cbf without allow_diag).
    ops = [
        make_matrix_op([(i % 2) * (N - 1)], gates.H.reshape(-1))
        for i in range(8)
    ]
    _run_window_kernel(ops, allow_diag=False)


def test_cbf_alternating_window():
    # Kernel collection: single-column-qubit gates become lane-roll
    # butterfly steps (no matmul operand), exact f32.
    ops = [
        make_matrix_op([(i % 2) * (N - 1)], gates.H.reshape(-1))
        for i in range(8)
    ]
    window, j = _collect_window(N, ops, 0, allow_diag=True)
    assert j == len(ops)
    assert any(s[0] == "cbf" for s in window[1])
    assert not any(s[0] == "low" for s in window[1])
    _run_window_kernel(ops, allow_diag=True)


def test_cbf_composition_same_bit():
    # Adjacent same-qubit singles compose into ONE cbf step (T.T == S).
    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
        make_matrix_op([N - 1], gates.T.reshape(-1)),
    ]
    window, j = _collect_window(N, ops, 0, allow_diag=True)
    assert j == len(ops)
    cbfs = [s for s in window[1] if s[0] == "cbf"]
    assert len(cbfs) == 1
    np.testing.assert_allclose(
        np.array(cbfs[0][2]).reshape(2, 2), gates.S, atol=1e-12
    )
    _run_window_kernel(ops, allow_diag=True)


def test_complex_singles_all_lane_bits():
    # Random complex singles on every column qubit (cbf on each lane bit
    # 0..6), anchored by one row-qubit mix so the window kernel engages.
    rng = np.random.default_rng(9)
    ops = [make_matrix_op([0], gates.H.reshape(-1))]
    for q in range(N - 7, N):
        m = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        u, _ = np.linalg.qr(m)
        ops.append(make_matrix_op([q], u.reshape(-1)))
    _run_window_kernel(ops, allow_diag=True)


def test_mixed_real_complex_low_with_diag():
    # real low + in-body diagonal + complex 2-column-qubit matmul, one sweep.
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    rng = np.random.default_rng(11)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    u, _ = np.linalg.qr(m)
    diag = PhaseProductOp((((2, N - 1), (1, 1j, 1, -1j)),))
    _run_window_kernel(
        [
            make_matrix_op([0], gates.H.reshape(-1)),
            make_matrix_op([N - 1], gates.H.reshape(-1)),
            diag,
            make_matrix_op([N - 2, N - 4], u.reshape(-1)),
            make_matrix_op([N - 3], gates.T.reshape(-1)),
        ],
        allow_diag=True,
    )


@pytest.mark.heavy
def test_h3_window_kernel():
    # Three distinct row bits (8 strips, halved block rows) in one sweep.
    _run_window_kernel(
        [
            make_matrix_op([0], gates.H.reshape(-1)),
            make_matrix_op([N - 1], gates.T.reshape(-1)),
            make_matrix_op([1], gates.X.reshape(-1)),
            make_matrix_op([N - 2], gates.H.reshape(-1)),
            make_matrix_op([2], gates.Y.reshape(-1)),
            make_matrix_op([N - 3], gates.S.reshape(-1)),
        ],
        allow_diag=True,
    )


def test_h3_window_with_diag():
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    diag = PhaseProductOp((((1, N - 1), (1, 1j, 1, -1j)),))
    _run_window_kernel(
        [
            make_matrix_op([0], gates.H.reshape(-1)),
            make_matrix_op([1], gates.H.reshape(-1)),
            make_matrix_op([2], gates.H.reshape(-1)),
            diag,
            make_matrix_op([N - 1], gates.H.reshape(-1)),
        ],
        allow_diag=True,
    )


@pytest.mark.parametrize("wide", [False, True])
def test_window_diag_mixed_group_paths(wide):
    """Mixed monomials that survive per-strip specialization (free-row x
    lane CPs — the QFT-28 seam-window shape) group by ROW SUPPORT:
    wide=False builds 7 CPs in 2 row groups (grouped-mask path: row
    mask + lane-vector phase per group, incl. one multi-bit col
    support); wide=True spreads 6 CPs over 6 distinct row groups,
    crossing ``_diag_mask_max`` into the block angle-accumulation path.
    All CPs merge into ONE diag step (cap 96); parity vs the op-by-op
    engine."""
    from rustqip_tpu.engine import pallas_kernels
    from rustqip_tpu.engine.real_apply import merge_window_steps
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    def cp(qs, theta):
        dim = 1 << len(qs)
        vals = [1] * dim
        vals[-1] = np.exp(1j * theta)
        return PhaseProductOp(((tuple(qs), tuple(vals)),))

    if wide:
        cps = [cp((t, 13 + t % 6), 0.2 + 0.2 * t) for t in range(2, 8)]
        n_groups = 6
    else:
        cps = [
            cp((2, 13), 0.31),
            cp((2, 14), 0.52),
            cp((3, 15), 0.73),
            cp((3, 16), 0.94),
            cp((2, 17), 1.15),
            cp((3, 18), 1.36),
            cp((3, 14, 17), 0.41),  # multi-bit col support in a group
        ]
        n_groups = 2
    ops = (
        [make_matrix_op([0], gates.H.reshape(-1))]
        + cps
        + [make_matrix_op([0], gates.T.reshape(-1))]
    )

    window, j = _collect_window(N, ops, 0, allow_diag=True)
    assert j == len(ops)
    hq, steps = window
    steps = merge_window_steps(N, steps)
    diags = [s for s in steps if s[0] == "diag"]
    assert len(diags) == 1, [s[0] for s in steps]
    groups = {rq for rq, _cq, _c in diags[0][1][3]}
    assert len(groups) == n_groups
    assert (len(groups) > pallas_kernels._diag_mask_max()) == wide
    assert _window_kernel_applicable(N, hq, steps)

    R, C = 1 << (N - 7), 128
    rng = np.random.default_rng(3)
    sr = rng.normal(size=1 << N).astype(np.float32)
    si = rng.normal(size=1 << N).astype(np.float32)
    re, im = jnp.asarray(sr), jnp.asarray(si)
    ksteps = window_ksteps(N, hq, steps)
    out_r, out_i = window_sweep(
        N,
        re.reshape(R, C),
        im.reshape(R, C),
        _window_seg_sizes(N, hq),
        ksteps,
        interpret=True,
    )
    got = np.asarray(out_r).reshape(-1) + 1j * np.asarray(out_i).reshape(-1)
    er, ei = re, im
    for op in ops:
        er, ei = apply_op_ri(N, op, er, ei)
    want = np.asarray(er) + 1j * np.asarray(ei)
    np.testing.assert_allclose(got, want, atol=1e-4)
    """h=4 (16 strips, ladder-gated behind RUSTQIP_TPU_WINDOW_MAXH=4):
    the kernel body is generic over the strip count — four distinct row
    bits chain in ONE sweep (an H-broadcast's 12 high row qubits then
    need 3 windows instead of 4). n=21 so four qubits (0..3, row bits
    13..10) sit ABOVE the in-block rbf range and must all become window
    bits."""
    n4 = 21
    _run_window_kernel(
        [
            make_matrix_op([0], gates.H.reshape(-1)),
            make_matrix_op([1], gates.X.reshape(-1)),
            make_matrix_op([2], gates.Y.reshape(-1)),
            make_matrix_op([3], gates.H.reshape(-1)),
            make_matrix_op([n4 - 1], gates.T.reshape(-1)),
        ],
        n=n4,
        allow_diag=True,
        max_h=4,
    )


def test_h4_window_with_diag():
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    n4 = 21
    diag = PhaseProductOp((((2, n4 - 1), (1, 1j, 1, -1j)),))
    _run_window_kernel(
        [
            make_matrix_op([0], gates.H.reshape(-1)),
            make_matrix_op([1], gates.H.reshape(-1)),
            make_matrix_op([2], gates.H.reshape(-1)),
            make_matrix_op([3], gates.H.reshape(-1)),
            diag,
            make_matrix_op([n4 - 1], gates.H.reshape(-1)),
        ],
        n=n4,
        allow_diag=True,
        max_h=4,
    )


def test_h4_ladder_env_gate(monkeypatch):
    """Default ladder is (4,3,2,1) — the H-broadcast's 12 high row
    qubits (n=28) collect into 3 mix windows; RUSTQIP_TPU_WINDOW_MAXH=
    3,2,1 reverts to the pre-round-5 ladder (4 windows). Planning only —
    no state is allocated."""
    from rustqip_tpu.engine.real_apply import (
        _window_maxh_ladder,
        plan_sweeps,
    )

    monkeypatch.delenv("RUSTQIP_TPU_WINDOW_MAXH", raising=False)
    assert _window_maxh_ladder() == (4, 3, 2, 1)
    ops = [
        make_matrix_op([q], gates.H.reshape(-1)) for q in range(12)
    ]
    plan = plan_sweeps(28, ops, True)
    k4 = [e for e in plan if e[0] == "kwindow"]
    assert len(k4) == 3
    assert all(len(e[1][0]) == 4 for e in k4)
    monkeypatch.setenv("RUSTQIP_TPU_WINDOW_MAXH", "3,2,1")
    assert _window_maxh_ladder() == (3, 2, 1)
    plan = plan_sweeps(28, ops, True)
    k3 = [e for e in plan if e[0] == "kwindow"]
    assert len(k3) == 4


def test_qft_window_kernel_equivalence():
    # The real QFT fused-op stream through apply_ops_ri with the kernel
    # forced on (interpret mode is exercised above; here the collection +
    # two-pass dispatch path must still be exact with the kernel OFF).
    from rustqip_tpu.algos.qfft import qfft
    from rustqip_tpu.builder.builder import LocalBuilder, _lower_item
    from rustqip_tpu.engine.compile import UnitaryEntry
    from rustqip_tpu.engine.fusion import fuse_ops
    from rustqip_tpu.engine.real_apply import apply_ops_ri

    n = 10
    b = LocalBuilder(dtype="f64")
    qfft(b, b.register(n))
    entries = []
    for item in b.pipeline:
        entries.extend(_lower_item(item))
    ops = fuse_ops([e.op for e in entries if isinstance(e, UnitaryEntry)])
    rng = np.random.default_rng(1)
    s = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    s /= np.linalg.norm(s)
    gr, gi = apply_ops_ri(n, ops, jnp.asarray(s.real), jnp.asarray(s.imag))
    got = np.asarray(gr) + 1j * np.asarray(gi)
    # ground truth: per-op application
    er, ei = jnp.asarray(s.real), jnp.asarray(s.imag)
    for op in ops:
        er, ei = apply_op_ri(n, op, er, ei)
    want = np.asarray(er) + 1j * np.asarray(ei)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_rbf_only_window():
    # Single-qubit gates on LOW row bits (qubits n_m-1..n_m-6 at N=19:
    # row bits 0..5) chain as sublane-roll butterflies — no strips.
    _run_window_kernel(
        [
            make_matrix_op([11], gates.H.reshape(-1)),   # row bit 0
            make_matrix_op([9], gates.Y.reshape(-1)),    # row bit 2
            make_matrix_op([6], gates.H.reshape(-1)),    # row bit 5
        ],
        allow_diag=True,
    )


def test_rbf_with_diag_and_cbf():
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    rng = np.random.default_rng(11)
    terms = []
    for q in (8, 10):
        ang = rng.uniform(-3, 3)
        terms.append(
            ((q, N - 1), (1, 1, 1, complex(np.cos(ang), np.sin(ang))))
        )
    diag = PhaseProductOp(tuple(terms))
    _run_window_kernel(
        [
            make_matrix_op([10], gates.H.reshape(-1)),   # rbf row bit 1
            diag,
            make_matrix_op([N - 1], gates.H.reshape(-1)),  # cbf lane bit 0
            make_matrix_op([8], gates.T.reshape(-1)),    # rbf row bit 3
        ],
        allow_diag=True,
    )


def test_rbf_composition_same_bit():
    # Adjacent same-bit rbf gates compose host-side: H then T on the
    # same row qubit becomes one butterfly (a lone composed butterfly is
    # then NOT worth a kernel window — XLA handles a single pass fine —
    # so a cbf rides along to qualify the window).
    from rustqip_tpu.engine.real_apply import _collect_window

    ops = [
        make_matrix_op([9], gates.H.reshape(-1)),
        make_matrix_op([9], gates.T.reshape(-1)),
        make_matrix_op([9], gates.H.reshape(-1)),
        make_matrix_op([N - 1], gates.H.reshape(-1)),
    ]
    window, j = _collect_window(N, ops, 0, allow_diag=True)
    assert j == 4
    hq, steps = window
    assert hq == ()
    assert [s[0] for s in steps] == ["rbf", "cbf"]
    _run_window_kernel(ops, allow_diag=True)


def test_rbf_behind_strips():
    # rbf inside a strip window (hq from a high-bit mix) — the strip
    # blocks are br-aligned so the in-block row bit is still position p.
    _run_window_kernel(
        [
            make_matrix_op([0], gates.H.reshape(-1)),    # mix (row bit 11)
            make_matrix_op([11], gates.H.reshape(-1)),   # rbf row bit 0
            make_matrix_op([N - 1], gates.T.reshape(-1)),  # cbf
        ],
        allow_diag=True,
    )


def test_rbf_qft_middle_ladder():
    # The exact shape that motivated rbf: QFT-28's qubits 15..20 analog —
    # H + controlled-phase diag per qubit, trailing segments too small
    # for strips.
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    ops = []
    rng = np.random.default_rng(13)
    for q in (7, 8, 9, 10, 11):
        ops.append(make_matrix_op([q], gates.H.reshape(-1)))
        terms = []
        for q2 in range(q + 1, N):
            ang = rng.uniform(-3, 3)
            terms.append(
                ((q, q2), (1, 1, 1, complex(np.cos(ang), np.sin(ang))))
            )
        ops.append(PhaseProductOp(tuple(terms)))
    _run_window_kernel(ops, allow_diag=True)


@pytest.mark.heavy
def test_window_kernel_randomized_fuzz():
    """Random window-eligible op mixes (mixes, cbf, rbf, diags, low
    matmuls) through the interpret-mode kernel vs op-by-op execution —
    hardens the specialization/butterfly/strip seams beyond the shaped
    tests above."""
    from rustqip_tpu.engine.real_apply import (
        _collect_window,
        _window_kernel_applicable,
    )
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    rng = np.random.default_rng(99)

    def rand_u2():
        m = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        q, _ = np.linalg.qr(m)
        return q

    def rand_diag(max_terms=3):
        terms = []
        for _ in range(rng.integers(1, max_terms + 1)):
            a, b = rng.choice(N, size=2, replace=False)
            ang = rng.uniform(-3, 3)
            terms.append(
                ((int(a), int(b)),
                 (1, 1, 1, complex(np.cos(ang), np.sin(ang))))
            )
        return PhaseProductOp(tuple(terms))

    from rustqip_tpu.ops.matrix_ops import make_control_op

    # qubit pools at N=19 (n_m=12): window bits 0..2, rbf 3..11, lanes 12..18
    for trial in range(6):
        ops = []
        for _ in range(rng.integers(3, 9)):
            kind = rng.integers(0, 6)
            if kind == 5:
                # Controlled butterfly / cmix (round 3): 1q dense inner
                # on ANY target — lane (cbf), low row bit (rbf), or high
                # row bit (cmix, qubits 0..2 here) — controls at ANY
                # other position.
                tq = int(rng.integers(0, N))
                nc = int(rng.integers(1, 4))
                pool = [q for q in range(N) if q != tq]
                ctrls = [
                    int(q)
                    for q in rng.choice(pool, size=nc, replace=False)
                ]
                ops.append(
                    make_control_op(
                        ctrls, make_matrix_op([tq], rand_u2().reshape(-1))
                    )
                )
            elif kind == 4:
                # Straddling dense op (rmix candidate): 1 row bit from
                # the window pool + 1-2 lane bits.
                rb = int(rng.integers(0, 3))
                nl = int(rng.integers(1, 3))
                lanes = rng.choice(np.arange(12, N), size=nl,
                                   replace=False)
                bits = [rb] + [int(q) for q in lanes]
                ops.append(
                    make_matrix_op(
                        bits, _rand_u(rng, len(bits)).reshape(-1)
                    )
                )
            elif kind == 0:
                ops.append(
                    make_matrix_op([int(rng.integers(0, 3))],
                                   rand_u2().reshape(-1))
                )
            elif kind == 1:
                ops.append(
                    make_matrix_op([int(rng.integers(3, 12))],
                                   rand_u2().reshape(-1))
                )
            elif kind == 2:
                ops.append(
                    make_matrix_op([int(rng.integers(12, N))],
                                   rand_u2().reshape(-1))
                )
            else:
                ops.append(rand_diag())
        window, j = _collect_window(N, ops, 0, allow_diag=True)
        if window is None or not _window_kernel_applicable(
            N, window[0], window[1]
        ):
            continue
        ops = ops[:j]
        _run_window_kernel(ops, allow_diag=True)


@pytest.mark.heavy
def test_cmix_high_row_targets_window_kernel():
    """Multi-controlled 1q gates with HIGH row-bit targets (above the
    rbf in-block range) window as "cmix" steps — the target joins the
    window bit set, controls become absolute-iota masks — instead of
    one whole-state dense pass each (the arithmetic library's
    carry/overflow ops; cf. reference apply loops
    qip-iterators/src/matrix_ops.rs:158-219). At N=19 (n_m=12) qubits
    0..2 sit on row bits 11..9."""
    from rustqip_tpu.ops.matrix_ops import make_control_op

    _run_window_kernel(
        [
            make_control_op([5, 15], make_matrix_op([0], gates.X.reshape(-1))),
            make_control_op(
                [3, 8, 17], make_matrix_op([1], gates.H.reshape(-1))
            ),
            make_matrix_op([N - 1], gates.T.reshape(-1)),
            make_control_op([12, 4], make_matrix_op([0], gates.Y.reshape(-1))),
            make_matrix_op([7], gates.H.reshape(-1)),
        ],
        allow_diag=True,
    )


def test_cmix_composition_same_target():
    """Adjacent cmix steps with the same target and control set compose
    host-side into one inter-strip butterfly (C(U)C(V) = C(UV))."""
    from rustqip_tpu.engine.real_apply import _collect_window
    from rustqip_tpu.ops.matrix_ops import make_control_op

    ops = [
        make_control_op([5, 15], make_matrix_op([0], gates.H.reshape(-1))),
        make_control_op([5, 15], make_matrix_op([0], gates.T.reshape(-1))),
        make_control_op([15, 5], make_matrix_op([0], gates.H.reshape(-1))),
    ]
    window, j = _collect_window(N, ops, 0, allow_diag=True)
    assert j == 3
    hq, steps = window
    assert hq == (0,)
    assert [s[0] for s in steps] == ["cmix"]


def test_cmix_distinct_targets_respect_window_bit_budget():
    """cmix targets consume window bits: four ops on four distinct high
    row-bit targets cannot share one h<=3 window — the collection must
    break after three distinct targets."""
    from rustqip_tpu.engine.real_apply import _collect_window
    from rustqip_tpu.ops.matrix_ops import make_control_op

    n = 23  # n_m = 16: qubits 0..6 sit on row bits 15..9 (cmix range)
    ops = [
        make_control_op([10 + t], make_matrix_op([t], gates.X.reshape(-1)))
        for t in range(4)
    ]
    window, j = _collect_window(n, ops, 0, allow_diag=True)
    assert j == 3
    assert window[0] == (0, 1, 2)


def test_inplace_policy_thresholds(monkeypatch):
    """In-place output aliasing engages exactly when fresh in+out buffers
    would reach 8 GiB (n=29 at the (rows, 128) geometry): fresh outputs
    measured 5.5 ms/sweep FASTER at n=28, but at n=29 the near-capacity
    allocation cost ~4x per-sweep bandwidth, and n=30 cannot fit at all
    without aliasing. Env forces either way."""
    from rustqip_tpu.engine import pallas_kernels as pk

    monkeypatch.delenv("RUSTQIP_TPU_KERNEL_INPLACE", raising=False)
    assert not pk._inplace_policy(1 << 21)  # n=28: fresh outputs
    assert pk._inplace_policy(1 << 22)  # n=29: in-place
    assert pk._inplace_policy(1 << 23)  # n=30: in-place (mandatory)
    monkeypatch.setenv("RUSTQIP_TPU_KERNEL_INPLACE", "0")
    assert not pk._inplace_policy(1 << 23)
    monkeypatch.setenv("RUSTQIP_TPU_KERNEL_INPLACE", "1")
    assert pk._inplace_policy(1 << 10)


def test_window_strip_activity_analysis():
    """window_strip_activity finds the strips a sweep must read/write:
    a CCX mix window touches 2 of 8 strips; window-bit butterfly
    controls prune strips at trace time; dense H mixes touch all."""
    from rustqip_tpu.engine.pallas_kernels import window_strip_activity
    from rustqip_tpu.engine.real_apply import _collect_window, _window_seg_sizes
    from rustqip_tpu.ops.matrix_ops import make_control_op

    n = N
    ccx = np.eye(8, dtype=np.complex128)
    ccx[[6, 7]] = ccx[[7, 6]]

    def activity(ops):
        window, j = _collect_window(n, ops, 0, allow_diag=True)
        assert j == len(ops)
        hq, steps = window
        ksteps = window_ksteps(n, hq, steps)
        segs = _window_seg_sizes(n, hq)
        return window_strip_activity(n, segs, ksteps)

    # CCX on a row triple: only the |11x> strips (indices 6 and 7 in
    # window order) are read or written.
    in_ids, out_ids = activity([make_matrix_op([3, 4, 5], ccx.reshape(-1))])
    assert in_ids == (6, 7) and out_ids == (6, 7)

    # H on a row qubit: dense 2x2 mix — both strips active.
    in_ids, out_ids = activity([make_matrix_op([0], gates.H.reshape(-1))])
    assert in_ids == (0, 1) and out_ids == (0, 1)

    # CCX then a controlled butterfly whose control is a WINDOW row bit
    # (CX: control qubit 3 = window bit, in-block target): the butterfly
    # only touches the control=1 strips, the CCX only strips 6,7 — the
    # control=0 half of the window is never read or written.
    in_ids, out_ids = activity(
        [
            make_matrix_op([3, 4, 5], ccx.reshape(-1)),
            make_control_op([3], make_matrix_op([10], gates.X.reshape(-1))),
        ]
    )
    assert in_ids == (4, 5, 6, 7) and out_ids == (4, 5, 6, 7)


def test_strip_skip_parity_and_env_hatch(monkeypatch):
    """Skip-enabled and skip-disabled sweeps agree exactly on a CCX
    window (the unfused bench shape), and the env hatch forces the
    full-strip schedule."""
    from rustqip_tpu.engine import pallas_kernels as pk

    ccx = np.eye(8, dtype=np.complex128)
    ccx[[6, 7]] = ccx[[7, 6]]
    ops = [make_matrix_op([3, 4, 5], ccx.reshape(-1))]

    monkeypatch.setenv("RUSTQIP_TPU_KERNEL_SKIP_STRIPS", "1")
    assert pk._strip_skip_enabled()
    _run_window_kernel(ops, allow_diag=True)

    monkeypatch.setenv("RUSTQIP_TPU_KERNEL_SKIP_STRIPS", "0")
    assert not pk._strip_skip_enabled()
    _run_window_kernel(ops, allow_diag=True)


def test_strip_skip_multi_step_dependency():
    """A window whose second step consumes a strip the first step wrote:
    the activity analysis keeps dependency strips live (reads only what
    the ORIGINAL state must supply)."""
    from rustqip_tpu.engine.pallas_kernels import window_strip_activity
    from rustqip_tpu.engine.real_apply import _collect_window, _window_seg_sizes
    from rustqip_tpu.ops.matrix_ops import make_control_op

    n = N
    ccx = np.eye(8, dtype=np.complex128)
    ccx[[6, 7]] = ccx[[7, 6]]
    cz = np.diag([1, 1, 1, -1]).astype(np.complex128)
    ops = [
        make_matrix_op([3, 4, 5], ccx.reshape(-1)),  # touches strips 6,7
        make_matrix_op([3, 4], cz.reshape(-1)),      # phases strips 6,7 (11xx)
    ]
    window, j = _collect_window(n, ops, 0, allow_diag=True)
    assert j == len(ops)
    hq, steps = window
    ksteps = window_ksteps(n, hq, steps)
    in_ids, out_ids = window_strip_activity(
        n, _window_seg_sizes(n, hq), ksteps
    )
    assert in_ids == (6, 7) and out_ids == (6, 7)
    _run_window_kernel(ops, allow_diag=True)
