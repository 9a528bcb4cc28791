"""Commute-aware window-step merging (engine/real_apply.merge_window_steps).

Same-bit butterfly/mix chains must compose across commuting steps (and
cancel when their product is the identity) without changing semantics;
overlapping supports must block the move. The reference applies every gate
one pass at a time with no algebraic simplification (matrix_ops.rs:98-152),
so these guards pin OUR planner's extra behavior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rustqip_tpu.engine.real_apply import (
    apply_op_ri,
    apply_ops_ri,
    merge_window_steps,
    plan_sweeps,
)
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import (
    PhaseProductOp,
    make_control_op,
    make_matrix_op,
)


def _phase_op(indices, diag):
    return PhaseProductOp(
        ((tuple(indices), tuple(complex(v) for v in diag)),)
    )

N = 19  # row qubits 0-11 are genuine row bits; kernel windows form


def _check(ops, n=N, kernel_ok=True, atol=1e-4):
    """apply_ops_ri (planned, merged, interpret-mode kernel on CPU) vs
    sequential per-op application. f32 planes select the kernel path."""
    rng = np.random.default_rng(7)
    state = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    state /= np.linalg.norm(state)
    re = jnp.asarray(state.real.astype(np.float32))
    im = jnp.asarray(state.imag.astype(np.float32))
    gr, gi = apply_ops_ri(n, ops, re, im, kernel_ok=kernel_ok)
    er, ei = re, im
    for op in ops:
        er, ei = apply_op_ri(n, op, er, ei)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    want = np.asarray(er) + 1j * np.asarray(ei)
    np.testing.assert_allclose(got, want, atol=atol)


def _steps_of(plan):
    return [
        [s[0] for s in payload[1]]
        for kind, payload, _ in plan
        if kind in ("kwindow", "window")
    ]


def test_hh_pairs_cancel_to_empty_plan():
    ops = [make_matrix_op([0], gates.H.reshape(-1)) for _ in range(4)]
    plan = plan_sweeps(N, ops, True)
    assert plan == []  # H^4 = I: the whole run vanishes
    _check(ops)


def test_alternating_bench_shape_merges_to_two_steps():
    # The bench's fused arm: alternating H(row bit)/H(lane bit). Odd
    # counts of each survive as exactly one mix + one cbf.
    ops = [
        make_matrix_op([(i % 2) * (N - 1)], gates.H.reshape(-1))
        for i in range(30)
    ]
    plan = plan_sweeps(N, ops, True)
    assert len(plan) == 1 and plan[0][0] == "kwindow"
    kinds = sorted(s[0] for s in plan[0][1][1])
    assert kinds == ["cbf", "mix"]
    _check(ops)


def test_t_ladder_composes_through_commuting_steps():
    # T(lane)^8 = I and H(row)^8 = I even though the steps interleave.
    ops = []
    for _ in range(8):
        ops.append(make_matrix_op([N - 1], gates.T.reshape(-1)))
        ops.append(make_matrix_op([0], gates.H.reshape(-1)))
    plan = plan_sweeps(N, ops, True)
    assert plan == []
    _check(ops)


def test_overlapping_support_blocks_merge():
    # CX(ctrl=0 -> tgt=N-1) ... H(0) ... CX: the H on the CONTROL qubit
    # sits between the two butterflies, so they must NOT compose.
    cx = make_control_op([0], make_matrix_op([N - 1], gates.X.reshape(-1)))
    h0 = make_matrix_op([0], gates.H.reshape(-1))
    ops = [cx, h0, cx]
    plan = plan_sweeps(N, ops, True)
    steps = _steps_of(plan)
    assert steps == [["cbf", "mix", "cbf"]]
    _check(ops)


def test_disjoint_ctrl_butterflies_cancel():
    # CCX . CCX = I with an unrelated lane gate between them.
    ccx = make_control_op(
        [0, 1], make_matrix_op([N - 1], gates.X.reshape(-1))
    )
    t = make_matrix_op([N - 2], gates.T.reshape(-1))
    plan = plan_sweeps(N, [ccx, t, ccx], True)
    steps = _steps_of(plan)
    assert steps == [["cbf"]]  # only the T survives
    _check([ccx, t, ccx])


def test_row_mix_composition_and_cancel():
    # X(0) Z(1) X(0) -> mixes compose across the disjoint Z: X X = I.
    x0 = make_matrix_op([0], gates.X.reshape(-1))
    z1 = make_matrix_op([1], gates.Z.reshape(-1))
    ops = [x0, z1, x0]
    plan = plan_sweeps(N, ops, True)
    steps = _steps_of(plan)
    assert steps == [["mix"]]
    _check(ops)


def test_diag_steps_merge_angle_groups():
    # Two CP-style diagonals with an H between them: diagonals always
    # commute, so the two diag steps sum into one. The phase spans a
    # (row, lane) pair so it plans as a "diag" step (a lane-only diagonal
    # would join the composed "low" matmul run instead — also merged,
    # but a different path).
    cp = _phase_op([2, N - 1], np.exp(1j * np.pi / 4 * np.arange(4)))
    h0 = make_matrix_op([0], gates.H.reshape(-1))
    ops = [cp, h0, cp]
    plan = plan_sweeps(N, ops, True)
    steps = _steps_of(plan)
    assert steps == [["diag", "mix"]] or steps == [["mix", "diag"]]
    _check(ops)


def test_merge_env_hatch(monkeypatch):
    ops = [make_matrix_op([0], gates.H.reshape(-1)) for _ in range(4)]
    monkeypatch.setenv("RUSTQIP_TPU_MERGE_STEPS", "0")
    plan = plan_sweeps(N, ops, True)
    assert _steps_of(plan) == [["mix", "mix", "mix", "mix"]]
    _check(ops)


def test_unfused_toffoli_triples_stay_one_sweep_each():
    # The bench's unfused arm must never merge (disjoint triples, each
    # filling the h<=3 window): one kwindow per gate.
    ccx = np.eye(8, dtype=np.complex128)
    ccx[[6, 7]] = ccx[[7, 6]]
    triples = [(3, 4, 5), (6, 7, 8), (9, 10, 11), (4, 6, 10)]
    ops = [
        make_matrix_op(list(triples[i % 4]), ccx.reshape(-1))
        for i in range(8)
    ]
    plan = plan_sweeps(N, ops, True)
    assert len(plan) == 8
    _check(ops)


def test_merge_fuzz_random_circuit():
    rng = np.random.default_rng(42)
    one_q = [gates.H, gates.X, gates.Y, gates.Z, gates.T]
    ops = []
    for _ in range(40):
        kind = rng.integers(0, 3)
        if kind == 0:
            q = int(rng.integers(0, N))
            g = one_q[int(rng.integers(0, len(one_q)))]
            ops.append(make_matrix_op([q], g.reshape(-1)))
        elif kind == 1:
            qs = rng.choice(N, size=3, replace=False)
            ops.append(
                make_control_op(
                    [int(qs[0]), int(qs[1])],
                    make_matrix_op([int(qs[2])], gates.X.reshape(-1)),
                )
            )
        else:
            qs = rng.choice(N, size=2, replace=False)
            ops.append(
                _phase_op(
                    [int(qs[0]), int(qs[1])],
                    np.exp(1j * rng.normal() * np.arange(4)),
                )
            )
    _check(ops, atol=3e-4)


def test_merge_window_steps_pure_function():
    # Direct unit check: inputs are never mutated.
    h = tuple(complex(v) for v in gates.H.reshape(-1))
    steps = [("cbf", 3, h), ("rbf", 1, h), ("cbf", 3, h)]
    orig = list(steps)
    merged = merge_window_steps(N, steps)
    assert steps == orig
    assert [s[0] for s in merged] == ["rbf"]


def test_block_rows_knobs_affect_plans_and_fingerprint(monkeypatch):
    """RUSTQIP_TPU_BLOCK_ROWS / RUSTQIP_TPU_DIAG_BLOCK_ROWS change window
    block sizes, so they must join the compile-cache env fingerprint."""
    from rustqip_tpu.engine.compile import _env_plan_flags
    from rustqip_tpu.engine.pallas_kernels import window_block_rows

    base = _env_plan_flags()
    monkeypatch.setenv("RUSTQIP_TPU_BLOCK_ROWS", "1024")
    monkeypatch.setenv("RUSTQIP_TPU_DIAG_BLOCK_ROWS", "256")
    assert _env_plan_flags() != base
    mix_steps = [("mix", {(0, 1): 1.0})]
    diag_steps = [("diag", (0.0, ((("q",), 1.0),), (), ()))]
    assert window_block_rows(1, mix_steps) == 1024
    assert window_block_rows(2, diag_steps) == 256
    monkeypatch.setenv("RUSTQIP_TPU_BLOCK_ROWS", "512")
    monkeypatch.setenv("RUSTQIP_TPU_DIAG_BLOCK_ROWS", "0")
    assert window_block_rows(1, mix_steps) == 512
    # adaptive default: a small diag window fits the VMEM model at 512
    assert window_block_rows(2, diag_steps) == 512
    # a diag window too step-heavy for 512-row blocks falls back to the
    # ladder (h=2 -> 128)
    big = diag_steps * 200
    assert window_block_rows(2, big) == 128
    monkeypatch.setenv("RUSTQIP_TPU_BLOCK_ROWS", "777")  # invalid -> default
    assert window_block_rows(1, mix_steps) == 512
