"""Explicit shard_map collective path vs single-device ground truth."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # collective tests: ~4 min of the 10-min suite

from rustqip_tpu.engine.apply import apply_op
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import (
    make_control_op,
    make_matrix_op,
    make_swap_op,
)
from rustqip_tpu.parallel import make_shard_mesh
from rustqip_tpu.parallel.shard_ops import apply_sharded_op, make_sharded_pair

N = 7  # 3 global qubits on an 8-device mesh, 4 local


def require_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def run_both(op, init=5):
    mesh = make_shard_mesh(8)
    re, im = make_sharded_pair(mesh, N, initial_index=init, dtype=np.float64)
    # seed a superposition so phases matter
    h0 = make_matrix_op([3], gates.H.reshape(-1))
    h1 = make_matrix_op([5], gates.T.reshape(-1))
    for seed_op in (h0, h1):
        re, im = apply_sharded_op(mesh, N, seed_op, re, im)
    re, im = apply_sharded_op(mesh, N, op, re, im)
    got = np.asarray(re) + 1j * np.asarray(im)

    state = np.zeros(1 << N, dtype=np.complex128)
    state[init] = 1.0
    for seed_op in (h0, h1):
        state = np.asarray(apply_op(N, seed_op, state))
    expected = np.asarray(apply_op(N, op, state))
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_local_op():
    require_8()
    run_both(make_matrix_op([4, 6], np.kron(gates.H, gates.X).reshape(-1)))


def test_global_single_qubit():
    require_8()
    run_both(make_matrix_op([1], gates.H.reshape(-1)))


def test_global_qubit_zero():
    require_8()
    run_both(make_matrix_op([0], gates.Y.reshape(-1)))


def test_global_local_mixed_dense():
    require_8()
    rng = np.random.default_rng(3)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    u, _ = np.linalg.qr(m)
    run_both(make_matrix_op([2, 5], u.reshape(-1)))


def test_global_local_swap():
    require_8()
    run_both(make_swap_op([1], [6]))


def test_global_control_local_target():
    require_8()
    run_both(make_control_op([0, 2], make_matrix_op([5], gates.X.reshape(-1))))


def test_mixed_control_local_target():
    require_8()
    run_both(make_control_op([1, 4], make_matrix_op([6], gates.Z.reshape(-1))))


def test_two_global_qubit_dense():
    # Entangling gate across two global qubits: qubit-relocation schedule.
    require_8()
    run_both(make_matrix_op([0, 1], gates.CNOT.reshape(-1)))


def test_three_global_qubit_dense():
    require_8()
    rng = np.random.default_rng(9)
    m = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    u, _ = np.linalg.qr(m)
    run_both(make_matrix_op([0, 1, 2], u.reshape(-1)))


def test_global_target_control():
    # Control on a local qubit, target on a global qubit.
    require_8()
    run_both(make_control_op([5], make_matrix_op([1], gates.X.reshape(-1))))


def test_global_control_global_target():
    require_8()
    run_both(make_control_op([0], make_matrix_op([2], gates.Y.reshape(-1))))


def test_both_global_swap():
    require_8()
    run_both(make_swap_op([0], [2]))


def test_sharded_phase_product():
    # Diagonal spanning global + local qubits: zero-communication path.
    require_8()
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    rng = np.random.default_rng(11)
    d1 = np.exp(1j * rng.uniform(-3, 3, 4))
    d2 = np.exp(1j * rng.uniform(-3, 3, 8))
    op = PhaseProductOp(
        (
            ((0, 5), tuple(complex(v) for v in d1)),
            ((2, 1, 6), tuple(complex(v) for v in d2)),
        )
    )
    run_both(op)


def test_whole_sequence_one_program():
    # apply_sharded_ops lowers the entire op list into one shard_map body
    # (locals batch between exchanges) — equivalence on a mixed sequence.
    require_8()
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp
    from rustqip_tpu.parallel.shard_ops import apply_sharded_ops

    rng = np.random.default_rng(21)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    u, _ = np.linalg.qr(m)
    ops = [
        make_matrix_op([4], gates.H.reshape(-1)),
        make_matrix_op([0], gates.H.reshape(-1)),
        make_matrix_op([5], gates.T.reshape(-1)),
        make_matrix_op([6], gates.X.reshape(-1)),
        make_control_op([1], make_matrix_op([3], gates.X.reshape(-1))),
        make_matrix_op([2, 5], u.reshape(-1)),
        PhaseProductOp((((0, 6), (1, 1, 1, 1j)),)),
        make_swap_op([1], [4]),
        make_control_op([5], make_matrix_op([0], gates.Y.reshape(-1))),
    ]
    mesh = make_shard_mesh(8)
    re, im = make_sharded_pair(mesh, N, initial_index=3, dtype=np.float64)
    re, im = apply_sharded_ops(mesh, N, ops, re, im)
    got = np.asarray(re) + 1j * np.asarray(im)

    state = np.zeros(1 << N, dtype=np.complex128)
    state[3] = 1.0
    for op in ops:
        state = np.asarray(apply_op(N, op, state))
    np.testing.assert_allclose(got, state, atol=1e-12)


def test_schedule_batches_locals():
    # Consecutive local ops must merge into one schedule entry.
    from rustqip_tpu.parallel.shard_ops import _lower_schedule

    ops = [
        make_matrix_op([4], gates.H.reshape(-1)),
        make_matrix_op([5], gates.T.reshape(-1)),
        make_matrix_op([0], gates.H.reshape(-1)),  # exchange
        make_matrix_op([6], gates.X.reshape(-1)),
        make_matrix_op([3], gates.Z.reshape(-1)),
    ]
    sched = _lower_schedule(N, 3, ops)
    kinds = [e[0] for e in sched]
    assert kinds == ["local", "exchange", "local"]
    assert len(sched[0][1]) == 2 and len(sched[2][1]) == 2


def test_full_width_dense_multi_exchange():
    # An op spanning EVERY qubit leaves no free local slot to relocate
    # into; the direct multi-global block exchange (2^g - 1 XOR-ppermutes)
    # must handle it.
    require_8()
    rng = np.random.default_rng(1)
    m = rng.normal(size=(1 << N, 1 << N)) + 1j * rng.normal(
        size=(1 << N, 1 << N)
    )
    u, _ = np.linalg.qr(m)
    run_both(make_matrix_op(list(range(N)), u.reshape(-1)))


def test_coalesced_swap_lowers_pair_by_pair():
    # Review finding (r2): a coalesced multi-pair SwapOp touching global
    # qubits must lower pair-by-pair, never densify 2^k x 2^k.
    from rustqip_tpu.parallel.shard_ops import _lower_schedule

    op = make_swap_op([0, 1, 2], [6, 5, 4])  # QFT-7 reversal shape
    sched = _lower_schedule(N, 3, [op])
    kinds = [e[0] for e in sched]
    assert "exchange_multi" not in kinds
    assert all(k in ("exchange", "local") for k in kinds)
    run_both(op)


def test_wide_sparse_all_globals_no_recursion():
    # Review finding (r2): a wide SparseOp covering every qubit previously
    # recursed forever in _lower_op; it must either lower or raise.
    require_8()
    rng = np.random.default_rng(3)
    perm = rng.permutation(1 << N)
    from rustqip_tpu.ops.matrix_ops import make_sparse_matrix_op

    rows = [[(int(perm[i]), 1.0)] for i in range(1 << N)]
    op = make_sparse_matrix_op(list(range(N)), rows)
    run_both(op)


def test_chunked_exchange_equivalence():
    # Double-buffered ring exchange: chunks=4 splits each single-global
    # ppermute into independent per-chunk pipelines along the top local
    # qubits; must be bit-exact vs the whole-shard exchange and the
    # single-device oracle.
    require_8()
    from rustqip_tpu.parallel.shard_ops import apply_sharded_ops

    rng = np.random.default_rng(9)
    m = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    u, _ = np.linalg.qr(m)
    ops = [
        make_matrix_op([4], gates.H.reshape(-1)),
        make_matrix_op([1], u.reshape(-1)),      # global: exchange
        make_matrix_op([0], gates.H.reshape(-1)),  # global: exchange
        make_matrix_op([6], gates.T.reshape(-1)),
        make_matrix_op([2], gates.Y.reshape(-1)),  # global: exchange
    ]
    mesh = make_shard_mesh(8)
    re, im = make_sharded_pair(mesh, N, initial_index=5, dtype=np.float64)
    r1, i1 = apply_sharded_ops(mesh, N, ops, re, im, chunks=1)
    re, im = make_sharded_pair(mesh, N, initial_index=5, dtype=np.float64)
    r4, i4 = apply_sharded_ops(mesh, N, ops, re, im, chunks=4)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r4))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i4))

    state = np.zeros(1 << N, dtype=np.complex128)
    state[5] = 1.0
    for op in ops:
        state = np.asarray(apply_op(N, op, state))
    got = np.asarray(r4) + 1j * np.asarray(i4)
    np.testing.assert_allclose(got, state, atol=1e-12)


def test_chunked_exchange_falls_back_on_support_overlap():
    # An exchange whose local support touches the chunking qubits must
    # fall back to the whole-shard path (still correct).
    require_8()
    from rustqip_tpu.parallel.shard_ops import apply_sharded_ops

    # global qubit 1 + local qubit 3 (= top local qubit at N=7, g=3)
    rng = np.random.default_rng(11)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    u, _ = np.linalg.qr(m)
    op = make_matrix_op([1, 3], u.reshape(-1))
    mesh = make_shard_mesh(8)
    re, im = make_sharded_pair(mesh, N, initial_index=2, dtype=np.float64)
    r4, i4 = apply_sharded_ops(mesh, N, [op], re, im, chunks=4)
    state = np.zeros(1 << N, dtype=np.complex128)
    state[2] = 1.0
    state = np.asarray(apply_op(N, op, state))
    got = np.asarray(r4) + 1j * np.asarray(i4)
    np.testing.assert_allclose(got, state, atol=1e-12)


def test_op_index_dtype_width_guard():
    """Op-local index math in the any-width traced paths (gex/fndiag)
    picks int32 up to 31 qubits, int64 beyond (x64 on, as in tests); if
    x64 is off a >31-qubit op raises instead of silently wrapping its
    high-bit shifts (which would route amplitudes to wrong shards)."""
    import jax.numpy as jnp

    from rustqip_tpu.errors import CircuitError
    from rustqip_tpu.parallel.shard_ops import _op_index_dtype

    assert _op_index_dtype(31) == jnp.int32
    assert jax.config.jax_enable_x64  # conftest pins x64 on
    assert _op_index_dtype(33) == jnp.int64
    jax.config.update("jax_enable_x64", False)
    try:
        assert _op_index_dtype(31) == jnp.int32
        with pytest.raises(CircuitError, match="33 qubits"):
            _op_index_dtype(33)
    finally:
        jax.config.update("jax_enable_x64", True)
