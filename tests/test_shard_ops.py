"""Explicit shard_map collective path vs single-device ground truth."""

import jax
import numpy as np
import pytest

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


def test_unsupported_falls_back_loudly():
    require_8()
    mesh = make_shard_mesh(8)
    re, im = make_sharded_pair(mesh, N)
    op = make_matrix_op([0, 1], gates.CNOT.reshape(-1))  # two global qubits
    with pytest.raises(NotImplementedError):
        apply_sharded_op(mesh, N, op, re, im)
