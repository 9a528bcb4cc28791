"""Native C++ engine vs the JAX engine: independent cross-validation."""

import numpy as np
import pytest

from rustqip_tpu.engine.apply import apply_op
from rustqip_tpu.engine.cpu_native import (
    load_library,
    native_apply_op,
    native_measure_prob,
    native_measure_state,
    native_prob_magnitude,
)
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.measurement_ops import measure_prob, measure_state
from rustqip_tpu.ops.matrix_ops import (
    make_control_op,
    make_matrix_op,
    make_swap_op,
)

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native toolchain unavailable"
)

RNG = np.random.default_rng(11)


def random_state(n, dtype=np.complex128):
    v = RNG.normal(size=1 << n) + 1j * RNG.normal(size=1 << n)
    return (v / np.linalg.norm(v)).astype(dtype)


def random_unitary(dim):
    m = RNG.normal(size=(dim, dim)) + 1j * RNG.normal(size=(dim, dim))
    q, _ = np.linalg.qr(m)
    return q


OPS = [
    make_matrix_op([0], gates.H.reshape(-1)),
    make_matrix_op([3], gates.T.reshape(-1)),
    make_matrix_op([1, 4], random_unitary(4).reshape(-1)),
    make_swap_op([0, 1], [4, 5]),
    make_control_op([2], make_matrix_op([5], gates.X.reshape(-1))),
    make_control_op([0, 5], make_matrix_op([2, 3], random_unitary(4).reshape(-1))),
]


@pytest.mark.parametrize("op_i", range(len(OPS)))
@pytest.mark.parametrize("dtype", [np.complex128, np.complex64])
def test_native_matches_jax_apply(op_i, dtype):
    n = 6
    op = OPS[op_i]
    psi = random_state(n, dtype)
    native = native_apply_op(n, op, psi)
    jaxed = np.asarray(apply_op(n, op, psi))
    atol = 1e-10 if dtype == np.complex128 else 1e-5
    np.testing.assert_allclose(native, jaxed, atol=atol)


def test_native_measurement_matches():
    n = 5
    psi = random_state(n)
    for indices in ([0], [2, 4], [4, 0, 1]):
        for m in range(1 << len(indices)):
            a = native_measure_prob(n, m, indices, psi)
            b = float(measure_prob(n, m, indices, psi))
            assert abs(a - b) < 1e-10, (indices, m)
    assert abs(native_prob_magnitude(n, psi) - 1.0) < 1e-10


def test_native_collapse_matches():
    n = 4
    psi = random_state(n)
    indices = [1, 3]
    m = 0b10
    p = native_measure_prob(n, m, indices, psi)
    native = native_measure_state(n, m, p, indices, psi)
    jaxed = np.asarray(measure_state(n, indices, (m, p), psi))
    np.testing.assert_allclose(native, jaxed, atol=1e-10)
