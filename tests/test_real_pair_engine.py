"""Real-pair (re, im) engine path vs the complex path.

The TPU execution domain (compile.py dispatches it when backend == tpu) has
no coverage on the CPU CI backend unless forced — these tests force the
dispatch (the Pallas kernel falls back to plain matmuls off-TPU, so the
surrounding plumbing is what's exercised; kernel numerics are covered by
the same fallback formula).
"""

import jax
import numpy as np
import pytest

import rustqip_tpu.engine.compile as compile_mod
from rustqip_tpu.engine.apply import apply_op
from rustqip_tpu.engine.real_apply import apply_op_ri, apply_ops_ri
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import (
    make_control_op,
    make_matrix_op,
    make_swap_op,
)
from rustqip_tpu.prelude import LocalBuilder

RNG = np.random.default_rng(21)


def random_state(n):
    v = RNG.normal(size=1 << n) + 1j * RNG.normal(size=1 << n)
    return (v / np.linalg.norm(v)).astype(np.complex128)


def random_unitary(dim):
    m = RNG.normal(size=(dim, dim)) + 1j * RNG.normal(size=(dim, dim))
    q, _ = np.linalg.qr(m)
    return q


OPS = [
    make_matrix_op([0], gates.H.reshape(-1)),
    make_matrix_op([7], gates.T.reshape(-1)),          # low qubit at n=8
    make_matrix_op([2, 6], random_unitary(4).reshape(-1)),
    make_swap_op([0, 1], [6, 7]),
    make_control_op([1], make_matrix_op([7], gates.X.reshape(-1))),
    make_control_op([0, 4], make_matrix_op([5, 6], random_unitary(4).reshape(-1))),
]


@pytest.mark.parametrize("op_i", range(len(OPS)))
def test_ri_matches_complex(op_i):
    n = 8
    op = OPS[op_i]
    psi = random_state(n)
    expected = np.asarray(apply_op(n, op, psi))
    re, im = apply_op_ri(
        n, op, np.real(psi).astype(np.float64), np.imag(psi).astype(np.float64)
    )
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_ri_sequence():
    n = 8
    psi = random_state(n)
    expected = psi
    for op in OPS:
        expected = np.asarray(apply_op(n, op, expected))
    re, im = apply_ops_ri(n, OPS, np.real(psi), np.imag(psi))
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_compiled_circuit_ri_path(monkeypatch):
    """Force the TPU dispatch on CPU: full CSWAP example through the
    real-pair segments must match the complex path exactly."""

    def build():
        b = LocalBuilder()
        q = b.qubit()
        ra = b.register(3)
        rb = b.register(3)
        q = b.h(q)
        cb = b.condition_with(q)
        ra, rb = cb.swap(ra, rb)
        q = cb.dissolve()
        q = b.h(q)
        q, m = b.measure(q)
        return b, ra, rb, m

    b1, ra1, rb1, m1 = build()
    s1, meas1 = b1.calculate_state_with_init([(ra1, 0b000), (rb1, 0b001)], seed=9)

    monkeypatch.setattr(
        compile_mod.CompiledCircuit, "_use_real_pairs", staticmethod(lambda: True)
    )
    compile_mod._CACHE.clear()
    b2, ra2, rb2, m2 = build()
    s2, meas2 = b2.calculate_state_with_init([(ra2, 0b000), (rb2, 0b001)], seed=9)
    compile_mod._CACHE.clear()

    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-10)
    assert meas1.get_measurement(m1) == meas2.get_measurement(m2)


def test_ri_path_with_repeat_and_stochastic(monkeypatch):
    from rustqip_tpu.algos import grover_search

    b1 = LocalBuilder()
    _, h1 = grover_search(b1, 5, 0b10011)
    _, meas1 = b1.calculate_state(seed=4)
    p1 = meas1.get_stochastic_measurement(h1)

    monkeypatch.setattr(
        compile_mod.CompiledCircuit, "_use_real_pairs", staticmethod(lambda: True)
    )
    compile_mod._CACHE.clear()
    b2 = LocalBuilder()
    _, h2 = grover_search(b2, 5, 0b10011)
    _, meas2 = b2.calculate_state(seed=4)
    p2 = meas2.get_stochastic_measurement(h2)
    compile_mod._CACHE.clear()

    np.testing.assert_allclose(p1, p2, atol=1e-10)
