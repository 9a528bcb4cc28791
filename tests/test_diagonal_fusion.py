"""Diagonal fusion: PhaseProductOp correctness + pass-count wins."""

import numpy as np
import pytest

from rustqip_tpu.engine.apply import apply_op, apply_ops
from rustqip_tpu.engine.fusion import fuse_ops
from rustqip_tpu.engine.real_apply import apply_op_ri
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import (
    PhaseProductOp,
    diagonal_of,
    make_control_op,
    make_matrix_op,
    make_op_matrix,
    op_to_dense,
)
from rustqip_tpu.prelude import LocalBuilder
from rustqip_tpu.algos import qfft

RNG = np.random.default_rng(33)


def random_state(n):
    v = RNG.normal(size=1 << n) + 1j * RNG.normal(size=1 << n)
    return (v / np.linalg.norm(v)).astype(np.complex128)


def test_diagonal_detection():
    assert diagonal_of(make_matrix_op([0], gates.Z.reshape(-1))) is not None
    assert diagonal_of(make_matrix_op([0], gates.T.reshape(-1))) is not None
    assert diagonal_of(make_matrix_op([0], gates.H.reshape(-1))) is None
    cz = make_control_op([0], make_matrix_op([2], gates.Z.reshape(-1)))
    idx, d = diagonal_of(cz)
    assert idx == (0, 2)
    np.testing.assert_allclose(d, [1, 1, 1, -1])
    cx = make_control_op([0], make_matrix_op([2], gates.X.reshape(-1)))
    assert diagonal_of(cx) is None


def test_phase_product_matches_sequential():
    n = 6
    ops = [
        make_matrix_op([0], gates.T.reshape(-1)),
        make_matrix_op([3], gates.rz(0.31).reshape(-1)),
        make_control_op([1], make_matrix_op([5], gates.S.reshape(-1))),
        make_control_op([4, 2], make_matrix_op([0], gates.Z.reshape(-1))),
    ]
    terms = []
    for op in ops:
        idx, d = diagonal_of(op)
        terms.append((tuple(idx), tuple(complex(v) for v in d)))
    pp = PhaseProductOp(tuple(terms))

    psi = random_state(n)
    expected = psi
    for op in ops:
        expected = np.asarray(apply_op(n, op, expected))

    got = np.asarray(apply_op(n, pp, psi))
    np.testing.assert_allclose(got, expected, atol=1e-12)

    # real-pair path
    re, im = apply_op_ri(n, pp, np.real(psi), np.imag(psi))
    got_ri = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got_ri, expected, atol=1e-12)

    # debug matrix agrees too
    full = make_op_matrix(n, pp)
    np.testing.assert_allclose(full @ psi, expected, atol=1e-12)


def test_fusion_coalesces_diagonal_runs():
    n = 8
    ops = []
    # A long run of distant phases (un-dense-fusable: supports span 8 qubits)
    for q in range(n):
        ops.append(make_matrix_op([q], gates.T.reshape(-1)))
    for q in range(n - 1):
        ops.append(
            make_control_op([q], make_matrix_op([q + 1], gates.Z.reshape(-1)))
        )
    fused = fuse_ops(ops, max_qubits=4)
    assert len(fused) == 1
    assert isinstance(fused[0], PhaseProductOp)

    psi = random_state(n)
    expected = psi
    for op in ops:
        expected = np.asarray(apply_op(n, op, expected))
    got = np.asarray(apply_ops(n, fused, psi))
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_qfft_pass_count_drops():
    # QFT's controlled-phase ladders are diagonal: pass count should scale
    # ~linearly in n, not quadratically.
    b = LocalBuilder()
    r = b.register(8)
    qfft(b, r)
    cc = b.compile()
    # 8 H's + <=8 fused diagonal ladders + 4 swaps (+ slack)
    assert cc.num_passes <= 26, cc.num_passes

    # and it is still the DFT
    from rustqip_tpu.prelude import make_circuit_matrix

    b2 = LocalBuilder()
    r2 = b2.register(4)
    r2 = qfft(b2, r2)
    full = make_circuit_matrix(b2, r2)
    N = 16
    w = np.exp(2j * np.pi / N)
    dft = np.array([[w ** (i * j) for j in range(N)] for i in range(N)]) / 4
    np.testing.assert_allclose(full, dft, atol=1e-10)
