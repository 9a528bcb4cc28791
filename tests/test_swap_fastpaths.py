"""Structured swap fast paths vs an index-permutation oracle.

Row-row pairs lower to rank-6 axis transposes (or, for a contiguous
field reversal — QFT's tail, reference qip/src/qfft.rs:29-37 — ONE
transpose with the field's bit-axes in reversed order), col-col pairs
to one lane relabel, cross pairs to the staged block transpose. All
must equal the plain bit-swap permutation of the state index.
"""

import numpy as np
import pytest

from rustqip_tpu.engine.apply import (
    _row_field_reversal,
    _swap_schedule,
    apply_op,
)
from rustqip_tpu.engine.real_apply import apply_op_ri
from rustqip_tpu.ops.matrix_ops import make_swap_op

RNG = np.random.default_rng(7)


def random_state(n):
    v = RNG.normal(size=1 << n) + 1j * RNG.normal(size=1 << n)
    return (v / np.linalg.norm(v)).astype(np.complex128)


def perm_oracle(n, pairs, psi):
    idx = np.arange(1 << n)
    src = idx.copy()
    for a, b in pairs:
        pa, pb = n - 1 - a, n - 1 - b
        ba = (src >> pa) & 1
        bb = (src >> pb) & 1
        src = (src & ~((1 << pa) | (1 << pb))) | (bb << pa) | (ba << pb)
    return psi[src]


# n=12 -> 5 row qubits (0..4), 7 col qubits (5..11)
CASES = [
    # (pairs, expected schedule shape comment)
    ([(0, 4), (1, 3)], "row field reversal, odd span (mid bit 2 fixed)"),
    ([(1, 4), (2, 3)], "row field reversal, even span"),
    ([(0, 2), (1, 3)], "row pairs, not a field reversal"),
    ([(0, 3)], "single row pair"),
    ([(5, 11), (7, 9)], "col pairs -> one lane relabel"),
    ([(2, 8)], "single cross pair -> dense fallback"),
    ([(0, 11), (1, 10), (2, 9), (3, 8), (4, 7), (5, 6)], "full reversal"),
    ([(0, 6), (1, 5), (2, 4)], "cross + row pair mix"),
]


@pytest.mark.parametrize("case_i", range(len(CASES)))
def test_swap_matches_permutation(case_i):
    n = 12
    pairs, _ = CASES[case_i]
    op = make_swap_op([a for a, _ in pairs], [b for _, b in pairs])
    psi = random_state(n)
    expected = perm_oracle(n, pairs, psi)
    got = np.asarray(apply_op(n, op, psi))
    np.testing.assert_allclose(got, expected, atol=1e-12)
    re, im = apply_op_ri(n, op, np.real(psi), np.imag(psi))
    got_ri = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got_ri, expected, atol=1e-12)


def test_field_reversal_detection():
    # even field
    assert _row_field_reversal(5, [(1, 4), (2, 3)]) == (2, 4)
    # odd field: middle bit fixed by the reversal
    assert _row_field_reversal(5, [(0, 4), (1, 3)]) == (1, 5)
    # not a reversal
    assert _row_field_reversal(5, [(0, 2), (1, 3)]) is None
    assert _row_field_reversal(5, [(0, 3)]) is None
    # span cap: falls back to chained pair transposes
    big = [(t, 17 - t) for t in range(9)]
    assert _row_field_reversal(18, big) is None


def test_swap_schedule_split():
    n = 12
    op = make_swap_op([0, 1, 2, 3, 4, 5], [11, 10, 9, 8, 7, 6])
    cross, rowp, colp, mixed = _swap_schedule(n, op)
    # 5 row qubits: cross pairs are (0,11)..(4,7); (5,6) is col-col
    assert sorted(cross) == [(0, 11), (1, 10), (2, 9), (3, 8), (4, 7)]
    assert rowp == []
    assert sorted(colp) == [(5, 6)]
    assert mixed == []


def test_qft_shape_at_n13():
    # odd n: 6 row qubits, field reversal over rows has odd leftovers
    n = 13
    pairs = [(a, n - 1 - a) for a in range(n // 2)]
    op = make_swap_op([a for a, _ in pairs], [b for _, b in pairs])
    psi = random_state(n)
    expected = perm_oracle(n, pairs, psi)
    got = np.asarray(apply_op(n, op, psi))
    np.testing.assert_allclose(got, expected, atol=1e-12)
