"""Lazy qubit relabeling (engine/relabel.py): SwapOps defer into an
index remap; compiled circuits must be numerically identical to the
eager-swap execution, with fewer (or equal) physical swap passes.

Reference parity note: the reference executes swaps eagerly
(qip-iterators/src/iterators/ops.rs:17); deferral is a TPU-side
optimization with identical semantics (a swap's only observable effect
is a relabeling)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rustqip_tpu.builder.builder import LocalBuilder
from rustqip_tpu.engine.relabel import defer_swaps_ops, materialize
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import SwapOp, make_matrix_op, make_swap_op


def test_materialize_random_perms():
    rng = np.random.default_rng(0)
    for trial in range(100):
        n = int(rng.integers(2, 14))
        pos = list(map(int, rng.permutation(n)))
        ops = materialize(pos)
        assert len(ops) <= 2
        content = [None] * n
        for logical, p in enumerate(pos):
            content[p] = logical
        for op in ops:
            h = op.half
            for a, b in zip(op.indices[:h], op.indices[h:]):
                content[a], content[b] = content[b], content[a]
        assert content == list(range(n)), (trial, pos)


def test_involution_residual_single_op():
    assert len(materialize([1, 0, 3, 2, 4])) == 1
    assert materialize(list(range(6))) == []


def test_deferred_ops_match_eager():
    """Op-level: deferral + materialization == eager sequence."""
    from rustqip_tpu.engine.real_apply import apply_op_ri, apply_ops_ri

    n = 9
    rng = np.random.default_rng(3)

    def u(k, seed):
        r = np.random.default_rng(seed)
        m = r.normal(size=(1 << k, 1 << k)) + 1j * r.normal(
            size=(1 << k, 1 << k)
        )
        q, _ = np.linalg.qr(m)
        return q

    ops = [
        make_matrix_op([0], gates.H.reshape(-1)),
        make_swap_op([0, 2], [5, 7]),
        make_matrix_op([0, 5], u(2, 1).reshape(-1)),
        make_swap_op([1], [0]),
        make_matrix_op([1], gates.T.reshape(-1)),
        make_swap_op([3], [8]),
        make_matrix_op([3, 4, 8], u(3, 2).reshape(-1)),
    ]
    pos = list(range(n))
    deferred = defer_swaps_ops(n, ops, pos)
    deferred += materialize(pos)
    assert not any(isinstance(o, SwapOp) for o in deferred[:-2])

    state = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    state /= np.linalg.norm(state)
    er, ei = jnp.asarray(state.real), jnp.asarray(state.imag)
    for op in ops:
        er, ei = apply_op_ri(n, op, er, ei)
    gr, gi = apply_ops_ri(
        n, deferred, jnp.asarray(state.real), jnp.asarray(state.imag)
    )
    np.testing.assert_allclose(
        np.asarray(gr) + 1j * np.asarray(gi),
        np.asarray(er) + 1j * np.asarray(ei),
        atol=1e-10,
    )


def _qft_identity_builder():
    from rustqip_tpu.algos.qfft import qfft, qfft_inverse

    b = LocalBuilder()
    r = b.register(6)
    r = b.h(r)
    r = qfft(b, r)
    r = qfft_inverse(b, r)
    return b


def test_qft_inverse_qft_swaps_cancel():
    """QFT + inverse-QFT: the two bit reversals cancel through the
    relabeling — the compiled segments contain ZERO SwapOps."""
    b = _qft_identity_builder()
    cc = b.compile()
    for seg in cc.segments:
        if isinstance(seg, list):
            assert not any(isinstance(o, SwapOp) for o in seg)
    state, _ = b.calculate_state()
    amp = 1.0 / np.sqrt(1 << 6)
    np.testing.assert_allclose(np.asarray(state), amp, atol=1e-8)


def test_qft_alone_single_materialized_swap():
    """A lone QFT still materializes its (involution) reversal as ONE
    SwapOp — no regression vs the eager path."""
    from rustqip_tpu.algos.qfft import qfft

    b = LocalBuilder()
    r = b.register(6)
    qfft(b, r)
    cc = b.compile()
    swaps = [
        o
        for seg in cc.segments
        if isinstance(seg, list)
        for o in seg
        if isinstance(o, SwapOp)
    ]
    assert len(swaps) == 1

    # numerics: QFT of |0..0> is uniform
    state, _ = b.calculate_state()
    amp = 1.0 / np.sqrt(1 << 6)
    np.testing.assert_allclose(np.asarray(state), amp, atol=1e-8)


def test_deferral_matches_eager_compiled(monkeypatch):
    """Full compiled circuits agree with RUSTQIP_TPU_DEFER_SWAPS=0."""
    from rustqip_tpu.algos.qfft import qfft

    def build():
        b = LocalBuilder()
        ra = b.register(3)
        rb = b.register(3)
        ra = b.h(ra)
        ra, rb = b.swap_registers(ra, rb)
        rb = b.apply_matrix(
            rb, np.kron(gates.T, np.kron(gates.H, gates.S)).reshape(-1)
        )
        ra, rb = b.swap_registers(ra, rb)
        r = b.merge_registers([ra, rb])
        r = qfft(b, r)
        return b

    from rustqip_tpu.ops.matrix_ops import SwapOp

    def swap_count(b):
        cc = b.compile()
        return sum(
            sum(1 for op in seg if isinstance(op, SwapOp))
            for seg in cc.segments
            if isinstance(seg, list)
        )

    b1 = build()
    s1, _ = b1.calculate_state()
    n_deferred = swap_count(b1)
    monkeypatch.setenv("RUSTQIP_TPU_DEFER_SWAPS", "0")
    b2 = build()
    s2, _ = b2.calculate_state()
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-9)
    # The kill switch must actually reach the plan: compile_pipeline's
    # cache fingerprint includes the env flag (a cache hit here would
    # silently return the deferred plan and make this test vacuous).
    n_eager = swap_count(b2)
    assert n_eager > n_deferred, (n_eager, n_deferred)


def test_measurement_after_swap_remaps():
    """Measuring a swapped qubit reads the right amplitude through the
    deferred relabeling."""
    b = LocalBuilder()
    qa = b.qubit()
    qb = b.qubit()
    qa = b.x(qa)  # |10>
    qa, qb = b.swap_registers(qa, qb)  # logical |01>
    qb, m = b.measure(qb)
    state, measured = b.calculate_state()
    out, prob = measured.get_measurement(m)
    assert int(out) == 1 and float(prob) == pytest.approx(1.0)


def test_repeat_block_with_internal_swap():
    """Swaps inside a repeat body materialize body-locally (the body
    must be permutation-neutral across iterations)."""
    b = LocalBuilder()
    qa = b.qubit()
    qb = b.qubit()
    qa = b.h(qa)

    def body(bb, ra, rb):
        ra, rb = bb.swap_registers(ra, rb)
        ra = bb.x(ra)
        ra, rb = bb.swap_registers(ra, rb)
        return ra, rb

    qa, qb = b.repeat(2, body, qa, qb)
    # two rounds of (swap, X on a-side-now-b, swap) = X twice on qb
    state, _ = b.calculate_state()
    # qa in |+>, qb back to |0>
    expect = np.zeros(4, dtype=complex)
    expect[0] = expect[2] = 1 / np.sqrt(2)
    np.testing.assert_allclose(np.asarray(state), expect, atol=1e-9)
