"""Round-2 correctness fixes: MeasuredCondition.prob override, forcing with
an explicit initial state, forced-ordinal validation, split-index
validation, non-unit-modulus diagonal fusion, structural compile
fingerprints, and int32-safe initial indices."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rustqip_tpu.builder.builder import LocalBuilder
from rustqip_tpu.engine.apply import apply_op
from rustqip_tpu.engine.fusion import fuse_ops
from rustqip_tpu.engine.real_apply import apply_op_ri
from rustqip_tpu.errors import CircuitError
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.matrix_ops import (
    PhaseProductOp,
    make_matrix_op,
    op_fingerprint,
    op_to_dense,
)
from rustqip_tpu.ops.measurement_ops import MeasuredCondition


# ---------------------------------------------------------------------------
# MeasuredCondition.prob override (ref measurement_ops.rs:181-218)
# ---------------------------------------------------------------------------


def test_forced_prob_override_scales_collapse():
    # H; measure; force outcome 1 with prob=0.25: the collapse rescale must
    # use the SUPPLIED probability (1/sqrt(0.25) = 2), not the computed 0.5.
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    q, m = b.measure(q)
    state, measured = b.calculate_state(
        seed=0, conditions={m: MeasuredCondition(measured=1, prob=0.25)}
    )
    out, p = measured.get_measurement(m)
    assert out == 1
    assert abs(p - 0.25) < 1e-10
    # amplitude 1/sqrt(2) rescaled by 1/sqrt(0.25) = sqrt(2)
    np.testing.assert_allclose(
        np.abs(state), [0.0, np.sqrt(2.0)], atol=1e-10
    )


def test_forced_tuple_form_and_plain_int_agree():
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    q, m = b.measure(q)
    s1, _ = b.calculate_state(seed=0, conditions={m: 1})
    s2, _ = b.calculate_state(seed=0, conditions={m: (1, None)})
    np.testing.assert_allclose(s1, s2, atol=1e-12)


def test_forced_with_explicit_initial_state():
    # Complete the forcing matrix: forced outcomes + initial_state at the
    # compiled-circuit level (previously NotImplementedError).
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    q, m = b.measure(q)
    cc = b.compile()
    init = np.array([0.6, 0.8], dtype=np.complex128)
    re, im, results = cc.run(
        initial_state=init,
        key=jax.random.PRNGKey(0),
        forced={0: (0, None)},
    )
    outcome, prob = results[0]
    assert int(outcome) == 0
    # H|init> = [(0.6+0.8)/sqrt2, (0.6-0.8)/sqrt2]; P(0) = 0.98
    assert abs(float(prob) - 0.98) < 1e-10
    state = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(np.abs(state), [1.0, 0.0], atol=1e-7)


def test_forcing_stochastic_measurement_raises():
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    q, s = b.measure_stochastic(q)
    with pytest.raises(CircuitError):
        b.calculate_state(seed=0, conditions={s: 1})
    # By raw ordinal too.
    with pytest.raises(CircuitError):
        b.calculate_state(seed=0, conditions={0: 1})
    # Out-of-range ordinal.
    with pytest.raises(CircuitError):
        b.calculate_state(seed=0, conditions={5: 1})


# ---------------------------------------------------------------------------
# Builder split validation
# ---------------------------------------------------------------------------


def test_split_register_relative_validates():
    b = LocalBuilder()
    r = b.register(3)
    with pytest.raises(CircuitError):
        b.split_register_relative(r, [0, 3])  # out of range
    r = b.register(3)
    with pytest.raises(CircuitError):
        b.split_register_relative(r, [1, 1])  # duplicate


def test_initial_index_out_of_range_raises():
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    cc = b.compile()
    with pytest.raises(CircuitError):
        cc.run(initial_index=2)
    with pytest.raises(CircuitError):
        cc.run(initial_index=-1)


def test_initial_index_row_col_split():
    # n=9 -> C=128, R=4: indices crossing the row boundary must land right.
    b = LocalBuilder()
    r = b.register(9)
    b.measure_stochastic(r)
    cc = b.compile()
    for idx in (0, 1, 127, 128, 300, 511):
        re, im, _ = cc.run(initial_index=idx, key=jax.random.PRNGKey(0))
        state = np.asarray(re) + 1j * np.asarray(im)
        assert np.argmax(np.abs(state)) == idx


# ---------------------------------------------------------------------------
# Non-unit-modulus diagonals (advisor repro: diag(1, 0.5))
# ---------------------------------------------------------------------------


def _apply_via_dense(n, op, state):
    from rustqip_tpu.ops.matrix_ops import make_op_matrix

    return make_op_matrix(n, op) @ state


@pytest.mark.parametrize("n", [3, 8])
def test_phase_product_nonunit_magnitude_exact(n):
    # Two adjacent non-unit-modulus diagonals fused into a PhaseProductOp
    # must apply the true complex values, not just the phase, on the tiled
    # (R, C) path (apply_op_ri is backend-independent code).
    rng = np.random.default_rng(5)
    d1 = (rng.uniform(0.3, 1.7, 2) * np.exp(1j * rng.uniform(-3, 3, 2)))
    d2 = (rng.uniform(0.3, 1.7, 4) * np.exp(1j * rng.uniform(-3, 3, 4)))
    op = PhaseProductOp(
        (
            ((1,), tuple(complex(v) for v in d1)),
            ((0, n - 1), tuple(complex(v) for v in d2)),
        )
    )
    state = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    re, im = apply_op_ri(
        n, op, jnp.asarray(state.real), jnp.asarray(state.imag)
    )
    got = np.asarray(re) + 1j * np.asarray(im)
    want = _apply_via_dense(n, op, state)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_advisor_repro_diag_half():
    # diag(1, 0.5) twice: fused run must match unfused exactly.
    n = 3
    d = np.diag([1.0, 0.5]).astype(np.complex128)
    ops = [
        make_matrix_op([0], d.reshape(-1)),
        make_matrix_op([1], d.reshape(-1)),
    ]
    fused = fuse_ops(ops)
    rng = np.random.default_rng(0)
    state = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    got = jnp.asarray(state)
    for op in fused:
        got = apply_op(n, op, got)
    want = np.asarray(state)
    for op in ops:
        want = _apply_via_dense(n, op, want)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)
    # And on the real-pair path.
    re, im = jnp.asarray(state.real), jnp.asarray(state.imag)
    for op in fused:
        re, im = apply_op_ri(n, op, re, im)
    np.testing.assert_allclose(
        np.asarray(re) + 1j * np.asarray(im), want, atol=1e-10
    )


def test_zero_diagonal_never_coalesced():
    # diag(1, 0) (a projector — reference applies non-unitary ops
    # faithfully) cannot enter the log-monomial decomposition; it must stay
    # a plain op and still apply exactly.
    n = 2
    proj = np.diag([1.0, 0.0]).astype(np.complex128)
    ops = [
        make_matrix_op([0], proj.reshape(-1)),
        make_matrix_op([1], gates.T.reshape(-1)),
    ]
    fused = fuse_ops(ops)
    for f in fused:
        if isinstance(f, PhaseProductOp):
            for _, diag in f.terms:
                assert all(v != 0 for v in diag)
    rng = np.random.default_rng(1)
    state = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    got = jnp.asarray(state)
    for op in fused:
        got = apply_op(n, op, got)
    want = np.asarray(state)
    for op in ops:
        want = _apply_via_dense(n, op, want)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


# ---------------------------------------------------------------------------
# Structural fingerprints
# ---------------------------------------------------------------------------


def test_op_fingerprint_distinguishes_data():
    a = make_matrix_op([0], gates.X.reshape(-1))
    b = make_matrix_op([0], gates.Y.reshape(-1))
    assert op_fingerprint(a) != op_fingerprint(b)
    assert op_fingerprint(a) == op_fingerprint(
        make_matrix_op([0], gates.X.reshape(-1))
    )
    # fingerprint contains exact bytes, not a 64-bit hash
    assert any(
        isinstance(part, bytes) for part in op_fingerprint(a)
    )


def test_phase_product_dense_roundtrip():
    # op_to_dense of a PhaseProductOp agrees with applying it.
    op = PhaseProductOp((((0,), (1 + 0j, 1j)), ((1,), (1 + 0j, -1j))))
    dense = op_to_dense(op)
    assert dense.shape == (4, 4)
    state = np.arange(1, 5).astype(np.complex128)
    got = np.asarray(apply_op(2, op, jnp.asarray(state)))
    np.testing.assert_allclose(got, dense @ state, atol=1e-12)
