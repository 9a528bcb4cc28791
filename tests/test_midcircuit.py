"""Mid-circuit measurement semantics: gates after a collapse, conditional
statistics, and sample_counts post-processing."""

import numpy as np

from rustqip_tpu.prelude import LocalBuilder


def test_gates_after_midcircuit_measurement():
    # H; measure; H again. Whatever outcome was sampled, the post-collapse
    # state is a basis state, so the final distribution is uniform.
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    q, m = b.measure(q)
    q = b.h(q)
    q, s = b.measure_stochastic(q)
    for seed in range(4):
        _, measured = b.calculate_state(seed=seed)
        out, p = measured.get_measurement(m)
        assert abs(p - 0.5) < 1e-10
        probs = measured.get_stochastic_measurement(s)
        np.testing.assert_allclose(probs, [0.5, 0.5], atol=1e-10)


def test_midcircuit_collapse_propagates():
    # Bell pair; measure q0 mid-circuit; q1 must then be deterministic and
    # equal to the q0 outcome.
    outcomes = set()
    for seed in range(8):
        b = LocalBuilder()
        q0 = b.qubit()
        q1 = b.qubit()
        q0 = b.h(q0)
        q0, q1 = b.cnot(q0, q1)
        q0, m0 = b.measure(q0)
        q1, s1 = b.measure_stochastic(q1)
        _, measured = b.calculate_state(seed=seed)
        out0, p0 = measured.get_measurement(m0)
        probs1 = measured.get_stochastic_measurement(s1)
        assert abs(p0 - 0.5) < 1e-10
        expected = np.zeros(2)
        expected[out0] = 1.0
        np.testing.assert_allclose(probs1, expected, atol=1e-10)
        outcomes.add(out0)
    assert outcomes == {0, 1}  # both branches occur across seeds


def test_two_sequential_measurements_consistent():
    # Measuring the same (collapsed) qubit twice gives the same outcome with
    # probability 1 the second time.
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    q, m1 = b.measure(q)
    q, m2 = b.measure(q)
    for seed in range(5):
        _, measured = b.calculate_state(seed=seed)
        o1, p1 = measured.get_measurement(m1)
        o2, p2 = measured.get_measurement(m2)
        assert o1 == o2
        assert abs(p2 - 1.0) < 1e-10


def test_sample_counts():
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    q, s = b.measure_stochastic(q)
    _, measured = b.calculate_state(seed=0)
    counts = measured.sample_counts(s, shots=10000, seed=1)
    assert set(counts) == {0, 1}
    assert abs(counts[0] - 5000) < 400
    assert sum(counts.values()) == 10000


def test_measured_condition_forcing():
    # Force each outcome of an H-measurement (MeasuredCondition path).
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    q, m = b.measure(q)
    for want in (0, 1):
        state, measured = b.calculate_state(seed=0, conditions={m: want})
        out, p = measured.get_measurement(m)
        assert out == want
        assert abs(p - 0.5) < 1e-10
        expected = np.zeros(2)
        expected[want] = 1.0
        np.testing.assert_allclose(np.abs(state) ** 2, expected, atol=1e-10)
