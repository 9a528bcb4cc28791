"""Auxiliary subsystems: serialization round-trips, observability, Shor."""

import numpy as np
import pytest

from rustqip_tpu.algos.shor import factor, find_period, shor_period_circuit
from rustqip_tpu.prelude import LocalBuilder, PiRational
from rustqip_tpu.utils.observe import circuit_stats, profile_circuit
from rustqip_tpu.utils.serialize import (
    builder_from_json,
    circuit_to_json,
    load_circuit,
    load_state,
    save_circuit,
    save_state,
)


def build_example():
    b = LocalBuilder()
    q = b.qubit()
    r = b.register(2)
    q = b.h(q)
    q = b.rz_pi_by(q, 4)
    q = b.rz(q, 0.123)
    q = b.apply_global_phase(q, 0.5)
    cb = b.condition_with(q)
    r = cb.apply_vec_matrix(r, np.eye(4).reshape(-1))
    q = cb.dissolve()
    r = b.repeat(3, lambda bb, rr: bb.h(bb.h(rr)), r)
    r, _ = b.measure(r)
    q, _ = b.measure_stochastic(q)
    return b


def test_circuit_json_roundtrip():
    b = build_example()
    text = circuit_to_json(b)
    b2 = builder_from_json(text)
    assert b2.n == b.n
    assert len(b2.pipeline) == len(b.pipeline)
    for (i1, c1), (i2, c2) in zip(b.pipeline, b2.pipeline):
        assert i1 == i2
        assert c1.fingerprint() == c2.fingerprint()
    # Replays identically.
    s1, m1 = b.calculate_state(seed=3)
    s2, m2 = b2.calculate_state(seed=3)
    np.testing.assert_allclose(s1, s2, atol=1e-12)


def test_circuit_file_roundtrip(tmp_path):
    b = build_example()
    path = tmp_path / "circuit.json"
    save_circuit(b, path)
    b2 = load_circuit(path)
    assert circuit_to_json(b2) == circuit_to_json(b)


def test_state_snapshot_roundtrip(tmp_path):
    b = LocalBuilder()
    r = b.register(3)
    b.h(r)
    state, _ = b.calculate_state()
    path = tmp_path / "state.npz"
    save_state(path, state)
    loaded = load_state(path)
    np.testing.assert_allclose(loaded, np.asarray(state), atol=1e-12)


def test_circuit_stats():
    b = build_example()
    stats = circuit_stats(b)
    assert stats.n_qubits == b.n
    assert stats.gate_counts["H"] >= 1 + 2 * 3  # h + repeated h pairs
    assert stats.measurements == 2
    assert stats.fused_passes >= 1
    assert stats.est_hbm_traffic_bytes > 0
    assert "qubits" in str(stats)


def test_profile_circuit_runs():
    b = LocalBuilder()
    r = b.register(4)
    b.h(r)
    out = profile_circuit(b, iters=2)
    assert out["steady_run_s"] >= 0
    assert out["gate_passes"] >= 1
    assert 1 <= out["hbm_sweeps"] <= out["gate_passes"]


def test_shor_period():
    assert find_period(7, 15) == 4
    assert find_period(2, 15) == 4
    assert find_period(4, 15) == 2


def test_shor_factor_15():
    result = factor(15, seed=1)
    assert result is not None
    assert sorted(result) == [3, 5]


def test_shor_circuit_shape():
    b = LocalBuilder()
    ex, work, handle = shor_period_circuit(b, 7, 15)
    assert ex.n == 8  # 2 * bit_length(15)
    assert work.n == 4
