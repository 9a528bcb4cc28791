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


def test_pass_breakdown_static():
    from rustqip_tpu.algos.qfft import qfft
    from rustqip_tpu.utils.observe import pass_breakdown

    b = LocalBuilder()
    qfft(b, b.register(8))
    bd = pass_breakdown(b)
    assert len(bd) >= 1
    windows = [e for e in bd if e["kind"] == "window"]
    assert windows, bd
    # every sweep accounts a full state read+write
    assert all(e["est_bytes"] == 2 * (1 << 8) * 16 for e in bd)
    # the QFT ladder produces diag and low/cbf steps
    step_kinds = set()
    for e in windows:
        step_kinds.update(e["steps"])
    assert step_kinds & {"low", "cbf", "diag", "mix"}
    # retired op counts cover the whole compiled schedule
    cc = b.compile()
    assert sum(e["ops"] * e["repeat"] for e in bd) == cc.num_passes


def test_pass_breakdown_measure_entries():
    from rustqip_tpu.utils.observe import pass_breakdown

    b = build_example()
    bd = pass_breakdown(b)
    assert sum(1 for e in bd if e["kind"] == "measure") == 2


def test_profile_passes_runs():
    from rustqip_tpu.utils.observe import profile_passes

    b = LocalBuilder()
    r = b.register(4)
    r = b.h(r)
    r = b.t(r)
    r, _ = b.measure(r)
    out = profile_passes(b, iters=1)
    assert len(out) >= 1
    for e in out:
        assert e["ms"] >= 0
        assert e["gbps"] > 0


def test_profile_passes_seeded_random_initial():
    # seed=int profiles from a seeded random normalized state (review r2:
    # the parameter used to be accepted and ignored).
    import jax.numpy as jnp

    from rustqip_tpu.utils.observe import _initial_pair, profile_passes

    re, im = _initial_pair(1 << 4, jnp.float32, seed=7)
    norm = float(jnp.sum(re * re + im * im))
    assert abs(norm - 1.0) < 1e-6
    assert float(jnp.max(jnp.abs(im))) > 0  # genuinely random, not |0..0>
    r2, i2 = _initial_pair(1 << 4, jnp.float32, seed=7)
    assert jnp.allclose(re, r2) and jnp.allclose(im, i2)  # deterministic

    b = LocalBuilder()
    r = b.register(4)
    r = b.h(r)
    out = profile_passes(b, iters=1, seed=3)
    assert len(out) >= 1 and all(e["ms"] >= 0 for e in out)


def test_profile_passes_fused_runs():
    from rustqip_tpu.algos.qfft import qfft
    from rustqip_tpu.utils.observe import profile_passes, profile_passes_fused

    b = LocalBuilder()
    qfft(b, b.register(6))
    out = profile_passes_fused(b, extra_reps=2, iters=1)
    assert len(out) >= 1
    for e in out:
        assert e["ms"] >= 0
        assert e["below_noise_floor"] or e["gbps"] > 0
    # one entry per sweep, same schedule as the per-compile profiler
    slow = profile_passes(b, iters=1)
    assert [e["kind"] for e in out] == [e["kind"] for e in slow]
    assert [e["ops"] for e in out] == [e["ops"] for e in slow]


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
