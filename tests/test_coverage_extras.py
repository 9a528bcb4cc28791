"""Coverage extras for round-2 machinery: explicit executor with explicit
initial states, windows inside repeat blocks, conditioned sparse ops."""

import jax
import numpy as np
import pytest

from rustqip_tpu.prelude import LocalBuilder


def test_explicit_executor_initial_state():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rustqip_tpu.builder.builder import _lower_item
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.explicit import compile_sharded_explicit

    mesh = make_shard_mesh(8)
    b = LocalBuilder(dtype="f64")
    r = b.register(7)
    b.h(r)
    entries = []
    for item in b.pipeline:
        entries.extend(_lower_item(item))
    cc = compile_sharded_explicit(7, entries, np.complex128, mesh)
    rng = np.random.default_rng(3)
    init = rng.normal(size=128) + 1j * rng.normal(size=128)
    init /= np.linalg.norm(init)
    re, im, _ = cc.run(initial_state=init, key=jax.random.PRNGKey(0))
    got = np.asarray(re) + 1j * np.asarray(im)

    cc1 = b.compile()
    re1, im1, _ = cc1.run(initial_state=init, key=jax.random.PRNGKey(0))
    want = np.asarray(re1) + 1j * np.asarray(im1)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_repeat_block_with_window_ops():
    # Grover-like repeats exercise windows inside lax.fori_loop bodies.
    from rustqip_tpu.algos import grover_search

    b = LocalBuilder(dtype="f64")
    r, handle = grover_search(b, n=6, marked=0b101101)
    _, measured = b.calculate_state(seed=0)
    probs = measured.get_stochastic_measurement(handle)
    assert probs.argmax() == 0b101101
    assert probs.max() > 0.95


def test_conditioned_sparse_end_to_end():
    b = LocalBuilder(dtype="f64")
    c = b.qubit()
    r = b.register(3)
    c = b.h(c)
    rng = np.random.default_rng(4)
    perm = rng.permutation(8)
    rows = [[(int(perm[i]), 1.0)] for i in range(8)]
    from rustqip_tpu.builder.circuit_objects import CircuitObject, SparseMatGate

    cb = b.condition_with(c)
    r = cb.apply_circuit_object(r, CircuitObject(3, SparseMatGate(rows)))
    c = cb.dissolve()
    state, _ = b.calculate_state_with_init([(r, 0b001)])
    # |c=0> branch: register unchanged; |c=1> branch: permuted.
    # init value 0b001 -> sub index (big-endian over r's qubits) = 4
    amp = 1 / np.sqrt(2)
    nz = np.flatnonzero(np.abs(state) > 1e-9)
    assert len(nz) == 2
    np.testing.assert_allclose(np.abs(state[nz]), [amp, amp], atol=1e-10)


def test_estimate_phase_f32_runs():
    from rustqip_tpu.algos import estimate_phase

    u = np.diag([1.0, np.exp(2j * np.pi * 0.25)])
    b = LocalBuilder(dtype="f32")
    got, p = estimate_phase(b, u, 3, prepare=lambda bb, t: bb.x(t), seed=0)
    assert abs(got - 0.25) < 1e-6
    assert p > 0.999


def test_num_sweeps_less_than_passes():
    from rustqip_tpu.algos.qfft import qfft

    b = LocalBuilder(dtype="f32")
    qfft(b, b.register(10))
    cc = b.compile()
    assert 1 <= cc.num_sweeps <= cc.num_passes


def test_invert_conditioned_sparse():
    # Review finding (r2): inverting a ControlledMatGate wrapping a
    # SparseMatGate crashed with AttributeError.
    b = LocalBuilder(dtype="f64")
    c = b.qubit()
    r = b.register(3)
    c = b.h(c)
    rng = np.random.default_rng(9)
    perm = rng.permutation(8)
    ph = np.exp(1j * rng.uniform(-3, 3, 8))
    rows = [[(int(perm[i]), complex(ph[i]))] for i in range(8)]
    from rustqip_tpu.builder.circuit_objects import (
        CircuitObject,
        SparseMatGate,
    )

    start = len(b.pipeline)
    cb = b.condition_with(c)
    r = cb.apply_circuit_object(r, CircuitObject(3, SparseMatGate(rows)))
    c = cb.dissolve()
    sc = b.pipeline[start:]
    merged = b.merge_two_registers(c, r)
    merged = b.apply_inverted_subcircuit(sc, merged)
    state, _ = b.calculate_state()
    # U^-1 U |+0...> = |+0...>
    want = np.zeros(16, dtype=complex)
    want[0] = want[8] = 1 / np.sqrt(2)
    np.testing.assert_allclose(state, want, atol=1e-10)


def test_explicit_executor_norm_check():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rustqip_tpu.builder.builder import _lower_item
    from rustqip_tpu.engine import compile as engine_compile
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.explicit import ExplicitShardedCircuit

    engine_compile.NORM_VIOLATIONS.clear()
    mesh = make_shard_mesh(8)
    b = LocalBuilder(dtype="f64")
    r = b.register(7)
    q3 = b.split_all_register(r)[3]
    q3 = b.h(q3)
    b.apply_matrix(q3, np.diag([1.0, 0.0]))  # projects |+> -> norm 0.5
    entries = []
    for item in b.pipeline:
        entries.extend(_lower_item(item))
    cc = ExplicitShardedCircuit(7, entries, np.complex128, mesh)
    cc._check_norm = True
    import warnings

    with warnings.catch_warnings():
        # debug callbacks may fire on a runtime thread: assert via the
        # violations record, not warning capture
        warnings.simplefilter("ignore")
        re, im, _ = cc.run(initial_index=0, key=jax.random.PRNGKey(0))
        np.asarray(re)  # sync so the callback has run
    assert engine_compile.NORM_VIOLATIONS
