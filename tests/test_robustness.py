"""Robustness sweep: norm-drift runtime asserts and serialize->replay
round-trip fuzzing on random circuits (ROADMAP items, VERDICT #9)."""

import numpy as np
import pytest

from rustqip_tpu.engine import compile as engine_compile
from rustqip_tpu.prelude import LocalBuilder
from rustqip_tpu.utils.serialize import builder_from_json, circuit_to_json


# ---------------------------------------------------------------------------
# Norm-drift asserts
# ---------------------------------------------------------------------------


def test_norm_check_clean_circuit_silent():
    engine_compile.NORM_VIOLATIONS.clear()
    b = LocalBuilder(check_norm=True)
    q = b.qubit()
    t = b.qubit()
    q = b.h(q)
    q, t = b.cnot(q, t)
    q, m = b.measure(q)
    _, measured = b.calculate_state(seed=0)
    measured.get_measurement(m)
    assert engine_compile.NORM_VIOLATIONS == []


def test_norm_check_flags_nonunitary():
    engine_compile.NORM_VIOLATIONS.clear()
    b = LocalBuilder(check_norm=True)
    q = b.qubit()
    q = b.h(q)
    # A non-unitary gate (norm-shrinking): the check must flag it.
    b.apply_matrix(q, np.diag([1.0, 0.0]))
    with pytest.warns(RuntimeWarning, match="norm drift"):
        b.calculate_state(seed=0)
    assert engine_compile.NORM_VIOLATIONS


def test_norm_check_off_by_default():
    engine_compile.NORM_VIOLATIONS.clear()
    b = LocalBuilder()
    q = b.qubit()
    b.apply_matrix(q, np.diag([1.0, 0.0]))
    b.calculate_state(seed=0)
    assert engine_compile.NORM_VIOLATIONS == []


# ---------------------------------------------------------------------------
# Serialize -> replay fuzz
# ---------------------------------------------------------------------------


def _random_circuit(rng, n=6, depth=18):
    b = LocalBuilder()
    qs = b.split_all_register(b.register(n))

    def rand_u(k):
        m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
            size=(1 << k, 1 << k)
        )
        u, _ = np.linalg.qr(m)
        return u

    for _ in range(depth):
        kind = rng.integers(0, 8)
        i, j, k = rng.choice(n, size=3, replace=False)
        if kind == 0:
            qs[i] = getattr(b, rng.choice(["h", "x", "y", "z", "s", "t"]))(
                qs[i]
            )
        elif kind == 1:
            qs[i], qs[j] = b.cnot(qs[i], qs[j])
        elif kind == 2:
            qs[i], qs[j] = b.swap(qs[i], qs[j])
        elif kind == 3:
            qs[i] = b.rz(qs[i], float(rng.uniform(-3, 3)))
        elif kind == 4:
            qs[i] = b.apply_matrix(qs[i], rand_u(1))
        elif kind == 5:
            merged = b.merge_two_registers(qs[i], qs[j])
            merged = b.apply_matrix(merged, rand_u(2))
            qs[i], qs[j] = b.split_all_register(merged)
        elif kind == 6:
            # conditioned arbitrary unitary (native ControlledMatGate)
            cb = b.condition_with(qs[i])
            qs[j] = cb.apply_matrix(qs[j], rand_u(1))
            qs[i] = cb.dissolve()
        else:
            # sparse permutation+phase on a 2q sub-register
            merged = b.merge_two_registers(qs[i], qs[j])
            perm = rng.permutation(4)
            ph = np.exp(1j * rng.uniform(-3, 3, 4))
            rows = [[(int(perm[t]), complex(ph[t]))] for t in range(4)]
            merged = b.apply_sparse_matrix(merged, rows)
            qs[i], qs[j] = b.split_all_register(merged)
    return b


@pytest.mark.parametrize("seed", range(6))
def test_serialize_replay_fuzz(seed):
    rng = np.random.default_rng(seed)
    b = _random_circuit(rng)
    text = circuit_to_json(b)
    b2 = builder_from_json(text)
    s1, _ = b.calculate_state(seed=99)
    s2, _ = b2.calculate_state(seed=99)
    np.testing.assert_allclose(s1, s2, atol=1e-10)
    # double round-trip is byte-identical
    assert circuit_to_json(b2) == text


def test_serialize_replay_with_measurements():
    b = LocalBuilder()
    qs = b.split_all_register(b.register(4))
    qs[0] = b.h(qs[0])
    qs[0], qs[1] = b.cnot(qs[0], qs[1])
    _, m = b.measure(b.merge_two_registers(qs[0], qs[1]))
    _, s = b.measure_stochastic(b.merge_two_registers(qs[2], qs[3]))
    b2 = builder_from_json(circuit_to_json(b))
    assert b2._measurement_kinds == ["collapse", "stochastic"]
    s1, m1 = b.calculate_state(seed=7)
    s2, m2 = b2.calculate_state(seed=7)
    np.testing.assert_allclose(s1, s2, atol=1e-12)
    assert m1.get_measurement(m)[0] == m2._results[0][0]
    # forced-condition validation still works on the rebuilt builder
    from rustqip_tpu.errors import CircuitError

    with pytest.raises(CircuitError):
        b2.calculate_state(seed=0, conditions={1: 0})
    b2.calculate_state(seed=0, conditions={0: 1})


def test_compiled_kernel_path_fuzz(monkeypatch):
    """FULL-STACK kernel-path fuzz on CPU: random circuits through
    ``compile_pipeline`` with the Pallas path simulated on — exercising
    window-aware fusion (keep + joint_ok), swap deferral, sweep planning
    AND interpret-mode kernel execution (``_window_kernel_run`` auto-
    selects interpret off-TPU) — against per-op ``apply_op_ri``
    reference application. Guards the compile-level interactions the
    plan-shape tests cannot see."""
    import jax.numpy as jnp

    from rustqip_tpu.engine import pallas_kernels
    from rustqip_tpu.engine.compile import UnitaryEntry, compile_pipeline
    from rustqip_tpu.engine.real_apply import apply_op_ri
    from rustqip_tpu.ops import gates
    from rustqip_tpu.ops.matrix_ops import (
        PhaseProductOp,
        make_control_op,
        make_matrix_op,
        make_swap_op,
    )

    monkeypatch.setattr(pallas_kernels, "available", lambda: True)
    n = 17  # row qubits 0..9 (R=1024; qubit 0 = row bit 9, the cmix
    # range), lane qubits 10..16
    rng = np.random.default_rng(1234)

    def rand_u(k):
        m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
            size=(1 << k, 1 << k)
        )
        q, _ = np.linalg.qr(m)
        return q

    def rand_op():
        kind = rng.integers(0, 7)
        qs = list(rng.choice(n, size=3, replace=False))
        if kind == 0:  # 1q named gate anywhere (seam, row, lane)
            g = [gates.H, gates.T, gates.X, gates.Y][rng.integers(0, 4)]
            return make_matrix_op([qs[0]], g.reshape(-1))
        if kind == 1:  # CNOT
            return make_control_op(
                [qs[0]], make_matrix_op([qs[1]], gates.X.reshape(-1))
            )
        if kind == 2:  # CCX
            return make_control_op(
                [qs[0], qs[1]], make_matrix_op([qs[2]], gates.X.reshape(-1))
            )
        if kind == 3:  # controlled phase
            ang = float(rng.uniform(-3, 3))
            ph = complex(np.cos(ang), np.sin(ang))
            return PhaseProductOp(
                (((qs[0], qs[1]), (1, 1, 1, ph)),)
            )
        if kind == 4:  # random 2q dense unitary
            return make_matrix_op(qs[:2], rand_u(2).reshape(-1))
        if kind == 5:  # random 3q dense unitary
            return make_matrix_op(qs, rand_u(3).reshape(-1))
        return make_swap_op([qs[0]], [qs[1]])

    dim = 1 << n
    for trial in range(3):
        ops = [rand_op() for _ in range(14)]
        cc = compile_pipeline(n, [UnitaryEntry(op) for op in ops],
                              np.complex64)
        state0 = rng.normal(size=dim) + 1j * rng.normal(size=dim)
        state0 = (state0 / np.linalg.norm(state0)).astype(np.complex64)
        re, im, _ = cc.run(initial_state=state0)
        got = np.asarray(re) + 1j * np.asarray(im)
        er = jnp.asarray(state0.real)
        ei = jnp.asarray(state0.imag)
        for op in ops:
            er, ei = apply_op_ri(n, op, er, ei)
        want = np.asarray(er) + 1j * np.asarray(ei)
        np.testing.assert_allclose(
            got, want, atol=2e-4,
            err_msg=f"trial {trial}: {[type(o).__name__ for o in ops]}",
        )
