"""Gate-level QASM export of natively-conditioned circuits + round-trip
re-import (the VERDICT item: parity with qasm.rs:112-184 without giving up
native conditioning)."""

import numpy as np
import pytest

from rustqip_tpu.prelude import LocalBuilder
from rustqip_tpu.qasm import circuit_from_qasm, to_openqasm


def _states_match_up_to_phase(s1, s2, atol=1e-8):
    n1, n2 = np.linalg.norm(s1), np.linalg.norm(s2)
    overlap = abs(np.vdot(s1, s2))
    assert abs(overlap - n1 * n2) < atol, (overlap, n1 * n2)


def _roundtrip_state(b):
    """Export b, re-import, and compare final states up to global phase."""
    text = to_openqasm(b)
    assert "not emitted" not in text
    assert "exceeds synthesis cap" not in text
    imp = circuit_from_qasm(text)
    assert imp.n == b.n
    s1, _ = b.calculate_state(seed=0)
    s2, _ = imp.builder.calculate_state(seed=0)
    _states_match_up_to_phase(s1, s2)
    return text


def test_conditioned_mat_exports_gates():
    # Natively-conditioned arbitrary 1q unitary -> u1 + cu3 stream.
    rng = np.random.default_rng(0)
    m = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    u, _ = np.linalg.qr(m)
    b = LocalBuilder()
    c = b.qubit()
    t = b.qubit()
    c = b.h(c)
    cb = b.condition_with(c)
    t = cb.apply_matrix(t, u)
    c = cb.dissolve()
    text = _roundtrip_state(b)
    assert "cu3(" in text


def test_conditioned_swap_exports_gates():
    # swap() is 3 CNOTs per pair (reference parity), so conditioning yields
    # ControlledMatGate(2, X) entries -> ccx streams.
    b = LocalBuilder()
    c = b.qubit()
    ra = b.register(2)
    rb = b.register(2)
    c = b.h(c)
    ra = b.x(ra)
    cb = b.condition_with(c)
    ra, rb = cb.swap(ra, rb)
    c = cb.dissolve()
    text = _roundtrip_state(b)
    assert "ccx" in text


def test_conditioned_named_swap_exports_cswap():
    # Conditioning the NamedGate SWAP object directly takes the native
    # controlled-4x4-SWAP path -> a single cswap.
    from rustqip_tpu.builder.circuit_objects import CircuitObject, NamedGate

    b = LocalBuilder()
    c = b.qubit()
    r = b.register(2)
    c = b.h(c)
    r = b.x(r)
    c, r = b.try_apply_with_condition(
        c, r, CircuitObject(2, NamedGate("SWAP"))
    )
    text = _roundtrip_state(b)
    assert "cswap" in text


def test_multi_controlled_x_exports_ccx():
    b = LocalBuilder()
    cr = b.register(2)
    t = b.qubit()
    cr = b.h(cr)
    cb = b.condition_with(cr)
    t = cb.x(t)
    cr = cb.dissolve()
    text = _roundtrip_state(b)
    assert "ccx" in text


def test_triple_controlled_unitary_synthesizes():
    # 3 controls + arbitrary target: no qelib1 primitive — full QSD stream.
    rng = np.random.default_rng(1)
    m = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    u, _ = np.linalg.qr(m)
    b = LocalBuilder()
    cr = b.register(3)
    t = b.qubit()
    cr = b.h(cr)
    cb = b.condition_with(cr)
    t = cb.apply_matrix(t, u)
    cr = cb.dissolve()
    _roundtrip_state(b)


def test_multiqubit_mat_synthesizes():
    rng = np.random.default_rng(2)
    m = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    u, _ = np.linalg.qr(m)
    b = LocalBuilder()
    r = b.register(3)
    r = b.h(r)
    r = b.apply_matrix(r, u)
    _roundtrip_state(b)


def test_sparse_mat_exports_when_small():
    b = LocalBuilder()
    r = b.register(3)
    r = b.h(r)
    perm = [3, 0, 7, 1, 5, 2, 6, 4]
    rows = [[(perm[i], 1.0)] for i in range(8)]
    r = b.apply_sparse_matrix(r, rows)
    _roundtrip_state(b)


def test_named_gates_roundtrip():
    b = LocalBuilder()
    q0 = b.qubit()
    q1 = b.qubit()
    q2 = b.qubit()
    q0 = b.h(q0)
    q0, q1 = b.cnot(q0, q1)
    q1 = b.t(q1)
    q2 = b.s(q2)
    q1, q2 = b.swap(q1, q2)
    q2 = b.y(q2)
    q0 = b.rz(q0, 0.7)
    _roundtrip_state(b)


def test_measurement_roundtrip():
    b = LocalBuilder()
    q = b.qubit()
    t = b.qubit()
    q = b.h(q)
    q, t = b.cnot(q, t)
    q, m = b.measure(q)
    text = to_openqasm(b)
    assert "measure q[0] -> c[0];" in text
    imp = circuit_from_qasm(text)
    assert len(imp.measurements) == 1
    _, measured = imp.builder.calculate_state(seed=3)
    out, p = measured.get_measurement(imp.measurements[0][1])
    assert out in (0, 1)
    assert abs(p - 0.5) < 1e-8


def test_importer_rejects_unknown():
    from rustqip_tpu.errors import CircuitError

    with pytest.raises(CircuitError):
        circuit_from_qasm("qreg q[1]; frobnicate q[0];")


def test_importer_parses_pi_expressions():
    text = """
    OPENQASM 2.0;
    include "qelib1.inc";
    qreg q[1];
    u1(3*pi/4) q[0];
    rx(-pi/2) q[0];
    """
    imp = circuit_from_qasm(text)
    s, _ = imp.builder.calculate_state(seed=0)
    assert abs(np.linalg.norm(s) - 1) < 1e-10


def test_wide_oracle_export_comments_loudly():
    # >QSD_CAP unitaries cannot be gate-synthesized; the export must say so
    # rather than silently dropping the op.
    b = LocalBuilder()
    r = b.register(11)
    rows = [[(i, 1.0)] for i in range(1 << 11)]
    r = b.apply_sparse_matrix(r, rows)
    text = to_openqasm(b)
    assert "exceeds synthesis cap" in text


def test_qsd_cap_env_override(monkeypatch):
    """RUSTQIP_TPU_QSD_CAP lifts/lowers the synthesis cap at call time."""
    from rustqip_tpu.errors import CircuitError
    from rustqip_tpu.qasm.decompose import qsd_cap, synthesize_unitary

    assert qsd_cap() == 10  # raised default (was 8 through round 3)
    monkeypatch.setenv("RUSTQIP_TPU_QSD_CAP", "4")
    assert qsd_cap() == 4
    # Malformed / nonsensical overrides degrade to the default instead of
    # crashing every export call.
    monkeypatch.setenv("RUSTQIP_TPU_QSD_CAP", "8q")
    assert qsd_cap() == 10
    monkeypatch.setenv("RUSTQIP_TPU_QSD_CAP", "0")
    assert qsd_cap() == 10
    monkeypatch.setenv("RUSTQIP_TPU_QSD_CAP", "4")
    rng = np.random.default_rng(3)
    m = rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))
    u, _ = np.linalg.qr(m)
    with pytest.raises(CircuitError, match="cap 4"):
        synthesize_unitary(u, list(range(5)))
    monkeypatch.setenv("RUSTQIP_TPU_QSD_CAP", "5")
    gates = synthesize_unitary(u, list(range(5)))
    from rustqip_tpu.qasm.decompose import gates_to_matrix

    np.testing.assert_allclose(
        gates_to_matrix(gates, list(range(5))), u, atol=1e-9
    )


@pytest.mark.heavy
def test_qsd_nine_qubit_synthesis_exact():
    """A 9-qubit random unitary (beyond the round-3 cap of 8) synthesizes
    exactly: the IR stream applied to a random state matches U @ v at
    1e-9 (gates_to_matrix is O(8^k)-per-gate — the stream applier is the
    wide-width oracle). VERDICT r3 next-6."""
    from rustqip_tpu.qasm.decompose import apply_gate_stream, synthesize_unitary

    k = 9
    rng = np.random.default_rng(9)
    m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
        size=(1 << k, 1 << k)
    )
    u, _ = np.linalg.qr(m)
    gates = synthesize_unitary(u, list(range(k)))
    v = rng.normal(size=1 << k) + 1j * rng.normal(size=1 << k)
    v /= np.linalg.norm(v)
    got = apply_gate_stream(gates, list(range(k)), v)
    np.testing.assert_allclose(got, u @ v, atol=1e-9)


@pytest.mark.slow
def test_qsd_ten_qubit_full_roundtrip():
    """A 10-qubit random unitary survives the FULL pipeline: builder ->
    to_openqasm (QSD synthesis, ~2M gates) -> circuit_from_qasm ->
    re-lowered ops applied to a random state, at 1e-8 (VERDICT r3 next-6
    'Done' criterion). Slow: ~4-6 min on the 1-core host."""
    from rustqip_tpu.builder.builder import LocalBuilder, _lower_item
    from rustqip_tpu.engine.compile import UnitaryEntry
    from rustqip_tpu.ops.matrix_ops import op_to_dense
    from rustqip_tpu.qasm import circuit_from_qasm, to_openqasm

    k = 10
    rng = np.random.default_rng(10)
    m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
        size=(1 << k, 1 << k)
    )
    u, _ = np.linalg.qr(m)
    b = LocalBuilder()
    r = b.register(k)
    b.apply_matrix(r, u.reshape(-1))
    text = to_openqasm(b)
    assert "exceeds synthesis cap" not in text
    imp = circuit_from_qasm(text)
    # Re-lower the imported builder's pipeline to raw ops (compiling 2M
    # entries through fusion would be needlessly slow for a test oracle)
    # and stream-apply them.
    v = rng.normal(size=1 << k) + 1j * rng.normal(size=1 << k)
    v /= np.linalg.norm(v)
    st = v.reshape((2,) * k)
    nops = 0
    for item in imp.builder.pipeline:
        for entry in _lower_item(item):
            assert isinstance(entry, UnitaryEntry)
            op = entry.op
            g = op_to_dense(op)
            axes = list(op.indices)
            kq = len(axes)
            st = np.moveaxis(st, axes, range(kq))
            st = (g @ st.reshape(1 << kq, -1)).reshape((2,) * k)
            st = np.moveaxis(st, range(kq), axes)
            nops += 1
    got = st.reshape(-1)
    want = u @ v
    # export drops global phase (exact_phase=False): compare up to phase
    ph = np.vdot(got, want)
    ph /= abs(ph)
    np.testing.assert_allclose(got * ph, want, atol=1e-8)
    assert nops > 1_000_000  # the stream really was QSD-scale
