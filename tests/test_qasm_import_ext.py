"""QASM importer extensions: custom gate definitions, `if` statements
(deferred-measurement lowering), and `reset`.

The reference has no importer (qasm.rs is export-only); these close the
round-trip for the broader OpenQASM 2.0 surface real exporters emit.
"""

import numpy as np
import pytest

from rustqip_tpu.errors import CircuitError
from rustqip_tpu.prelude import LocalBuilder
from rustqip_tpu.qasm import circuit_from_qasm

HEADER = 'OPENQASM 2.0;\ninclude "qelib1.inc";\n'


def _state(qc, seed=0):
    s, measured = qc.builder.calculate_state(seed=seed)
    return np.asarray(s), measured


# ---------------------------------------------------------------- gate defs


def test_custom_gate_definition_expands():
    text = HEADER + (
        "gate bellish(theta) a, b { h a; cx a,b; rz(theta) b; }\n"
        "qreg q[2];\n"
        "bellish(pi/3) q[0], q[1];\n"
    )
    qc = circuit_from_qasm(text)
    got, _ = _state(qc)

    b = LocalBuilder()
    q0, q1 = b.qubit(), b.qubit()
    q0 = b.h(q0)
    q0, q1 = b.cnot(q0, q1)
    # qelib1 rz == u1 (phase on |1> only)
    q1 = b.apply_matrix(q1, np.diag([1.0, np.exp(1j * np.pi / 3)]))
    want, _ = b.calculate_state(seed=0)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-10)


def test_custom_gate_nested_and_param_arithmetic():
    text = HEADER + (
        "gate phz(t) a { rz(2*t) a; }\n"
        "gate pair(t) a, b { h a; cx a,b; phz(t/2) b; }\n"
        "qreg q[2];\n"
        "pair(pi/4) q[0], q[1];\n"
    )
    qc = circuit_from_qasm(text)
    got, _ = _state(qc)
    # net phase on b: rz(2 * (pi/4)/2) = u1(pi/4)
    b = LocalBuilder()
    q0, q1 = b.qubit(), b.qubit()
    q0 = b.h(q0)
    q0, q1 = b.cnot(q0, q1)
    q1 = b.apply_matrix(q1, np.diag([1.0, np.exp(1j * np.pi / 4)]))
    want, _ = b.calculate_state(seed=0)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-10)


def test_custom_gate_wrong_arity_rejected():
    text = HEADER + (
        "gate gg a, b { cx a,b; }\nqreg q[3];\ngg q[0], q[1], q[2];\n"
    )
    with pytest.raises(CircuitError):
        circuit_from_qasm(text)


def test_custom_gate_unknown_param_name_rejected():
    text = HEADER + (
        "gate gg(t) a { rz(t + bogus) a; }\nqreg q[1];\ngg(1.0) q[0];\n"
    )
    with pytest.raises(CircuitError):
        circuit_from_qasm(text)


# ----------------------------------------------------------------------- if


def _teleport_text():
    return HEADER + (
        "qreg q[3];\n"
        "creg c0[1];\n"
        "creg c1[1];\n"
        "u3(0.7,0.3,1.1) q[0];\n"
        "h q[1];\n"
        "cx q[1],q[2];\n"
        "cx q[0],q[1];\n"
        "h q[0];\n"
        "measure q[0] -> c0[0];\n"
        "measure q[1] -> c1[0];\n"
        "if (c1==1) x q[2];\n"
        "if (c0==1) z q[2];\n"
    )


@pytest.mark.parametrize("seed", range(6))
def test_teleportation_via_if(seed):
    from rustqip_tpu.qasm.decompose import _u3_matrix

    psi = _u3_matrix(0.7, 0.3, 1.1) @ np.array([1.0, 0.0])
    qc = circuit_from_qasm(_teleport_text())
    state, measured = _state(qc, seed=seed)
    m0 = measured.get_measurement(qc.measurements[0][1])[0]
    m1 = measured.get_measurement(qc.measurements[1][1])[0]
    # qubit 0 -> bit 2, qubit 1 -> bit 1, qubit 2 -> bit 0 (big-endian)
    base = 4 * m0 + 2 * m1
    got = state[[base, base + 1]]
    overlap = abs(np.vdot(psi, got))
    assert overlap == pytest.approx(1.0, abs=1e-8), (m0, m1, got)


def test_if_multibit_condition_matches_value():
    # Two measured qubits both 1 (X first), condition c==3 fires, c==1 not.
    text = HEADER + (
        "qreg q[3];\ncreg c[2];\n"
        "x q[0];\nx q[1];\n"
        "measure q[0] -> c[0];\nmeasure q[1] -> c[1];\n"
        "if (c==3) x q[2];\n"
        "if (c==1) x q[2];\n"
    )
    qc = circuit_from_qasm(text)
    state, _ = _state(qc)
    # q0=1, q1=1, q2 flipped once -> |111> = index 7
    assert np.argmax(np.abs(state)) == 7
    assert abs(state[7]) == pytest.approx(1.0, abs=1e-10)


def test_if_on_custom_gate():
    text = HEADER + (
        "gate flip a { x a; }\n"
        "qreg q[2];\ncreg c[1];\n"
        "x q[0];\nmeasure q[0] -> c[0];\n"
        "if (c==1) flip q[1];\n"
    )
    qc = circuit_from_qasm(text)
    state, _ = _state(qc)
    assert np.argmax(np.abs(state)) == 0b11


def test_if_unmeasured_creg_rejected():
    text = HEADER + "qreg q[2];\ncreg c[1];\nif (c==1) x q[1];\n"
    with pytest.raises(CircuitError, match="unmeasured"):
        circuit_from_qasm(text)


def test_if_after_source_modified_rejected():
    text = HEADER + (
        "qreg q[2];\ncreg c[1];\n"
        "measure q[0] -> c[0];\n"
        "h q[0];\n"
        "if (c==1) x q[1];\n"
    )
    with pytest.raises(CircuitError, match="modified after"):
        circuit_from_qasm(text)


def test_if_value_out_of_range_rejected():
    text = HEADER + (
        "qreg q[2];\ncreg c[1];\nmeasure q[0] -> c[0];\nif (c==2) x q[1];\n"
    )
    with pytest.raises(CircuitError, match="out of range"):
        circuit_from_qasm(text)


def test_two_ifs_share_control_freshness():
    # The control survives the first if (X-conj leaves it classical) so the
    # second if on the same creg still lowers.
    text = HEADER + (
        "qreg q[3];\ncreg c[1];\n"
        "x q[0];\nmeasure q[0] -> c[0];\n"
        "if (c==1) x q[1];\n"
        "if (c==1) x q[2];\n"
    )
    qc = circuit_from_qasm(text)
    state, _ = _state(qc)
    assert np.argmax(np.abs(state)) == 0b111


# -------------------------------------------------------------------- reset


@pytest.mark.parametrize("seed", range(4))
def test_reset_yields_zero(seed):
    text = HEADER + (
        "qreg q[1];\ncreg c[1];\nh q[0];\nreset q[0];\nmeasure q[0] -> c[0];\n"
    )
    qc = circuit_from_qasm(text)
    _, measured = _state(qc, seed=seed)
    out, p = measured.get_measurement(qc.measurements[0][1])
    assert out == 0
    assert p == pytest.approx(1.0, abs=1e-10)


def test_reset_entangled_marginal():
    # Bell pair, reset one side: the partner stays 50/50 and the norm holds.
    text = HEADER + (
        "qreg q[2];\ncreg c[2];\n"
        "h q[0];\ncx q[0],q[1];\n"
        "reset q[0];\n"
        "measure q[0] -> c[0];\n"
    )
    counts = {0: 0, 1: 0}
    for seed in range(8):
        qc = circuit_from_qasm(text)
        state, measured = _state(qc, seed=seed)
        out, p = measured.get_measurement(qc.measurements[0][1])
        assert out == 0 and p == pytest.approx(1.0, abs=1e-10)
        assert np.linalg.norm(state) == pytest.approx(1.0, abs=1e-8)


def test_reset_then_reuse():
    text = HEADER + (
        "qreg q[1];\ncreg c[1];\n"
        "x q[0];\nreset q[0];\nx q[0];\nmeasure q[0] -> c[0];\n"
    )
    qc = circuit_from_qasm(text)
    _, measured = _state(qc)
    out, p = measured.get_measurement(qc.measurements[0][1])
    assert out == 1 and p == pytest.approx(1.0, abs=1e-10)


def test_measure_whole_register_maps_creg_bits():
    text = HEADER + (
        "qreg a[2];\nqreg b[1];\ncreg c[2];\n"
        "x a[1];\nmeasure a -> c;\nif (c==2) x b[0];\n"
    )
    qc = circuit_from_qasm(text)
    state, _ = _state(qc)
    # c = a0 + 2*a1 = 2 -> condition fires -> b flips -> |011>
    assert np.argmax(np.abs(state)) == 0b011


def test_scientific_notation_params():
    # Qiskit prints tiny angles like 6.123233995736766e-17 (review r2).
    from rustqip_tpu.qasm.importer import _eval_param

    assert _eval_param("1e-07") == pytest.approx(1e-07)
    assert _eval_param("2.5e3") == pytest.approx(2500.0)
    assert _eval_param("2*pi - 1E-2") == pytest.approx(2 * np.pi - 0.01)
    assert _eval_param("x2 + 1e1", {"x2": 5.0}) == pytest.approx(15.0)
    text = HEADER + "qreg q[1];\nrz(6.123233995736766e-17) q[0];\n"
    circuit_from_qasm(text)  # must not raise


def test_measure_out_of_range_creg_bit_rejected():
    # Review r2: this previously wrote into the NEIGHBORING creg's bits.
    import pytest as _pytest

    from rustqip_tpu.errors import CircuitError

    text = HEADER + (
        "qreg q[2];\ncreg c0[1];\ncreg c1[1];\n"
        "measure q[0] -> c0[1];\n"
    )
    with _pytest.raises(CircuitError, match="out of range"):
        circuit_from_qasm(text)


def test_if_targeting_own_source_clear_error():
    # The active-reset idiom can't lower via deferred measurement; the
    # error must say so instead of a confusing reuse message (review r2).
    import pytest as _pytest

    from rustqip_tpu.errors import CircuitError

    text = HEADER + (
        "qreg q[1];\ncreg c[1];\n"
        "measure q[0] -> c[0];\nif (c==1) x q[0];\n"
    )
    with _pytest.raises(CircuitError, match="own source"):
        circuit_from_qasm(text)


def test_recursive_gate_definition_rejected():
    # A self-recursive custom gate has no finite expansion; the importer
    # must raise CircuitError, not blow the Python stack (advisor r2).
    text = HEADER + (
        "gate g a { h a; g a; }\n"
        "qreg q[1];\ng q[0];\n"
    )
    with pytest.raises(CircuitError, match="Recursive gate definition"):
        circuit_from_qasm(text)


def test_mutually_recursive_gate_definitions_rejected():
    text = HEADER + (
        "gate g1 a { g2 a; }\n"
        "gate g2 a { g1 a; }\n"
        "qreg q[1];\ng1 q[0];\n"
    )
    with pytest.raises(CircuitError, match="Recursive gate definition"):
        circuit_from_qasm(text)


def test_if_duplicate_source_qubit_dedups():
    # Two creg bits measured from the SAME source qubit: the condition
    # collapses to one control (advisor r2 — previously died in merge
    # with a linear-register error). c==3 requires both bits 1 -> fires
    # exactly when q[0] measured 1.
    text = HEADER + (
        "qreg q[2];\ncreg c[2];\n"
        "x q[0];\n"
        "measure q[0] -> c[0];\nmeasure q[0] -> c[1];\n"
        "if (c==3) x q[1];\n"
    )
    qc = circuit_from_qasm(text)
    state, _ = _state(qc)
    assert np.argmax(np.abs(state)) == 0b11
    assert abs(state[0b11]) == pytest.approx(1.0, abs=1e-10)


def test_if_duplicate_source_qubit_conflicting_bits_rejected():
    # c==1 asks bit0=1 and bit1=0 of two copies of the same measurement —
    # unsatisfiable; must be a clear QASM-level diagnostic.
    text = HEADER + (
        "qreg q[2];\ncreg c[2];\n"
        "measure q[0] -> c[0];\nmeasure q[0] -> c[1];\n"
        "if (c==1) x q[1];\n"
    )
    with pytest.raises(CircuitError, match="unsatisfiable"):
        circuit_from_qasm(text)
