"""QASM export tests (mirroring qip/src/qasm.rs:229-339)."""

import numpy as np

from rustqip_tpu.prelude import LocalBuilder, PiRational


def test_header_and_registers():
    b = LocalBuilder()
    q = b.qubit()
    r = b.register(2)
    q = b.h(q)
    q, _ = b.measure(q)
    text = b.to_openqasm()
    lines = text.strip().split("\n")
    assert lines[0] == "OPENQASM 2.0;"
    assert lines[1] == 'include "qelib1.inc";'
    assert "qreg q[3];" in lines
    assert "creg c[1];" in lines
    assert "h q[0];" in lines
    assert "measure q[0] -> c[0];" in lines


def test_cx_emission():
    b = LocalBuilder()
    c = b.qubit()
    t = b.qubit()
    b.cnot(c, t)
    text = b.to_openqasm()
    assert "cx q[0],q[1];" in text


def test_swap_emission():
    from rustqip_tpu.builder.circuit_objects import CircuitObject, NamedGate

    b = LocalBuilder()
    ra = b.register(2)
    rb = b.register(2)
    merged = b.merge_two_registers(ra, rb)
    b.apply_circuit_object(merged, CircuitObject(4, NamedGate("SWAP")))
    text = b.to_openqasm()
    assert "swap q[0],q[2];" in text
    assert "swap q[1],q[3];" in text


def test_rz_symbolic_angle():
    b = LocalBuilder()
    q = b.qubit()
    b.rz_pi_by(q, 4)
    text = b.to_openqasm()
    assert "rz(1*pi/4) q[0];" in text


def test_rz_float_angle_trimmed():
    b = LocalBuilder()
    q = b.qubit()
    b.rz(q, 0.5)
    text = b.to_openqasm()
    assert "rz(0.5) q[0];" in text


def test_global_phase_comment_and_mat_synthesis():
    b = LocalBuilder()
    q = b.qubit()
    q = b.apply_global_phase_pi_by(q, 2)
    b.apply_vec_matrix(q, np.eye(2).reshape(-1))
    text = b.to_openqasm()
    assert "// global phase 1*pi/2" in text
    # MatGates now synthesize to real gates (round 2); identity -> u3(0,0,0)
    assert "u3(0,0,0) q[0];" in text


def test_stochastic_comment():
    b = LocalBuilder()
    q = b.qubit()
    b.measure_stochastic(q)
    text = b.to_openqasm()
    assert "// stochastic measurement" in text
    assert "creg" not in text


def test_file_roundtrip(tmp_path):
    b = LocalBuilder()
    q = b.qubit()
    q = b.h(q)
    b.measure(q)
    path = tmp_path / "circuit.qasm"
    b.write_openqasm_file(path)
    assert path.read_text() == b.to_openqasm()


def test_creg_sizing_multiple_measurements():
    b = LocalBuilder()
    ra = b.register(2)
    rb = b.register(2)
    ra, _ = b.measure(ra)
    rb, _ = b.measure(rb)
    text = b.to_openqasm()
    assert "creg c[4];" in text
    assert "measure q[3] -> c[3];" in text
