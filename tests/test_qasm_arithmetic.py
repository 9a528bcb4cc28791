"""End-to-end QASM export of the arithmetic library: the reference can
export its (build-time-decomposed) arithmetic circuits as gate streams
(qasm.rs used on boolean_circuits pipelines); with export-time synthesis
plus the MCU ancilla ladder this framework exports its natively-conditioned
equivalents, and the streams re-import to the same states.
"""

import numpy as np
import pytest

from rustqip_tpu.algos.arithmetic import add, add_mod
from rustqip_tpu.prelude import LocalBuilder
from rustqip_tpu.qasm import circuit_from_qasm, to_openqasm


def _roundtrip_states_match(b, init_pairs, atol=1e-8):
    """Export b, re-import, run both from the same basis init, compare up
    to global phase. ``init_pairs`` are (first_qubit_index, width, value)
    triples describing b's registers in allocation order."""
    text = to_openqasm(b)
    assert "exceeds synthesis cap" not in text
    assert "not emitted" not in text
    s1, _ = b.calculate_state_with_init(
        [(reg, val) for reg, val in init_pairs]
    )
    s1 = np.asarray(s1)
    imp = circuit_from_qasm(text)
    n_orig = b.n
    # init the imported circuit per-qubit: register value bit j sits on the
    # register's j-th qubit (little-endian within the register)
    per_qubit = []
    pos = 0
    for reg, val in init_pairs:
        for j in range(reg.n):
            per_qubit.append((imp.qubits[reg.indices[j]], (val >> j) & 1))
    s2, _ = imp.builder.calculate_state_with_init(per_qubit)
    s2 = np.asarray(s2)
    if imp.n > n_orig:  # export-time ancillas: must end in |0>
        s2 = s2.reshape(1 << n_orig, -1)
        np.testing.assert_allclose(np.abs(s2[:, 1:]), 0.0, atol=atol)
        s2 = s2[:, 0]
    overlap = abs(np.vdot(s1, s2))
    assert overlap == pytest.approx(1.0, abs=atol), overlap
    return text


def test_add_exports_and_roundtrips():
    b = LocalBuilder(dtype="f64")
    rc = b.register(2)
    ra = b.register(2)
    rb = b.register(3)
    rc2, ra2, rb2 = add(b, rc, ra, rb)
    text = _roundtrip_states_match(
        b, [(rc2, 0), (ra2, 2), (rb2, 1)]
    )
    # pure reversible logic: nothing but ccx/cx
    body = [l for l in text.splitlines()[3:] if l and not l.startswith("//")]
    assert all(l.startswith(("cx", "ccx")) for l in body), body[:5]


def test_add_classical_semantics_through_qasm():
    # a=2, b=1 -> rb' = 3; verify the re-imported stream lands on the
    # correct basis state.
    b = LocalBuilder(dtype="f64")
    rc = b.register(2)
    ra = b.register(2)
    rb = b.register(3)
    rc2, ra2, rb2 = add(b, rc, ra, rb)
    text = to_openqasm(b)
    imp = circuit_from_qasm(text)
    per_qubit = []
    for reg, val in ((rc2, 0), (ra2, 2), (rb2, 1)):
        for j in range(reg.n):
            per_qubit.append((imp.qubits[reg.indices[j]], (val >> j) & 1))
    s, _ = imp.builder.calculate_state_with_init(per_qubit)
    s = np.asarray(s)
    idx = int(np.argmax(np.abs(s)))
    assert abs(s[idx]) == pytest.approx(1.0, abs=1e-9)
    # decode rb from the winning basis index (qubit q = bit n-1-q)
    got_b = 0
    for j, q in enumerate(rb2.indices):
        got_b |= ((idx >> (imp.n - 1 - q)) & 1) << j
    assert got_b == 3


def test_add_mod_exports_and_roundtrips():
    b = LocalBuilder(dtype="f64")
    ra = b.register(2)
    rb = b.register(3)
    rm = b.register(2)
    ra2, rb2, rm2 = add_mod(b, ra, rb, rm)
    # a=2, b=1, m=3 -> b' = (2+1) % 3 = 0
    _roundtrip_states_match(b, [(ra2, 2), (rb2, 1), (rm2, 3)], atol=1e-7)


def test_add_mod_export_is_gate_complete():
    b = LocalBuilder(dtype="f64")
    ra = b.register(2)
    rb = b.register(3)
    rm = b.register(2)
    add_mod(b, ra, rb, rm)
    text = to_openqasm(b)
    assert "exceeds synthesis cap" not in text
    body = [l for l in text.splitlines()[3:] if l and not l.startswith("//")]
    assert len(body) > 500  # a real gate stream, not comments
