"""Multi-controlled synthesis via the clean-ancilla Toffoli ladder:
export of controlled ops whose control count used to exceed QSD_CAP.
"""

import numpy as np
import pytest

from rustqip_tpu.prelude import LocalBuilder
from rustqip_tpu.qasm import circuit_from_qasm, to_openqasm
from rustqip_tpu.qasm.decompose import (
    gates_to_matrix,
    synthesize_mcu,
)


def _random_unitary(k, seed):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(size=(1 << k, 1 << k))
    u, _ = np.linalg.qr(m)
    return u


def _controlled_embed(U, nc):
    dim_t = U.shape[0]
    dim = dim_t << nc
    full = np.eye(dim, dtype=np.complex128)
    full[dim - dim_t:, dim - dim_t:] = U
    return full


@pytest.mark.parametrize("nc,nt", [(2, 1), (3, 1), (5, 1), (3, 2)])
@pytest.mark.heavy
def test_mcu_ladder_matches_controlled_embed(nc, nt):
    U = _random_unitary(nt, seed=nc * 10 + nt)
    ctrls = list(range(nc))
    tgts = list(range(nc, nc + nt))
    anc = list(range(nc + nt, nc + nt + max(nc - 1, 0)))
    gates = synthesize_mcu(U, ctrls, tgts, anc)
    qubits = ctrls + tgts + anc
    M = gates_to_matrix(gates, qubits)
    # Restrict to the ancilla=|0> subspace (ancillas are the low bits of
    # the matrix index since they are listed last / least significant).
    step = 1 << len(anc)
    S = M[::step, ::step]
    want = _controlled_embed(U, nc)
    np.testing.assert_allclose(S, want, atol=1e-9)
    # Ancillas must return to |0>: all other rows of those columns vanish.
    for r_off in range(1, step):
        np.testing.assert_allclose(M[r_off::step, ::step], 0.0, atol=1e-9)


def test_mcu_requires_enough_ancillas():
    from rustqip_tpu.errors import CircuitError

    U = _random_unitary(1, seed=0)
    with pytest.raises(CircuitError, match="ancillas"):
        synthesize_mcu(U, [0, 1, 2], [3], [4])  # needs 2


def test_export_five_controls_roundtrips():
    # 5 controls + 1 target = 6 <= QSD_CAP would embed densely at nc<4;
    # nc=5 >= 4 takes the ladder. Verify the full exported stream
    # reproduces the state on re-import (ancillas end in |0>).
    U = _random_unitary(1, seed=7)
    b = LocalBuilder()
    c = b.register(5)
    t = b.qubit()
    c = b.h(c)
    cb = b.condition_with(c)
    t = cb.apply_matrix(t, U)
    c = cb.dissolve()
    text = to_openqasm(b)
    assert "qreg anc[4];" in text
    assert "ccx" in text
    assert "exceeds synthesis cap" not in text
    imp = circuit_from_qasm(text)
    assert imp.n == b.n + 4
    s1, _ = b.calculate_state(seed=0)
    s2, _ = imp.builder.calculate_state(seed=0)
    s2 = np.asarray(s2).reshape(1 << b.n, 16)
    np.testing.assert_allclose(
        np.abs(s2[:, 1:]), 0.0, atol=1e-8
    )  # ancillas uncomputed
    overlap = abs(np.vdot(np.asarray(s1), s2[:, 0]))
    assert overlap == pytest.approx(1.0, abs=1e-8)


def test_export_many_controls_beyond_old_cap():
    # 9 controls + 1 target = 10 qubits total: the old dense path refused
    # (> QSD_CAP); the ladder handles it with 8 ancillas.
    U = _random_unitary(1, seed=11)
    b = LocalBuilder()
    c = b.register(9)
    t = b.qubit()
    c = b.x(c)  # controls all |1> so the unitary actually fires
    cb = b.condition_with(c)
    t = cb.apply_matrix(t, U)
    c = cb.dissolve()
    text = to_openqasm(b)
    assert "qreg anc[8];" in text
    assert "exceeds synthesis cap" not in text
    imp = circuit_from_qasm(text)
    s1, _ = b.calculate_state(seed=0)
    s2, _ = imp.builder.calculate_state(seed=0)
    s2 = np.asarray(s2).reshape(1 << b.n, 1 << 8)
    overlap = abs(np.vdot(np.asarray(s1), s2[:, 0]))
    assert overlap == pytest.approx(1.0, abs=1e-8)


def test_export_controlled_two_qubit_target_wide_controls():
    U = _random_unitary(2, seed=3)
    b = LocalBuilder()
    c = b.register(7)
    t = b.register(2)
    c = b.h(c)
    cb = b.condition_with(c)
    t = cb.apply_matrix(t, U)
    c = cb.dissolve()
    text = to_openqasm(b)
    assert "qreg anc[6];" in text
    assert "exceeds synthesis cap" not in text
    imp = circuit_from_qasm(text)
    s1, _ = b.calculate_state(seed=0)
    s2, _ = imp.builder.calculate_state(seed=0)
    s2 = np.asarray(s2).reshape(1 << b.n, 1 << 6)
    np.testing.assert_allclose(np.abs(s2[:, 1:]), 0.0, atol=1e-7)
    overlap = abs(np.vdot(np.asarray(s1), s2[:, 0]))
    assert overlap == pytest.approx(1.0, abs=1e-7)


def test_small_controlled_ops_unchanged():
    # nc<=3 and within cap: no ancilla register appears (dense/special
    # paths keep prior behavior).
    b = LocalBuilder()
    c = b.register(2)
    t = b.qubit()
    c = b.h(c)
    cb = b.condition_with(c)
    t = cb.apply_matrix(t, _random_unitary(1, seed=5))
    c = cb.dissolve()
    text = to_openqasm(b)
    assert "anc" not in text
