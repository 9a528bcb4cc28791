"""Quantum phase estimation (algos/phase_estimation.py)."""

import numpy as np
import pytest

from rustqip_tpu.algos.phase_estimation import estimate_phase, phase_estimate
from rustqip_tpu.errors import CircuitError
from rustqip_tpu.prelude import LocalBuilder


def _prep_one(b, t):
    return b.x(t)


@pytest.mark.parametrize("k", range(8))
def test_dyadic_phase_exact(k):
    # phi = k/8 is exactly representable in 3 phase bits: certainty.
    phi = k / 8
    u = np.diag([1.0, np.exp(2j * np.pi * phi)])
    b = LocalBuilder(dtype="f64")
    got, p = estimate_phase(b, u, 3, prepare=_prep_one, seed=0)
    assert abs(got - phi) < 1e-12
    assert p > 1 - 1e-9


def test_nondyadic_phase_within_resolution():
    phi = 0.3
    u = np.diag([1.0, np.exp(2j * np.pi * phi)])
    b = LocalBuilder(dtype="f64")
    got, _ = estimate_phase(b, u, 5, prepare=_prep_one, seed=3)
    assert abs(got - phi) <= 1 / 32 + 1e-9


def test_two_qubit_unitary_eigenphase():
    # CZ has eigenvalue -1 on |11>: phi = 1/2, measured exactly.
    cz = np.diag([1.0, 1.0, 1.0, -1.0])

    def prep(b, t):
        return b.x(t)  # broadcast X -> |11>

    b = LocalBuilder(dtype="f64")
    got, p = estimate_phase(b, cz, 3, prepare=prep, seed=1)
    assert abs(got - 0.5) < 1e-12
    assert p > 1 - 1e-9


def test_validation():
    b = LocalBuilder()
    with pytest.raises(CircuitError):
        phase_estimate(b, np.ones((3, 3)), 2)
    b = LocalBuilder()
    with pytest.raises(CircuitError):
        phase_estimate(b, np.eye(2), 0)
