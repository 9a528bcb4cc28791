"""Quantum phase estimation: read the eigenphase of a single-qubit
rotation to 6 bits."""

import numpy as np

from rustqip_tpu.algos import estimate_phase
from rustqip_tpu.prelude import LocalBuilder


def main():
    phi = 21 / 64  # exactly representable in 6 phase bits
    u = np.diag([1.0, np.exp(2j * np.pi * phi)])

    b = LocalBuilder(dtype="f64")
    got, prob = estimate_phase(
        b, u, m=6, prepare=lambda bb, t: bb.x(t), seed=0
    )
    print(f"true phase:      {phi}")
    print(f"estimated phase: {got} (certainty {prob:.6f})")
    assert got == phi


if __name__ == "__main__":
    main()
