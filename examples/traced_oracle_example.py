"""Traced-function oracle at a width no lookup table could embed.

A 22-qubit classical oracle — "which x satisfies (a*x + c) mod 2^22 ==
target?" — applied as ONE FnOp whose entries are computed inside the
compiled program (the lazy-streaming analog of the reference's
``FunctionOpIterator``, qip-iterators/src/iterators/qubit_iterators.rs:223).
A table-based oracle at this width would embed a 4M-entry constant
(`MAX_SPARSE_BITS` caps those at 20 qubits); the traced op embeds nothing.

The demo marks the unique solution with a phase flip, runs a few Grover
rounds, and reads the amplification — small round count for demo speed,
not full sqrt(N) convergence.
"""

import numpy as np

import jax.numpy as jnp

from rustqip_tpu.prelude import LocalBuilder

N = 22
A, C = 2_654_435_761 % (1 << N) | 1, 0x2B7E5  # odd multiplier: bijective
TARGET = 0x155555


def solution() -> int:
    """Classical inverse: x = a^-1 (target - c) mod 2^N."""
    a_inv = pow(A, -1, 1 << N)
    return (a_inv * (TARGET - C)) % (1 << N)


def phase_oracle(row):
    """fn(row) -> (col, val): identity permutation, -1 phase on the
    solution row — a diagonal traced op (row is the op-local big-endian
    index; the register is applied whole, so row == register index)."""
    hit = ((A * row + C) % (1 << N)) == TARGET
    return row, jnp.where(hit, -1.0, 1.0)  # diagonal=True: no gather


def diffusion(b, r):
    r = b.h(r)
    r = b.apply_fn_matrix(
        r,
        lambda row: (row, jnp.where(row == 0, 1.0, -1.0)),
        tag="flip-all-but-zero",
        diagonal=True,
    )
    return b.h(r)


def main():
    b = LocalBuilder(dtype="f32")
    r = b.h(b.register(N))
    for _ in range(3):
        r = b.apply_fn_matrix(
            r, phase_oracle, tag="affine-hit", diagonal=True
        )
        r = diffusion(b, r)
    state, _ = b.calculate_state(seed=0)
    s = np.asarray(state).astype(np.complex128)
    probs = np.abs(s) ** 2

    # The oracle's row index is BIG-endian over the register's qubits;
    # state index == row index when the op spans the whole register.
    x = solution()
    amplified = float(probs[x])
    baseline = 1.0 / (1 << N)
    print(f"solution x = {x:#x}; p = {amplified:.3e} "
          f"({amplified / baseline:.0f}x uniform after 3 rounds)")
    assert amplified > 30 * baseline


if __name__ == "__main__":
    main()
