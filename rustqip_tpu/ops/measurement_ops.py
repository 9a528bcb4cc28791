"""Measurement semantics on device.

Re-design of ``qip/src/state_ops/measurement_ops.rs``. All functions are
jit-traceable with static ``n``/``indices``; sampled outcomes are traced
values (no host round-trip mid-circuit) and randomness comes from explicit
JAX PRNG keys (replacing the reference's global ``rand::random`` at
measurement_ops.rs:160 with reproducible streams).

Conventions (identical to the reference, measurement_ops.rs:21-22):
qubits are big-endian — ``|abc>`` means q0=a, q1=b, q2=c — and bit ``i`` of a
measured outcome is the value of qubit ``indices[i]``.

Where the reference sums masked subspaces row-by-row (measurement_ops.rs:
65-111) and zeroes mismatching rows serially (:220-268), this computes the
distribution by axis-summing the probability tensor and collapses with a
broadcasted one-hot mask — one fused VPU pass each, and a ``psum`` away from
the sharded version (``rustqip_tpu/parallel``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rustqip_tpu.errors import CircuitError


@dataclass
class MeasuredCondition:
    """Force a specific measurement outcome (ref measurement_ops.rs:181)."""

    measured: int
    prob: Optional[float] = None


def prob_magnitude(state: jnp.ndarray) -> jnp.ndarray:
    """Total |psi|^2 (ref measurement_ops.rs:11)."""
    return jnp.sum(jnp.abs(state) ** 2)


def measure_probs(
    n: int, indices: Sequence[int], state: jnp.ndarray
) -> jnp.ndarray:
    """Probability of every outcome of measuring ``indices``
    (ref measurement_ops.rs:115).

    Returns shape (2^k,) with entry ``m`` = P(qubit indices[i] == bit i of m).
    """
    indices = tuple(int(i) for i in indices)
    k = len(indices)
    if len(set(indices)) != k:
        raise CircuitError("Measurement indices must be unique")
    probs = (jnp.abs(state) ** 2).reshape((2,) * n)
    other_axes = tuple(ax for ax in range(n) if ax not in indices)
    reduced = jnp.sum(probs, axis=other_axes) if other_axes else probs
    # Remaining axes are sorted(indices); outcome bit i = indices[i] means
    # indices[0] is the least significant -> last axis after transpose.
    sorted_ix = sorted(indices)
    perm = tuple(sorted_ix.index(q) for q in reversed(indices))
    return jnp.transpose(reduced, perm).reshape(-1)


def measure_prob(
    n: int, measured, indices: Sequence[int], state: jnp.ndarray
) -> jnp.ndarray:
    """Probability of one specific outcome (ref measurement_ops.rs:44)."""
    return measure_probs(n, indices, state)[measured]


def soft_measure(
    n: int, indices: Sequence[int], state: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """Sample an outcome without collapsing (ref measurement_ops.rs:153).

    The reference walks an inverse CDF over the raw amplitudes against a
    global RNG; here the outcome distribution (identical) is sampled from the
    reduced probability tensor with an explicit key.
    """
    probs = measure_probs(n, indices, state)
    # Normalize against partial magnitudes like the reference does for split
    # vectors; on a full state this is a no-op up to float error.
    return jax.random.categorical(key, jnp.log(probs))


def measure_state(
    n: int,
    indices: Sequence[int],
    measured: Tuple[jnp.ndarray, jnp.ndarray],
    state: jnp.ndarray,
) -> jnp.ndarray:
    """Collapse: zero non-matching amplitudes, scale by 1/sqrt(p)
    (ref measurement_ops.rs:220). ``measured`` is ``(outcome, prob)``; if
    ``prob == 0`` the state is returned unchanged, matching the reference's
    guard (:230)."""
    indices = tuple(int(i) for i in indices)
    outcome, prob = measured
    outcome = jnp.asarray(outcome)
    tensor = state.reshape((2,) * n)
    real_dtype = jnp.real(state).dtype
    mask = jnp.ones((), dtype=real_dtype)
    basis = jnp.arange(2)
    for i, q in enumerate(indices):
        bit = (outcome >> i) & 1
        axis_mask = (basis == bit).astype(real_dtype)
        shape = [1] * n
        shape[q] = 2
        mask = mask * axis_mask.reshape(shape)
    prob = jnp.asarray(prob, dtype=real_dtype)
    scale = jnp.where(prob > 0, jax.lax.rsqrt(jnp.maximum(prob, 1e-300)), 1.0)
    collapsed = tensor * (mask * scale).astype(state.dtype)
    out = jnp.where(prob > 0, collapsed, tensor)
    return out.reshape(-1)


def measure(
    n: int,
    indices: Sequence[int],
    state: jnp.ndarray,
    key: Optional[jax.Array] = None,
    measured: Optional[MeasuredCondition] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample-and-collapse (ref measurement_ops.rs:190).

    Returns ``(outcome, prob, collapsed_state)``. Pass ``measured`` to force
    an outcome (the ``MeasuredCondition`` path), otherwise ``key`` is
    required for sampling.
    """
    probs = measure_probs(n, indices, state)
    if measured is not None:
        outcome = jnp.asarray(measured.measured)
        prob = (
            jnp.asarray(measured.prob)
            if measured.prob is not None
            else probs[outcome]
        )
    else:
        if key is None:
            raise CircuitError("measure() needs a PRNG key unless outcome is forced")
        outcome = jax.random.categorical(key, jnp.log(probs))
        prob = probs[outcome]
    collapsed = measure_state(n, indices, (outcome, prob), state)
    return outcome, prob, collapsed
