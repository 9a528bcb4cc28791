"""Gate application on the amplitude tensor (the hot path).

The reference's engine applies a gate by iterating all 2^n output rows,
gathering the op-local sub-row bits and summing over the op's nonzero columns
(``qip-iterators/src/matrix_ops.rs:62-152``). The TPU-native formulation:
reshape the 2^n amplitudes to a rank-n tensor with axis ``i`` = qubit ``i``
(big-endian — axis 0 is the most significant index bit, exactly the
reference's convention), then

* dense k-qubit gate  -> tensordot over the k target axes (MXU matmul after
  XLA collapses the untouched axes into one contiguous dimension);
* swap op             -> axis transpose (pure data movement, one HBM pass);
* controlled op       -> static slab update: slice the all-controls-|1> slab,
  apply the inner op there only (2^(n-c) amplitudes touched, the same work
  saving the reference gets from ``ControlledOpIterator``'s identity rows);
* sparse op           -> permutation fast path via gather, general case via
  COO scatter-add.

Everything here is jit-traceable with static shapes; under ``jax.jit`` a
whole circuit compiles to one XLA program with gates fused where profitable.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from rustqip_tpu.ops.matrix_ops import (
    ControlOp,
    DenseOp,
    MatrixOp,
    SparseOp,
    SwapOp,
)


def as_tensor(state: jnp.ndarray, n: int) -> jnp.ndarray:
    """View the flat 2^n amplitude vector as a (2,)*n tensor (axis i = qubit i)."""
    return jnp.asarray(state).reshape((2,) * n)


def as_vector(state: jnp.ndarray) -> jnp.ndarray:
    return state.reshape(-1)


def _apply_dense_axes(
    tensor: jnp.ndarray, mat: np.ndarray, axes: Sequence[int]
) -> jnp.ndarray:
    """Contract a (2^k, 2^k) matrix into tensor axes ``axes``.

    Matrix row/col bit j (big-endian) corresponds to axes[j]; tensordot over
    the matrix's input axes leaves the k output axes leading, then moveaxis
    restores qubit positions.
    """
    k = len(axes)
    mat_t = jnp.asarray(mat, dtype=tensor.dtype).reshape((2,) * (2 * k))
    out = jnp.tensordot(mat_t, tensor, axes=(tuple(range(k, 2 * k)), tuple(axes)))
    return jnp.moveaxis(out, tuple(range(k)), tuple(axes))


def _apply_swap_axes(
    tensor: jnp.ndarray, a_axes: Sequence[int], b_axes: Sequence[int]
) -> jnp.ndarray:
    perm = list(range(tensor.ndim))
    for a, b in zip(a_axes, b_axes):
        perm[a], perm[b] = perm[b], perm[a]
    return jnp.transpose(tensor, perm)


def _apply_sparse_axes(
    tensor: jnp.ndarray, op: SparseOp, axes: Sequence[int]
) -> jnp.ndarray:
    """Apply a sparse op: move target axes to front, flatten to (2^k, rest)."""
    k = len(axes)
    dim = 1 << k
    front = jnp.moveaxis(tensor, tuple(axes), tuple(range(k)))
    rest_shape = front.shape[k:]
    flat = front.reshape(dim, -1)
    if op.is_permutation():
        cols = np.array([r[0][0] for r in op.rows], dtype=np.int32)
        vals = np.array([r[0][1] for r in op.rows])
        out = jnp.asarray(vals, dtype=tensor.dtype)[:, None] * flat[cols, :]
    else:
        rows_coo, cols_coo, vals_coo = [], [], []
        for row, entries in enumerate(op.rows):
            for col, val in entries:
                rows_coo.append(row)
                cols_coo.append(col)
                vals_coo.append(val)
        rows_coo = np.array(rows_coo, dtype=np.int32)
        cols_coo = np.array(cols_coo, dtype=np.int32)
        vals_arr = jnp.asarray(np.array(vals_coo), dtype=tensor.dtype)
        gathered = vals_arr[:, None] * flat[cols_coo, :]
        out = jnp.zeros_like(flat).at[rows_coo].add(gathered)
    out = out.reshape((2,) * k + rest_shape)
    return jnp.moveaxis(out, tuple(range(k)), tuple(axes))


def _remap_axes_after_slicing(
    target_axes: Sequence[int], removed_axes: Sequence[int]
) -> Tuple[int, ...]:
    """Axis positions of ``target_axes`` after ``removed_axes`` are indexed away."""
    removed = sorted(removed_axes)
    out = []
    for t in target_axes:
        shift = sum(1 for r in removed if r < t)
        out.append(t - shift)
    return tuple(out)


def _apply_control(tensor: jnp.ndarray, op: ControlOp) -> jnp.ndarray:
    """Slab update: only the all-controls-|1> sub-tensor is touched."""
    ctrl = op.control_indices
    idx = tuple(1 if ax in ctrl else slice(None) for ax in range(tensor.ndim))
    slab = tensor[idx]  # rank n - n_ctrl
    inner_axes = _remap_axes_after_slicing(op.inner.indices, ctrl)
    inner = _reindex_op(op.inner, inner_axes)
    new_slab = _apply_to_tensor(slab, inner)
    return tensor.at[idx].set(new_slab)


def _reindex_op(op: MatrixOp, new_indices: Tuple[int, ...]) -> MatrixOp:
    if isinstance(op, DenseOp):
        return DenseOp(new_indices, op.data)
    if isinstance(op, SparseOp):
        return SparseOp(new_indices, op.rows)
    if isinstance(op, SwapOp):
        return SwapOp(new_indices)
    if isinstance(op, ControlOp):
        n_inner = op.inner.num_indices
        inner = _reindex_op(op.inner, new_indices[op.n_ctrl :][:n_inner])
        return ControlOp(op.n_ctrl, new_indices, inner)
    raise TypeError(f"Unknown op {op!r}")


def _apply_to_tensor(tensor: jnp.ndarray, op: MatrixOp) -> jnp.ndarray:
    if isinstance(op, DenseOp):
        return _apply_dense_axes(tensor, op.data, op.indices)
    if isinstance(op, SwapOp):
        h = op.half
        return _apply_swap_axes(tensor, op.indices[:h], op.indices[h:])
    if isinstance(op, SparseOp):
        return _apply_sparse_axes(tensor, op, op.indices)
    if isinstance(op, ControlOp):
        return _apply_control(tensor, op)
    raise TypeError(f"Unknown op {op!r}")


def apply_op(n: int, op: MatrixOp, state: jnp.ndarray) -> jnp.ndarray:
    """Apply one gate op to a flat 2^n state vector; returns a new vector.

    Semantically identical to the reference's ``apply_op_overwrite``
    (``qip-iterators/src/matrix_ops.rs:127``) with zero offsets; distribution
    is handled by sharding the tensor itself (see ``rustqip_tpu/parallel``),
    not by offset-aware partial applies.
    """
    tensor = as_tensor(state, n)
    return as_vector(_apply_to_tensor(tensor, op))


def apply_ops(n: int, ops: Sequence[MatrixOp], state: jnp.ndarray) -> jnp.ndarray:
    """Apply ops in sequence (the reference's ``apply_ops`` fusion entry,
    matrix_ops.rs:158 — here adjacent-gate fusion happens ahead of time in
    ``fusion.py``; XLA fuses the remaining elementwise work)."""
    tensor = as_tensor(state, n)
    for op in ops:
        tensor = _apply_to_tensor(tensor, op)
    return as_vector(tensor)
