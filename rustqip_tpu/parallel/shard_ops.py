"""Explicit shard-local / collective gate application (shard_map path).

The default sharded executor (``sharded.py``) lets GSPMD partition the
engine code. This module is the hand-scheduled alternative — the direct
TPU-native realization of the amplitude-exchange the reference's
``input_offset``/``output_offset`` seams anticipate but never implement
(qip-iterators/src/matrix_ops.rs:96-104):

* gate on local qubits                -> shard-local engine pass, zero comms;
* dense gate on one global qubit      -> one ``ppermute`` pairing each shard
  with its partner (the two halves of the qubit's amplitude pairs live on
  devices differing in that index bit), then a 2x2 recombination — exactly
  one shard-sized exchange over ICI neighbor links;
* control on global qubits            -> zero communication: devices whose
  index bits satisfy the controls apply the inner op locally, the rest
  pass through (the distributed analog of the reference's
  ControlledOpIterator identity rows).

State convention: flat 2^n amplitudes sharded contiguously over the mesh
axis — the top g = log2(D) qubits are the device index bits.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rustqip_tpu.engine.real_apply import apply_op_ri
from rustqip_tpu.engine.apply import _reindex_op
from rustqip_tpu.errors import CircuitError
from rustqip_tpu.ops.matrix_ops import ControlOp, DenseOp, MatrixOp, SwapOp

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _mesh_geometry(mesh: jax.sharding.Mesh) -> Tuple[str, int, int]:
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    g = d.bit_length() - 1
    if (1 << g) != d:
        raise CircuitError("Mesh size must be a power of two")
    return axis, d, g


def _local_op(op: MatrixOp, g: int) -> MatrixOp:
    """Reindex an op on qubits >= g into the shard-local qubit space."""
    return _reindex_op(op, tuple(q - g for q in op.indices))


def apply_sharded_op(
    mesh: jax.sharding.Mesh, n: int, op: MatrixOp, re: jnp.ndarray, im: jnp.ndarray
) -> Pair:
    """Apply one gate op to a mesh-sharded (re, im) state pair.

    Supports: ops entirely on local qubits; dense/swap ops touching at most
    one global qubit; controls on any mix of global/local qubits with local
    targets. (The GSPMD executor in ``sharded.py`` covers the general case;
    this path exists to pin the collective schedule by hand.)
    """
    axis, d, g = _mesh_geometry(mesh)
    local_n = n - g

    globals_ = tuple(q for q in op.indices if q < g)
    if not globals_:
        lop = _local_op(op, g)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )
        def run_local(re_s, im_s):
            return apply_op_ri(local_n, lop, re_s, im_s)

        return run_local(re, im)

    if isinstance(op, ControlOp) and all(q >= g for q in op.inner.indices):
        # Global controls, local targets: zero-communication select.
        gctrl = tuple(q for q in op.control_indices if q < g)
        lctrl = tuple(q for q in op.control_indices if q >= g)
        inner = op.inner if not lctrl else ControlOp(
            len(lctrl), lctrl + op.inner.indices, op.inner
        )
        linner = _local_op(inner, g)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )
        def run_ctrl(re_s, im_s):
            my = jax.lax.axis_index(axis)
            active = jnp.bool_(True)
            for q in gctrl:
                active = active & (((my >> (g - 1 - q)) & 1) == 1)
            nr, ni = apply_op_ri(local_n, linner, re_s, im_s)
            out_r = jnp.where(active, nr, re_s)
            out_i = jnp.where(active, ni, im_s)
            return out_r, out_i

        return run_ctrl(re, im)

    if isinstance(op, (DenseOp, SwapOp)) and len(globals_) == 1:
        # One global qubit: block-decompose the gate over that qubit's bit
        # and exchange partner shards with a single ppermute.
        from rustqip_tpu.ops.matrix_ops import op_to_dense

        q = globals_[0]
        mask = 1 << (g - 1 - q)
        perm = [(i, i ^ mask) for i in range(d)]
        mat = op_to_dense(op)
        # Reorder so the global qubit is the leading (most significant) bit.
        from rustqip_tpu.ops.matrix_ops import expand_op_matrix

        order = sorted(op.indices, key=lambda x: (x != q, x))
        pos = tuple(order.index(x) for x in op.indices)
        mat_o = expand_op_matrix(mat, pos, len(op.indices))
        k = len(op.indices)
        half = 1 << (k - 1)
        # Blocks over the global bit: U = [[B00, B01], [B10, B11]] where
        # each Bij acts on the remaining (local) qubits.
        blocks = [
            [mat_o[:half, :half], mat_o[:half, half:]],
            [mat_o[half:, :half], mat_o[half:, half:]],
        ]
        rest = tuple(x for x in order if x != q)
        rest_local = tuple(x - g for x in rest)

        def blk_apply(b, re_s, im_s):
            if not np.any(b):
                return jnp.zeros_like(re_s), jnp.zeros_like(im_s)
            if rest_local:
                lop = DenseOp(rest_local, np.ascontiguousarray(b))
                return apply_op_ri(local_n, lop, re_s, im_s)
            val = complex(b[0, 0])
            return re_s * val.real - im_s * val.imag, re_s * val.imag + im_s * val.real

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )
        def run_exchange(re_s, im_s):
            my = jax.lax.axis_index(axis)
            bit = (my & mask) != 0
            pre = jax.lax.ppermute(re_s, axis, perm)
            pim = jax.lax.ppermute(im_s, axis, perm)
            # own shard has global bit = bit; partner has the complement.
            r00, i00 = blk_apply(blocks[0][0], re_s, im_s)
            r01, i01 = blk_apply(blocks[0][1], pre, pim)
            r10, i10 = blk_apply(blocks[1][0], pre, pim)
            r11, i11 = blk_apply(blocks[1][1], re_s, im_s)
            out_r = jnp.where(bit, r10 + r11, r00 + r01)
            out_i = jnp.where(bit, i10 + i11, i00 + i01)
            return out_r, out_i

        return run_exchange(re, im)

    raise NotImplementedError(
        f"shard_ops: op touching global qubits {globals_} not supported on "
        "this path; use the GSPMD executor (rustqip_tpu.parallel.sharded)"
    )


def make_sharded_pair(
    mesh: jax.sharding.Mesh, n: int, initial_index: int = 0, dtype=np.float32
) -> Pair:
    """A basis-state (re, im) pair sharded over the mesh."""
    axis, d, g = _mesh_geometry(mesh)
    sharding = NamedSharding(mesh, P(axis))
    re = jnp.zeros(1 << n, dtype=dtype).at[initial_index].set(1.0)
    im = jnp.zeros(1 << n, dtype=dtype)
    return jax.device_put(re, sharding), jax.device_put(im, sharding)
