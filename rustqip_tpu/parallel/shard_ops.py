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
from rustqip_tpu.ops.matrix_ops import (
    ControlOp,
    DenseOp,
    MatrixOp,
    PhaseProductOp,
    SwapOp,
    make_swap_op,
)

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

    Every op class is supported, each with its cheapest hand-picked
    schedule: local ops run shard-local (zero comms); diagonals on any
    qubits run zero-comms (device-index phase gather); dense/swap ops on
    one global qubit cost a single ppermute exchange; controls with global
    controls and local targets cost zero comms (device-index select); the
    general case (multi-global dense, global-target controls) relocates
    global target qubits into free local slots (2 exchanges per qubit).
    The GSPMD executor in ``sharded.py`` is the compiler-scheduled
    alternative; this path pins the collective schedule by hand.
    """
    axis, d, g = _mesh_geometry(mesh)
    local_n = n - g

    globals_ = tuple(q for q in op.indices if q < g)
    if isinstance(op, PhaseProductOp) and globals_:
        # Diagonal ops never exchange amplitudes: a shard's factor depends
        # only on its device-index bits (global qubits) and local bits.
        return _phase_product_sharded(mesh, n, op, re, im)
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

    # General case (multi-global dense ops, global-target controls, ...):
    # relocate each global *target* qubit into a free local slot via a
    # single-exchange swap, apply the op shard-locally, and swap back — the
    # standard distributed-simulator qubit-relocation schedule (2 exchanges
    # per relocated qubit, each one ppermute over ICI). Global *control*
    # qubits never move: the zero-communication device-index select above
    # handles them after remapping.
    return _apply_via_relocation(mesh, n, op, re, im)


def _phase_product_sharded(
    mesh: jax.sharding.Mesh, n: int, op: PhaseProductOp, re: jnp.ndarray,
    im: jnp.ndarray,
) -> Pair:
    """Zero-communication diagonal apply on a sharded state.

    Each term's 2^k factor table is embedded as a constant; every shard
    gathers its own factors from (traced device-index bits | local iota
    bits) — no ppermute, one elementwise pass.
    """
    axis, d, g = _mesh_geometry(mesh)
    local_n = n - g
    terms = []
    for tidx, tdiag in op.terms:
        arr = np.asarray(tdiag, dtype=np.complex128)
        terms.append((tuple(tidx), np.real(arr), np.imag(arr)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    def run_diag(re_s, im_s):
        my = jax.lax.axis_index(axis)
        flat = jnp.arange(re_s.size, dtype=jnp.int32)
        rr, ii = re_s.reshape(-1), im_s.reshape(-1)
        for tidx, tre, tim in terms:
            kt = len(tidx)
            pat = jnp.zeros((), dtype=jnp.int32)
            vec = jnp.zeros_like(flat)
            for t, q in enumerate(tidx):
                shift = kt - 1 - t
                if q < g:
                    pat = pat | (((my >> (g - 1 - q)) & 1) << shift)
                else:
                    vec = vec | (
                        ((flat >> (local_n - 1 - (q - g))) & 1) << shift
                    )
            idx = vec | pat
            fr = jnp.take(jnp.asarray(tre, dtype=rr.dtype), idx)
            fi = jnp.take(jnp.asarray(tim, dtype=rr.dtype), idx)
            rr, ii = rr * fr - ii * fi, rr * fi + ii * fr
        return rr.reshape(re_s.shape), ii.reshape(im_s.shape)

    return run_diag(re, im)


def _remap_op(op: MatrixOp, mapping: dict) -> MatrixOp:
    return _reindex_op(op, tuple(mapping.get(q, q) for q in op.indices))


def _apply_via_relocation(
    mesh: jax.sharding.Mesh, n: int, op: MatrixOp, re: jnp.ndarray,
    im: jnp.ndarray,
) -> Pair:
    _, d, g = _mesh_geometry(mesh)
    if isinstance(op, ControlOp):
        # Global controls stay put (handled by the index select); only the
        # inner target qubits must become local.
        move = [q for q in op.target_indices if q < g]
    else:
        move = [q for q in op.indices if q < g]
    free_local = [q for q in range(g, n) if q not in op.indices]
    if len(free_local) < len(move):
        raise CircuitError(
            f"Cannot relocate {len(move)} global qubits: only "
            f"{len(free_local)} free local qubits (n={n}, mesh={d})"
        )
    # Highest-index free slots: on the engine's (R, C) layout those are
    # column qubits, so the post-swap local apply rides the MXU fast path.
    slots = free_local[-len(move):]
    mapping = {}
    for gq, lq in zip(move, slots):
        mapping[gq] = lq
        mapping[lq] = gq
    swaps = [make_swap_op([gq], [mapping[gq]]) for gq in move]
    for s in swaps:
        re, im = apply_sharded_op(mesh, n, s, re, im)
    re, im = apply_sharded_op(mesh, n, _remap_op(op, mapping), re, im)
    for s in swaps:
        re, im = apply_sharded_op(mesh, n, s, re, im)
    return re, im


def make_sharded_pair(
    mesh: jax.sharding.Mesh, n: int, initial_index: int = 0, dtype=np.float32
) -> Pair:
    """A basis-state (re, im) pair sharded over the mesh."""
    axis, d, g = _mesh_geometry(mesh)
    sharding = NamedSharding(mesh, P(axis))
    re = jnp.zeros(1 << n, dtype=dtype).at[initial_index].set(1.0)
    im = jnp.zeros(1 << n, dtype=dtype)
    return jax.device_put(re, sharding), jax.device_put(im, sharding)
