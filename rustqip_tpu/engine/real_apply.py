"""Real-pair (re, im) gate application — the TPU execution domain.

Complex dtypes on this TPU backend can neither cross the host boundary nor
avoid doubled operand reads in XLA's complex-dot lowering. The compiled
circuit therefore runs entirely on float32/float64 plane pairs: gates,
controls, swaps, and measurements all operate on (re, im) directly, with
the hot low-qubit fused-gate pass dispatched to the Pallas MXU kernel
(``pallas_kernels.c64_low_matmul``). Complex arrays never exist on device.

Shares the host-side planning (_dense_plan block decomposition, tiling
rationale) with ``apply.py``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from rustqip_tpu.engine import pallas_kernels
from rustqip_tpu.engine.apply import (
    _control_mask_2d,
    _dense_plan,
    _geometry,
    _mat_key,
)
from rustqip_tpu.ops.matrix_ops import (
    ControlOp,
    DenseOp,
    MatrixOp,
    PhaseProductOp,
    SparseOp,
    SwapOp,
    op_to_dense,
)

Pair = Tuple[jnp.ndarray, jnp.ndarray]

#: Largest op support materialized dense (mirrors apply.DENSE_CAP).
from rustqip_tpu.engine.apply import DENSE_CAP  # noqa: E402


def _real_block_matmul(xr, xi, B: np.ndarray):
    """x @ B.T on plane pairs, skipping all-zero imaginary parts."""
    bt = np.ascontiguousarray(B.T)
    br = np.real(bt)
    bi = np.imag(bt)
    brj = jnp.asarray(br, dtype=xr.dtype)
    if not np.any(bi):
        return xr @ brj, xi @ brj
    bij = jnp.asarray(bi, dtype=xr.dtype)
    return xr @ brj - xi @ bij, xr @ bij + xi @ brj


def _scalar_mul(xr, xi, val: complex):
    if val == 1:
        return xr, xi
    vr, vi = val.real, val.imag
    if vi == 0:
        return xr * vr, xi * vr
    if vr == 0:
        return -xi * vi, xr * vi
    return xr * vr - xi * vi, xr * vi + xi * vr


def _dense_ri(n: int, indices, mat: np.ndarray, re, im) -> Pair:
    plan = _dense_plan(n, tuple(indices), _mat_key(mat))
    if plan[0] == "low":
        _, B, R, C = plan
        out_r, out_i = pallas_kernels.c64_low_matmul(
            re.reshape(R, C), im.reshape(R, C), B
        )
        return out_r.reshape(-1), out_i.reshape(-1)
    _, blocks, seg_shape, h, R, C = plan
    xr = re.reshape(seg_shape + (C,))
    xi = im.reshape(seg_shape + (C,))
    two_axes = tuple(range(1, 2 * h, 2))
    strip_shape = tuple(
        1 if ax in two_axes else d for ax, d in enumerate(seg_shape)
    ) + (C,)
    strips = {}

    def strip(i: int):
        if i not in strips:
            idx = [slice(None)] * len(seg_shape) + [slice(None)]
            for pos, ax in enumerate(two_axes):
                idx[ax] = (i >> (h - 1 - pos)) & 1
            strips[i] = (
                xr[tuple(idx)].reshape(-1, C),
                xi[tuple(idx)].reshape(-1, C),
            )
        return strips[i]

    outs_r: List = []
    outs_i: List = []
    for hj in range(1 << h):
        acc_r = acc_i = None
        for hi in range(1 << h):
            blk = blocks.get((hj, hi))
            if blk is None:
                continue
            sr, si = strip(hi)
            if blk[0] == "scalar":
                tr, ti = _scalar_mul(sr, si, blk[1])
            else:
                tr, ti = _real_block_matmul(sr, si, blk[1])
            if acc_r is None:
                acc_r, acc_i = tr, ti
            else:
                acc_r, acc_i = acc_r + tr, acc_i + ti
        if acc_r is None:
            z = jnp.zeros_like(strip(0)[0])
            acc_r, acc_i = z, z
        outs_r.append(acc_r.reshape(strip_shape))
        outs_i.append(acc_i.reshape(strip_shape))

    # Reassemble by pairwise concatenation along each bit axis (last bit
    # first). Unlike the round-1 stack+transpose (which materialized an
    # extra full pass: 75 vs 1138 applies/s for H(0) at n=28 on v5e), pure
    # slice/concat chains stay inside one XLA fusion.
    def assemble(outs):
        for j in reversed(range(h)):
            ax = two_axes[j]
            outs = [
                jnp.concatenate((outs[2 * t], outs[2 * t + 1]), axis=ax)
                for t in range(len(outs) // 2)
            ]
        return outs[0].reshape(-1)

    return assemble(outs_r), assemble(outs_i)


def _control_ri(n: int, op: ControlOp, re, im) -> Pair:
    if op.num_indices <= DENSE_CAP:
        return _dense_ri(n, op.indices, op_to_dense(op), re, im)
    _, R, C = _geometry(n)
    in_r, in_i = apply_op_ri(n, op.inner, re, im)
    mask = _control_mask_2d(n, op.control_indices, R, C)
    out_r = jnp.where(mask, in_r.reshape(R, C), re.reshape(R, C)).reshape(-1)
    out_i = jnp.where(mask, in_i.reshape(R, C), im.reshape(R, C)).reshape(-1)
    return out_r, out_i


_SWAP2 = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
    dtype=np.complex128,
)


def _phase_product_ri(n: int, op, re, im) -> Pair:
    from rustqip_tpu.engine.apply import _phase_mul_ri

    _, R, C = _geometry(n)
    out_r, out_i = _phase_mul_ri(n, op, re.reshape(R, C), im.reshape(R, C))
    return out_r.reshape(-1), out_i.reshape(-1)


def apply_op_ri(n: int, op: MatrixOp, re: jnp.ndarray, im: jnp.ndarray) -> Pair:
    """Apply one gate op to the (re, im) planes of a flat 2^n state."""
    from rustqip_tpu.ops.matrix_ops import PhaseProductOp

    if isinstance(op, PhaseProductOp):
        return _phase_product_ri(n, op, re, im)
    if isinstance(op, DenseOp):
        return _dense_ri(n, op.indices, op.data, re, im)
    if isinstance(op, SparseOp):
        if op.num_indices > DENSE_CAP:
            from rustqip_tpu.engine.apply import _sparse_apply_planes

            _, R, C = _geometry(n)
            out_r, out_i = _sparse_apply_planes(
                n, op, re.reshape(R, C), im.reshape(R, C)
            )
            return out_r.reshape(-1), out_i.reshape(-1)
        return _dense_ri(n, op.indices, op_to_dense(op), re, im)
    if isinstance(op, SwapOp):
        h = op.half
        for a, b in zip(op.indices[:h], op.indices[h:]):
            re, im = _dense_ri(n, (a, b), _SWAP2, re, im)
        return re, im
    if isinstance(op, ControlOp):
        return _control_ri(n, op, re, im)
    raise TypeError(f"Unknown op {op!r}")


def _plan_of(n: int, op) -> "tuple | None":
    if isinstance(op, DenseOp):
        return _dense_plan(n, tuple(op.indices), _mat_key(op.data))
    if isinstance(op, PhaseProductOp):
        # A diagonal entirely on column qubits is a (C, C) diagonal matrix:
        # let it join a composed low-qubit matmul run for free.
        from rustqip_tpu.types import MINOR_QUBITS

        m = min(n, MINOR_QUBITS)
        if op.indices and all(q >= n - m for q in op.indices):
            return _dense_plan(
                n, tuple(op.indices), _mat_key(op_to_dense(op))
            )
    return None


def _is_scalar_high(plan) -> bool:
    return (
        plan is not None
        and plan[0] == "blocks"
        and all(b[0] == "scalar" for b in plan[1].values())
    )


def _paired_sweep_ri(n, high_plan, low_B: np.ndarray, re, im) -> Pair:
    """One HBM sweep executing a scalar-block high-qubit op followed by a
    composed low-qubit C x C matmul: strips are combined (VPU) and
    matmul'd (MXU) before reassembly, so the pair costs one read+write of
    the state — measured 194 vs 93 applies/s on the alternating
    H(0)/H(27) pattern at n=28 (v5e)."""
    _, blocks, seg_shape, h, R, C = high_plan
    xr = re.reshape(seg_shape + (C,))
    xi = im.reshape(seg_shape + (C,))
    two_axes = tuple(range(1, 2 * h, 2))
    strip_shape = tuple(
        1 if ax in two_axes else d for ax, d in enumerate(seg_shape)
    ) + (C,)
    strips = {}

    def strip(i: int):
        if i not in strips:
            idx = [slice(None)] * len(seg_shape) + [slice(None)]
            for pos, ax in enumerate(two_axes):
                idx[ax] = (i >> (h - 1 - pos)) & 1
            strips[i] = (
                xr[tuple(idx)].reshape(-1, C),
                xi[tuple(idx)].reshape(-1, C),
            )
        return strips[i]

    outs_r: List = []
    outs_i: List = []
    for hj in range(1 << h):
        acc_r = acc_i = None
        for hi in range(1 << h):
            blk = blocks.get((hj, hi))
            if blk is None:
                continue
            sr, si = strip(hi)
            tr, ti = _scalar_mul(sr, si, blk[1])
            if acc_r is None:
                acc_r, acc_i = tr, ti
            else:
                acc_r, acc_i = acc_r + tr, acc_i + ti
        if acc_r is None:
            z = jnp.zeros_like(strip(0)[0])
            acc_r, acc_i = z, z
        acc_r, acc_i = _real_block_matmul(acc_r, acc_i, low_B)
        outs_r.append(acc_r.reshape(strip_shape))
        outs_i.append(acc_i.reshape(strip_shape))

    def assemble(outs):
        for j in reversed(range(h)):
            ax = two_axes[j]
            outs = [
                jnp.concatenate((outs[2 * t], outs[2 * t + 1]), axis=ax)
                for t in range(len(outs) // 2)
            ]
        return outs[0].reshape(-1)

    return assemble(outs_r), assemble(outs_i)


def apply_ops_ri(
    n: int, ops: Sequence[MatrixOp], re: jnp.ndarray, im: jnp.ndarray
) -> Pair:
    """Apply ops in sequence with sweep pairing: a dense op whose blocks
    are pure scalars (support entirely on row qubits) followed by a run of
    low-qubit dense ops executes as ONE sweep (the strips combine, the
    composed C x C gate matmuls, reassembly happens once). Consecutive
    low-only dense ops also compose into a single matmul ahead of time."""
    ops = list(ops)
    i = 0
    while i < len(ops):
        op = ops[i]
        plan = _plan_of(n, op)
        # Collect a run of consecutive low-only dense ops into one matmul.
        if plan is not None and plan[0] == "low":
            B = plan[1]
            j = i + 1
            while j < len(ops):
                pj = _plan_of(n, ops[j])
                if pj is None or pj[0] != "low":
                    break
                B = pj[1] @ B
                j += 1
            re, im = pallas_kernels.c64_low_matmul(
                re.reshape(plan[2], plan[3]), im.reshape(plan[2], plan[3]), B
            )
            re, im = re.reshape(-1), im.reshape(-1)
            i = j
            continue
        if _is_scalar_high(plan):
            # Fold the following low-only dense run into this sweep.
            B = None
            j = i + 1
            while j < len(ops):
                pj = _plan_of(n, ops[j])
                if pj is None or pj[0] != "low":
                    break
                B = pj[1] if B is None else pj[1] @ B
                j += 1
            if B is not None:
                re, im = _paired_sweep_ri(n, plan, B, re, im)
                i = j
                continue
        re, im = apply_op_ri(n, op, re, im)
        i += 1
    return re, im
