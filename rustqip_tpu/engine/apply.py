"""Gate application on the amplitude vector (the hot path).

TPU-layout-aware formulation. TPU arrays are tiled (8 sublanes x 128
lanes): any materialized intermediate whose minor dimension is tiny gets
padded up to the tile (a naive ``(2,)*n`` rank-n tensor formulation, or a
``(X, 2)`` reshape, blows memory by up to 64x and chokes the compiler at
n=28). The engine therefore keeps the 2^n amplitudes in a canonical 2D view

    state2d = state.reshape(R, C),  C = 2^m (m = min(n, 7) -> 128 lanes)

and expresses every op in terms that keep minor dimensions large:

* dense gate on the low (column) qubits  -> one (R, C) @ (C, C) matmul on
  the MXU, with the small gate pre-expanded to C x C on the host;
* dense gate touching h high (row) qubits -> the rows are sliced into 2^h
  strips along those bits and recombined as sums of strip @ C x C block
  matmuls (zero blocks skipped, so permutation-like gates cost pure
  copies);
* controlled op with wide support        -> apply the inner op
  unconditionally, then select against the control mask built from row/col
  iotas (one fused elementwise pass; the all-controls-|1> slab gets the
  inner result, everything else keeps the input — the same work shape as
  the reference's ControlledOpIterator identity rows);
* register swap                          -> per-pair 2-qubit permutation
  passes through the same block machinery.

Everything is jit-traceable with static shapes; gate matrices are embedded
as numpy constants at trace time (complex arrays cannot cross the TPU
host<->device boundary at runtime).

Reference semantics being reproduced: ``apply_op_overwrite`` row sweeps
(qip-iterators/src/matrix_ops.rs:62-152) with the same big-endian index
conventions (full_to_sub/sub_to_full, :12-30).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rustqip_tpu.errors import CircuitError
from rustqip_tpu.ops.matrix_ops import (
    ControlOp,
    DenseOp,
    FnOp,
    MatrixOp,
    PhaseProductOp,
    ReflectionOp,
    SparseOp,
    SwapOp,
    expand_op_matrix,
    op_to_dense,
)

from rustqip_tpu.types import MINOR_QUBITS  # noqa: E402  (layout constant)

#: All state-vector matmuls run at true input precision. The TPU default
#: ("default" matmul precision) silently computes f32 dots in bf16 —
#: measured 2.7e-3 relative error per gate pass on v5e, vs 1.4e-7 with
#: HIGHEST — which is unacceptable for amplitude simulation (the reference
#: engine is exact at its dtype). CPU backends ignore this flag.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST

#: Largest op support materialized as a dense matrix on the host.
DENSE_CAP = 10


def _geometry(n: int) -> Tuple[int, int, int]:
    m = min(n, MINOR_QUBITS)
    return m, 1 << (n - m), 1 << m


def as_vector(state: jnp.ndarray) -> jnp.ndarray:
    return state.reshape(-1)


# kept for API compatibility with earlier revisions / debug use
def as_tensor(state: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.asarray(state).reshape((2,) * n)


def _sorted_dense(indices: Tuple[int, ...], mat: np.ndarray):
    """Reorder a gate matrix so its qubit order is ascending."""
    order = tuple(sorted(indices))
    if order == tuple(indices):
        return order, np.asarray(mat)
    k = len(indices)
    positions = tuple(order.index(q) for q in indices)
    return order, expand_op_matrix(np.asarray(mat), positions, k)


def _row_segment_shape(n: int, m: int, high: Sequence[int]) -> Tuple[int, ...]:
    """Row-space shape exposing each high qubit as its own 2-axis.

    Row bit for qubit q is ``(n-m-1-q)``; ascending qubits = descending
    strides, so the shape reads (seg, 2, seg, 2, ..., seg).
    """
    shape: List[int] = []
    prev = 0
    for q in high:
        seg = 1 << (q - prev)
        shape.append(seg)
        shape.append(2)
        prev = q + 1
    shape.append(1 << ((n - m) - prev))
    return tuple(shape)


@lru_cache(maxsize=512)
def _dense_plan(n: int, indices: Tuple[int, ...], mat_key):
    """Host-side plan for a dense apply: expanded numpy blocks + shapes.

    mat_key is (bytes, shape) so plans cache across identical gates.
    """
    mat = np.frombuffer(mat_key[0], dtype=np.complex128).reshape(mat_key[1])
    m, R, C = _geometry(n)
    order, mat_s = _sorted_dense(indices, mat)
    high = [q for q in order if q < n - m]
    low = [q for q in order if q >= n - m]
    lpos = [q - (n - m) for q in low]
    h, l = len(high), len(low)
    dl = 1 << l
    if h == 0:
        return ("low", expand_op_matrix(mat_s, lpos, m), R, C)
    # Block decomposition: U = sum_{hj,hi} |hj><hi| (x) U_low[hj,hi].
    blocks = {}
    for hj in range(1 << h):
        for hi in range(1 << h):
            sub = mat_s[hj * dl : (hj + 1) * dl, hi * dl : (hi + 1) * dl]
            if not np.any(sub):
                continue
            if l == 0:
                val = sub[0, 0]
                blocks[(hj, hi)] = ("scalar", complex(val))
            elif np.array_equal(sub, sub[0, 0] * np.eye(dl)):
                # v * I acts on the column space as a plain scaling —
                # demote to a scalar block (saves a C x C matmul per strip
                # and lets identity-heavy gates, e.g. controlled ops
                # straddling the row/col seam, join scalar mixes).
                blocks[(hj, hi)] = ("scalar", complex(sub[0, 0]))
            else:
                blocks[(hj, hi)] = ("mat", expand_op_matrix(sub, lpos, m))
    seg_shape = _row_segment_shape(n, m, high)
    return ("blocks", blocks, seg_shape, h, R, C)


def _mat_key(mat: np.ndarray):
    arr = np.ascontiguousarray(mat, dtype=np.complex128)
    return (arr.tobytes(), arr.shape)


def _apply_dense(
    n: int, indices: Tuple[int, ...], mat: np.ndarray, state: jnp.ndarray
) -> jnp.ndarray:
    plan = _dense_plan(n, tuple(indices), _mat_key(mat))
    dtype = state.dtype
    if plan[0] == "low":
        _, B, R, C = plan
        s2d = state.reshape(R, C)
        out = jnp.dot(
            s2d, jnp.asarray(B, dtype=dtype).T, precision=MATMUL_PRECISION
        )
        return out.reshape(-1)
    _, blocks, seg_shape, h, R, C = plan
    x = state.reshape(seg_shape + (C,))
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
            strips[i] = x[tuple(idx)].reshape(-1, C)
        return strips[i]

    outs = []
    for hj in range(1 << h):
        acc = None
        for hi in range(1 << h):
            blk = blocks.get((hj, hi))
            if blk is None:
                continue
            xi = strip(hi)
            if blk[0] == "scalar":
                val = blk[1]
                if val == 1:
                    term = xi
                else:
                    term = xi * jnp.asarray(np.array(val), dtype=dtype)
            else:
                term = jnp.dot(
                    xi,
                    jnp.asarray(blk[1], dtype=dtype).T,
                    precision=MATMUL_PRECISION,
                )
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(strip(0))
        outs.append(acc.reshape(strip_shape))
    # Reassemble by pairwise concatenation along each bit axis (last bit
    # first): slice/concat chains stay inside one XLA fusion, unlike the
    # round-1 stack+transpose which cost an extra full HBM pass (measured
    # 75 vs 1138 applies/s for H(0) at n=28 on v5e).
    for j in reversed(range(h)):
        ax = two_axes[j]
        outs = [
            jnp.concatenate((outs[2 * t], outs[2 * t + 1]), axis=ax)
            for t in range(len(outs) // 2)
        ]
    return outs[0].reshape(-1)


def _walsh_coeffs(tidx, d: np.ndarray):
    """Monomial (Moebius) decomposition of a diagonal's complex log:
    log d (b_1..b_k) = sum_S c_S prod_{q in S} b_q, split into
    (angle_coeffs, logmag_coeffs).

    Unitary diagonals have unit-modulus entries (pure phase); non-unitary
    but nonzero diagonals additionally carry a log-magnitude component —
    the reference applies non-unitary matrices faithfully
    (qip-iterators/src/matrix_ops.rs:127 has no unitarity check), so the
    fused TPU path must too. ``logmag_coeffs`` is None when all entries are
    unit modulus (the common case — skips an exp pass). Entries of modulus
    zero cannot be log-decomposed; callers must not build PhaseProductOps
    from diagonals containing zeros (fusion.py gates on this).
    """
    kt = len(tidx)
    dd = np.asarray(d, dtype=np.complex128)
    mags = np.abs(dd)
    if np.any(mags == 0):
        raise CircuitError(
            "PhaseProductOp terms must have nonzero diagonal entries"
        )
    phi = np.angle(dd).copy()
    unit = bool(np.allclose(mags, 1.0, rtol=0, atol=1e-14))
    lm = None if unit else np.log(mags)

    # Moebius transform over the subset lattice (bit j of the entry index is
    # qubit tidx[j], big-endian: entry bit (kt-1-j) <-> tidx[j]).
    def moebius(v):
        v = v.copy()
        for j in range(kt):
            stride = 1 << (kt - 1 - j)
            for base in range(1 << kt):
                if base & stride:
                    v[base] -= v[base & ~stride]
        out = {}
        for mask in range(1 << kt):
            c = v[mask]
            if abs(c) < 1e-15:
                continue
            subset = tuple(
                tidx[j] for j in range(kt) if (mask >> (kt - 1 - j)) & 1
            )
            out[subset] = out.get(subset, 0.0) + float(c)
        return out

    return moebius(phi), (moebius(lm) if lm is not None else None)


@lru_cache(maxsize=256)
def _phase_plan(n: int, terms):
    """Host plan for a PhaseProductOp: monomials split into row-only,
    col-only, constant, and mixed (row-subset, col-subset, coeff) groups —
    one group set for the phase angle, an optional second for the
    log-magnitude of non-unit-modulus diagonals."""
    m, R, C = _geometry(n)
    n_m = n - m

    def empty():
        return [0.0, {}, {}, []]  # const, row_monos, col_monos, mixed

    angle_g = empty()
    mag_g = empty()
    has_mag = False

    def add(groups, subset, c):
        rq = tuple(q for q in subset if q < n_m)
        cq = tuple(q for q in subset if q >= n_m)
        if not subset:
            groups[0] += c
        elif not cq:
            groups[1][rq] = groups[1].get(rq, 0.0) + c
        elif not rq:
            groups[2][cq] = groups[2].get(cq, 0.0) + c
        else:
            groups[3].append((rq, cq, c))

    for tidx, tdiag in terms:
        acoef, mcoef = _walsh_coeffs(tidx, np.asarray(tdiag))
        for subset, c in acoef.items():
            add(angle_g, subset, c)
        if mcoef is not None:
            has_mag = True
            for subset, c in mcoef.items():
                add(mag_g, subset, c)

    def freeze(g):
        return (g[0], tuple(g[1].items()), tuple(g[2].items()), tuple(g[3]))

    return freeze(angle_g), (freeze(mag_g) if has_mag else None)


def _iota_bit_helpers(n: int, dtype):
    """(rows, cols, row_bit, col_bit, mono) closures over the (R, C)
    iotas — the single definition of the row/col bit-index convention used
    by every monomial evaluator below."""
    m, R, C = _geometry(n)
    n_m = n - m
    rows = jnp.arange(R, dtype=jnp.int32)
    cols = jnp.arange(C, dtype=jnp.int32)

    def row_bit(q):
        return ((rows >> (n_m - 1 - q)) & 1).astype(dtype)

    def col_bit(q):
        return ((cols >> (n - 1 - q)) & 1).astype(dtype)

    def mono(bits, coeff=1.0):
        acc = None
        for b in bits:
            acc = b if acc is None else acc * b
        return acc * coeff

    return rows, cols, row_bit, col_bit, mono


def _sep_monomial_vals(n: int, groups, dtype):
    """(row_val (R,), col_val (C,), mixed) from one monomial group set."""
    const, row_monos, col_monos, mixed = groups
    m, R, C = _geometry(n)
    _, _, row_bit, col_bit, mono = _iota_bit_helpers(n, dtype)
    row_val = jnp.full((R,), const, dtype=dtype)
    for rq, c in row_monos:
        row_val = row_val + mono([row_bit(q) for q in rq], c)
    col_val = jnp.zeros((C,), dtype=dtype)
    for cq, c in col_monos:
        col_val = col_val + mono([col_bit(q) for q in cq], c)
    return row_val, col_val, mixed


def _eval_bilinear_2d(n: int, groups, dtype) -> jnp.ndarray:
    """Evaluate one monomial group set over the (R, C) view.

    Row/col monomials evaluate on 1-D iotas; genuinely mixed monomials form
    one (R, M) @ (M, C) MXU matmul — the whole fused diagonal run costs one
    transcendental pass over the state regardless of term count.
    """
    _, _, row_bit, col_bit, mono = _iota_bit_helpers(n, dtype)
    row_val, col_val, mixed = _sep_monomial_vals(n, groups, dtype)
    val = row_val[:, None] + col_val[None, :]
    if mixed:
        U = jnp.stack([mono([row_bit(q) for q in rq]) for rq, _, _ in mixed], axis=1)
        V = jnp.stack(
            [mono([col_bit(q) for q in cq], c) for _, cq, c in mixed], axis=1
        )
        val = val + jnp.dot(U, V.T, precision=MATMUL_PRECISION)
    return val


#: Mixed row x col monomial count above which the phase factor falls back
#: to the bilinear (R, M) @ (M, C) matmul form. Below it, per-monomial
#: where-selects stay elementwise and fuse into the state multiply (the
#: matmul materializes a full (R, C) angle plane — an extra HBM pass).
MIXED_SELECT_CAP = 24


def _phase_mul_ri(n: int, op, r2d: jnp.ndarray, i2d: jnp.ndarray):
    """Multiply (re, im) planes by a PhaseProductOp's diagonal, elementwise.

    Row-only and col-only monomial groups evaluate on 1-D iotas (cheap
    transcendentals on R- and C-vectors, broadcast into the multiply);
    each genuinely mixed monomial becomes a bool-mask select of a constant
    phase. Everything is elementwise over (R, C), so XLA fuses the whole
    diagonal run — and any adjacent elementwise gate pass — into one HBM
    sweep."""
    dtype = r2d.dtype
    m, R, C = _geometry(n)
    n_m = n - m
    angle_g, mag_g = _phase_plan(n, op.terms)
    mixed = angle_g[3]
    rows, cols, _, _, _ = _iota_bit_helpers(n, dtype)

    if mag_g is not None or len(mixed) > MIXED_SELECT_CAP:
        # General/bilinear path: full (R, C) angle (+ magnitude) planes.
        angle = _eval_bilinear_2d(n, angle_g, dtype)
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        if mag_g is not None:
            mag = jnp.exp(_eval_bilinear_2d(n, mag_g, dtype))
            ca, sa = ca * mag, sa * mag
        return r2d * ca - i2d * sa, r2d * sa + i2d * ca

    row_angle, col_angle, mixed = _sep_monomial_vals(n, angle_g, dtype)

    # separable part: (e^{i row} outer e^{i col}) via two broadcast muls
    rc, rs = jnp.cos(row_angle)[:, None], jnp.sin(row_angle)[:, None]
    out_r = r2d * rc - i2d * rs
    out_i = r2d * rs + i2d * rc
    cc, cs = jnp.cos(col_angle)[None, :], jnp.sin(col_angle)[None, :]
    out_r, out_i = out_r * cc - out_i * cs, out_r * cs + out_i * cc

    for rq, cq, c in mixed:
        rmask = jnp.ones((R,), dtype=bool)
        for q in rq:
            rmask = rmask & (((rows >> (n_m - 1 - q)) & 1) == 1)
        cmask = jnp.ones((C,), dtype=bool)
        for q in cq:
            cmask = cmask & (((cols >> (n - 1 - q)) & 1) == 1)
        mask = rmask[:, None] & cmask[None, :]
        pc = np.float64(np.cos(c)).astype(np.dtype(dtype))
        ps = np.float64(np.sin(c)).astype(np.dtype(dtype))
        out_r, out_i = (
            jnp.where(mask, out_r * pc - out_i * ps, out_r),
            jnp.where(mask, out_r * ps + out_i * pc, out_i),
        )
    return out_r, out_i


def _apply_phase_product_2d(n: int, op, s2d: jnp.ndarray) -> jnp.ndarray:
    """Complex-path PhaseProductOp: one fused elementwise pass."""
    rdtype = jnp.real(s2d).dtype
    out_r, out_i = _phase_mul_ri(
        n, op, jnp.real(s2d).astype(rdtype), jnp.imag(s2d).astype(rdtype)
    )
    return jax.lax.complex(out_r, out_i).astype(s2d.dtype)


@lru_cache(maxsize=64)
def _sparse_plan(n: int, indices: Tuple[int, ...], rows):
    """Host plan for a gather-based sparse apply of ANY width.

    The reference streams sparse ops of any width lazily
    (``SparseMatrixOpIterator``, qip-iterators/src/iterators/
    qubit_iterators.rs:60); the TPU-native equivalent is columnar: pad each
    sub-row's entries to the max nonzeros-per-row ``T``, then the apply is
    ``T`` gather+multiply-accumulate passes over the (R, C) state view —
    one pass for permutation/oracle ops. All per-row tables (2^k entries)
    embed as program constants; the (R, C)-shaped source coordinates come
    from row/col iota bit arithmetic, never a flat 2^n index (int32-safe at
    any n).
    """
    k = len(indices)
    m, R, C = _geometry(n)
    n_m = n - m
    dim = 1 << k
    max_nnz = max(len(r) for r in rows)
    cols_t = np.zeros((max_nnz, dim), np.int32)
    vre_t = np.zeros((max_nnz, dim), np.float64)
    vim_t = np.zeros((max_nnz, dim), np.float64)
    for row, entries in enumerate(rows):
        for t, (c, v) in enumerate(entries):
            cols_t[t, row] = c
            vre_t[t, row] = v.real
            vim_t[t, row] = v.imag
    row_mask = col_mask = 0
    for j, q in enumerate(indices):
        if q < n_m:
            row_mask |= 1 << (n_m - 1 - q)
        else:
            col_mask |= 1 << (n - 1 - q)
    s = np.arange(dim, dtype=np.int64)
    spread_row = np.zeros(dim, np.int32)
    spread_col = np.zeros(dim, np.int32)
    for j, q in enumerate(indices):
        bit = ((s >> (k - 1 - j)) & 1).astype(np.int64)
        if q < n_m:
            spread_row |= (bit << (n_m - 1 - q)).astype(np.int32)
        else:
            spread_col |= (bit << (n - 1 - q)).astype(np.int32)
    return (
        k, max_nnz, cols_t, vre_t, vim_t,
        row_mask, col_mask, spread_row, spread_col,
    )


def _sparse_apply_planes(n: int, op, re2d: jnp.ndarray, im2d: jnp.ndarray):
    """Gather-based sparse apply on (R, C) float planes (both backends)."""
    plan = _sparse_plan(n, tuple(op.indices), op.rows)
    (k, max_nnz, cols_t, vre_t, vim_t,
     row_mask, col_mask, spread_row, spread_col) = plan
    m, R, C = _geometry(n)
    n_m = n - m
    rows = jnp.arange(R, dtype=jnp.int32)
    cols = jnp.arange(C, dtype=jnp.int32)
    rowpat = jnp.zeros((R,), jnp.int32)
    colpat = jnp.zeros((C,), jnp.int32)
    for j, q in enumerate(op.indices):
        sh = k - 1 - j
        if q < n_m:
            rowpat = rowpat | (((rows >> (n_m - 1 - q)) & 1) << sh)
        else:
            colpat = colpat | (((cols >> (n - 1 - q)) & 1) << sh)
    pat = rowpat[:, None] | colpat[None, :]
    base_row = (rows & np.int32(~row_mask))[:, None]
    base_col = (cols & np.int32(~col_mask))[None, :]
    srj = jnp.asarray(spread_row)
    scj = jnp.asarray(spread_col)
    rdtype = re2d.dtype
    out_r = out_i = None
    for t in range(max_nnz):
        sc = jnp.take(jnp.asarray(cols_t[t]), pat)
        src_row = base_row | jnp.take(srj, sc)
        src_col = base_col | jnp.take(scj, sc)
        gr = re2d[src_row, src_col]
        gi = im2d[src_row, src_col]
        vr = jnp.take(jnp.asarray(vre_t[t], dtype=rdtype), pat)
        tr, ti = gr * vr, gi * vr
        if np.any(vim_t[t]):
            vi = jnp.take(jnp.asarray(vim_t[t], dtype=rdtype), pat)
            tr, ti = tr - gi * vi, ti + gr * vi
        out_r = tr if out_r is None else out_r + tr
        out_i = ti if out_i is None else out_i + ti
    return out_r, out_i


def _fn_apply_planes(n: int, op, re2d: jnp.ndarray, im2d: jnp.ndarray):
    """Traced-function oracle apply on (R, C) float planes: ONE gather
    pass whose source coordinates and values are computed IN-TRACE from
    iota bit arithmetic — nothing embeds, any width (the asymptotic
    parity with the reference's lazy FunctionOpIterator,
    qubit_iterators.rs:223; cf. the table-embedding sparse path above)."""
    k = op.num_indices
    m, R, C = _geometry(n)
    n_m = n - m
    rows = jnp.arange(R, dtype=jnp.int32)
    cols = jnp.arange(C, dtype=jnp.int32)
    rowpat = jnp.zeros((R,), jnp.int32)
    colpat = jnp.zeros((C,), jnp.int32)
    row_mask = col_mask = 0
    for j, q in enumerate(op.indices):
        sh = k - 1 - j
        if q < n_m:
            rowpat = rowpat | (((rows >> (n_m - 1 - q)) & 1) << sh)
            row_mask |= 1 << (n_m - 1 - q)
        else:
            colpat = colpat | (((cols >> (n - 1 - q)) & 1) << sh)
            col_mask |= 1 << (n - 1 - q)
    pat = rowpat[:, None] | colpat[None, :]  # local ROW index per position
    sc, val = op.fn(pat)  # traced: column index + value, elementwise
    if op.diagonal:
        # Declared phase oracle (col == row): no gather at all — one
        # elementwise multiply, fused by XLA into neighboring passes.
        rdtype = re2d.dtype
        val = jnp.asarray(val)
        if jnp.iscomplexobj(val):
            vr = jnp.real(val).astype(rdtype)
            vi = jnp.imag(val).astype(rdtype)
            if op.conjugated:
                vi = -vi
            return re2d * vr - im2d * vi, im2d * vr + re2d * vi
        vr = val.astype(rdtype)
        return re2d * vr, im2d * vr
    row_off = jnp.zeros((), jnp.int32)
    col_off = jnp.zeros((), jnp.int32)
    for j, q in enumerate(op.indices):
        bit = (sc >> (k - 1 - j)) & 1
        if q < n_m:
            row_off = row_off | (bit << (n_m - 1 - q))
        else:
            col_off = col_off | (bit << (n - 1 - q))
    src_row = (rows & np.int32(~row_mask))[:, None] | row_off
    src_col = (cols & np.int32(~col_mask))[None, :] | col_off
    gr = re2d[src_row, src_col]
    gi = im2d[src_row, src_col]
    rdtype = re2d.dtype
    val = jnp.asarray(val)
    if jnp.iscomplexobj(val):
        vr = jnp.real(val).astype(rdtype)
        vi = jnp.imag(val).astype(rdtype)
        if op.conjugated:
            vi = -vi
        return gr * vr - gi * vi, gi * vr + gr * vi
    vr = val.astype(rdtype)
    return gr * vr, gi * vr


def _apply_fn_wide(n: int, op, state: jnp.ndarray) -> jnp.ndarray:
    """Complex-path wrapper over the traced-function gather apply."""
    _, R, C = _geometry(n)
    s2d = state.reshape(R, C)
    out_r, out_i = _fn_apply_planes(n, op, jnp.real(s2d), jnp.imag(s2d))
    return jax.lax.complex(out_r, out_i).astype(state.dtype).reshape(-1)


def _apply_sparse_wide(n: int, op, state: jnp.ndarray) -> jnp.ndarray:
    """Complex-path wrapper over the gather sparse apply."""
    _, R, C = _geometry(n)
    s2d = state.reshape(R, C)
    out_r, out_i = _sparse_apply_planes(
        n, op, jnp.real(s2d), jnp.imag(s2d)
    )
    return jax.lax.complex(out_r, out_i).astype(state.dtype).reshape(-1)


def _control_mask_2d(n: int, ctrl: Sequence[int], R: int, C: int) -> jnp.ndarray:
    """Bool (R, C) mask: True where all control qubits are |1>.

    Built from row/col iotas — no big host constants, fuses into the
    consuming select.
    """
    n_m = R.bit_length() - 1  # number of row-side qubits
    rows = jnp.arange(R, dtype=jnp.int32)
    cols = jnp.arange(C, dtype=jnp.int32)
    mask_r = jnp.ones((R,), dtype=bool)
    mask_c = jnp.ones((C,), dtype=bool)
    for q in ctrl:
        if q < n_m:
            mask_r = mask_r & (((rows >> (n_m - 1 - q)) & 1) == 1)
        else:
            mask_c = mask_c & (((cols >> (n - 1 - q)) & 1) == 1)
    return mask_r[:, None] & mask_c[None, :]


def _apply_control(n: int, op: ControlOp, state: jnp.ndarray) -> jnp.ndarray:
    if op.num_indices <= DENSE_CAP:
        # Small support: fold into one dense apply (one pass).
        return _apply_dense(n, op.indices, op_to_dense(op), state)
    _, R, C = _geometry(n)
    inner_applied = _apply_to_state(n, op.inner, state).reshape(R, C)
    s2d = state.reshape(R, C)
    mask = _control_mask_2d(n, op.control_indices, R, C)
    return jnp.where(mask, inner_applied, s2d).reshape(-1)


def _row_relabel_src(n: int, layout) -> jnp.ndarray:
    """(R,) gather indices realizing a row-bit relabeling: output row slot
    s holds the input bit at row position ``layout[s]``."""
    m, R, C = _geometry(n)
    n_m = n - m
    rows = jnp.arange(R, dtype=jnp.int32)
    src = jnp.zeros_like(rows)
    for s, q in enumerate(layout):
        src = src | (((rows >> (n_m - 1 - s)) & 1) << (n_m - 1 - q))
    return src


def _col_relabel_table(n: int, layout) -> np.ndarray:
    """(C,) host gather table: output col slot s holds the input bit at
    col position ``layout[s]`` (positions are qubit ids >= n-m)."""
    m, R, C = _geometry(n)
    cols = np.arange(C)
    src = np.zeros(C, dtype=np.int32)
    for s, q in enumerate(layout):
        bit = (cols >> (m - 1 - s)) & 1
        src |= (bit << (n - 1 - q)).astype(np.int32)
    return src


def _split_swap_pairs(n: int, op: SwapOp):
    """(cross_pairs, same_pairs): cross pairs exchange a row qubit with a
    column qubit; same pairs stay within one side."""
    m, _, _ = _geometry(n)
    n_m = n - m
    cross, same = [], []
    for a, b in zip(op.indices[: op.half], op.indices[op.half :]):
        lo, hi = (a, b) if a < b else (b, a)
        if lo < n_m <= hi:
            cross.append((lo, hi))
        else:
            same.append((lo, hi))
    return cross, same


def _cross_swap_planes(n: int, cross, planes):
    """Exchange k (row qubit, col qubit) pairs in one staged pass:
    col-relabel, block transpose (top-k row bits <-> low-k col bits),
    col-relabel back — measured ~3 ms for the transpose at n=28 (vs ~11 ms
    per per-pair dense pass). Requires the cross row qubits to be exactly
    the top k rows (QFT bit reversal's shape); the caller falls back to
    per-pair dense otherwise."""
    m, R, C = _geometry(n)
    n_m = n - m
    cross = sorted(cross)
    k = len(cross)
    rows_q = [a for a, _ in cross]
    assert rows_q == list(range(k))
    # The transpose exchanges row slot t (qubit t = pair t's row side, by
    # the applicability precondition) with col slot n-k+t. Stage pair t's
    # col bit b_t at slot n-k+t, parking the others before them.
    cols_all = list(range(n_m, n))
    staged = [b for _, b in cross]
    parked = [q for q in cols_all if q not in staged]
    layout1 = parked + staged      # col slot s holds bit layout1[s]
    slot_of = {q: n_m + s for s, q in enumerate(layout1)}
    # After the transpose: slot n-k+t holds the row-sourced bit that must
    # land at position b_t; parked bits must return home.
    layout2 = []
    for s in range(m):
        p = n_m + s
        if p in staged:
            t = staged.index(p)
            layout2.append(n - k + t)
        else:
            layout2.append(slot_of[p])
    t1 = jnp.asarray(_col_relabel_table(n, layout1))
    t2 = jnp.asarray(_col_relabel_table(n, layout2))
    outs = []
    for x in planes:
        x = jnp.take(x, t1, axis=1)
        x = (
            x.reshape(1 << k, R >> k, C >> k, 1 << k)
            .transpose(3, 1, 2, 0)
            .reshape(R, C)
        )
        outs.append(jnp.take(x, t2, axis=1))
    return outs


def _cross_swap_applicable(n: int, cross) -> bool:
    m, _, _ = _geometry(n)
    n_m = n - m
    k = len(cross)
    if k < 2 or k > min(n_m, m):
        return False
    return sorted(a for a, _ in cross) == list(range(k))


def _split_same_pairs(n: int, same):
    """(row_pairs, col_pairs, mixed): same-side pairs by side. ``mixed``
    collects row<->col pairs routed here when the staged cross transpose
    is inapplicable (they fall back to dense passes)."""
    m, _, _ = _geometry(n)
    n_m = n - m
    rowp, colp, mixed = [], [], []
    for a, b in same:
        if b < n_m:
            rowp.append((a, b))
        elif a >= n_m:
            colp.append((a, b))
        else:
            mixed.append((a, b))
    return rowp, colp, mixed


#: Largest contiguous field reversed by one bit-axis transpose (rank =
#: span + 3; the compiler chokes somewhere past rank ~20).
_FIELD_REVERSAL_MAX_SPAN = 16


def _row_swap_planes(n: int, pairs, planes):
    """Row-row swap pairs as structured axis transposes (pure copies, no
    matmul): each pair is a rank-6 reshape + transpose of its two 2-axes.
    The minor C=2^m lanes dimension stays intact, so XLA lowers each to a
    tiled block copy (~bandwidth) instead of the dense strip pass.

    When the pairs form the reversal of one contiguous row-bit field —
    QFT's bit reversal restricted to row qubits, reference
    qip/src/qfft.rs:29-37 — the whole set collapses into ONE transpose
    with per-bit axes in reversed order. Measured for QFT-28's 7 row
    pairs (both planes, v5e): 37.8 ms for the single rank-16 transpose
    vs 78 ms chained pair transposes vs 125 ms dense passes; gather
    formulations (rev_k index takes) are 512-byte-granularity
    pathological (172+ ms) and are avoided entirely.
    """
    m, R, C = _geometry(n)
    n_m = n - m
    fused = _row_field_reversal(n_m, pairs)
    outs = []
    for x in planes:
        x = x.reshape(R, C)
        if fused is not None:
            pre, span = fused
            post = R // (pre << span)
            shape = (pre,) + (2,) * span + (post, C)
            perm = (0,) + tuple(range(span, 0, -1)) + (span + 1, span + 2)
            x = x.reshape(shape).transpose(perm).reshape(R, C)
        else:
            for a, b in pairs:
                pa, pb = n_m - 1 - a, n_m - 1 - b  # a < b -> pa > pb
                shape = (
                    R >> (pa + 1), 2, 1 << (pa - pb - 1), 2, 1 << pb, C,
                )
                x = (
                    x.reshape(shape)
                    .transpose(0, 3, 2, 1, 4, 5)
                    .reshape(R, C)
                )
        outs.append(x)
    return outs


def _row_field_reversal(n_m: int, pairs):
    """Detect pairs reversing one contiguous row-bit field; returns
    (pre, span) for the one-transpose path or None. ``n_m`` is the
    row-qubit count — every pair qubit must be a row qubit."""
    if len(pairs) < 2:
        return None
    qubits = sorted(q for p in pairs for q in p)
    lo, hi = qubits[0], qubits[-1]
    if hi >= n_m:
        return None
    span = hi - lo + 1
    if span > _FIELD_REVERSAL_MAX_SPAN:
        return None
    want = {(lo + t, hi - t) for t in range(span // 2)}
    if {tuple(sorted(p)) for p in pairs} != want:
        return None
    pre = 1 << lo  # qubit lo = row bit n_m-1-lo; higher qubits are "pre"
    return pre, span


def _col_swap_planes(n: int, pairs, planes):
    """Col-col swap pairs as ONE lane relabel (a 128-entry gather along
    the minor axis) — exact and cheaper than the C x C permutation
    matmul a dense pass would issue."""
    m, R, C = _geometry(n)
    n_m = n - m
    layout = list(range(n_m, n))
    for a, b in pairs:
        sa, sb = a - n_m, b - n_m
        layout[sa], layout[sb] = layout[sb], layout[sa]
    t = jnp.asarray(_col_relabel_table(n, layout))
    return [jnp.take(x.reshape(R, C), t, axis=1) for x in planes]


_SWAP2_MAT = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
    dtype=np.complex128,
)


def _swap_schedule(n: int, op: SwapOp):
    """Split a SwapOp into (cross, row_pairs, col_pairs, dense_pairs):
    cross goes to the staged block transpose (or into dense_pairs when
    inapplicable), row/col pairs to their structured fast paths."""
    cross, same = _split_swap_pairs(n, op)
    if not _cross_swap_applicable(n, cross):
        same = same + cross
        cross = []
    rowp, colp, mixed = _split_same_pairs(n, same)
    return cross, rowp, colp, mixed


def _apply_swap(n: int, op: SwapOp, state: jnp.ndarray) -> jnp.ndarray:
    cross, rowp, colp, mixed = _swap_schedule(n, op)
    _, R, C = _geometry(n)
    if cross:
        (state2d,) = _cross_swap_planes(n, cross, [state.reshape(R, C)])
        state = state2d.reshape(-1)
    if rowp:
        (state2d,) = _row_swap_planes(n, rowp, [state])
        state = state2d.reshape(-1)
    if colp:
        (state2d,) = _col_swap_planes(n, colp, [state])
        state = state2d.reshape(-1)
    # Leftover row<->col pairs outside the staged-transpose shape: per-pair
    # dense applies. (A full (R, C) permutation gather measured 7.5 s for
    # QFT-28's bit reversal — pathological HBM access — vs ~11 ms per
    # dense pair pass.)
    for a, b in mixed:
        state = _apply_dense(n, (a, b), _SWAP2_MAT, state)
    return state


def _reflection_plan(n: int, indices: Tuple[int, ...]):
    """Host-side plan for one reflection pass on the (R, C) view: the
    optional (C, C) 0/1 lane-sum matrix (sums over the op's column-qubit
    bits, broadcasting back within each lane group — ONE MXU matmul) and
    the row-axis runs-reshape (sum over the op's row-qubit bits as a
    keepdims reduction over contiguous bit runs; rank = #runs + 1 and the
    minor dim stays C, so the (8,128) tiling never pads)."""
    m, _R, C = _geometry(n)
    n_m = n - m
    col_q = [q for q in indices if q >= n_m]
    row_q = set(q for q in indices if q < n_m)
    B = None
    if col_q:
        drop = 0
        for q in col_q:
            drop |= 1 << (n - 1 - q)
        keep = (C - 1) & ~drop
        cols = np.arange(C)
        B = ((cols[:, None] & keep) == (cols[None, :] & keep)).astype(
            np.float64
        )
    shape = axes = None
    if row_q:
        runs: List[List] = []  # [bit-run length, in-op?]
        for pos in range(n_m):  # MSB-first: row-axis position of qubit q is q
            member = pos in row_q
            if runs and runs[-1][1] == member:
                runs[-1][0] += 1
            else:
                runs.append([1, member])
        shape = tuple(1 << L for L, _ in runs) + (C,)
        axes = tuple(i for i, (_, mem) in enumerate(runs) if mem)
    return B, shape, axes


def _reflection_sum_2d(n: int, indices, x2d: jnp.ndarray):
    """``(summed, runs_shape)``: sum of ``x2d`` over the given qubit bits,
    broadcast within lanes (col bits, via one MXU matmul against a 0/1
    matrix) and keepdims-reduced over row bits (``runs_shape`` is the view
    the caller must take of a full plane to broadcast against it; None if
    no row bits are involved and ``summed`` is already (R, C))."""
    B, shape, axes = _reflection_plan(n, tuple(indices))
    s = x2d
    if B is not None:
        s = jnp.matmul(
            s, jnp.asarray(B, dtype=x2d.dtype), precision=MATMUL_PRECISION
        )
    if shape is not None:
        s = jnp.sum(s.reshape(shape), axis=axes, keepdims=True)
    return s, shape


def _apply_reflection_2d(
    n: int, op: ReflectionOp, x2d: jnp.ndarray
) -> jnp.ndarray:
    """``psi -> 2*mean_Q(psi) - psi`` blockwise on the (R, C) view (see
    ``ReflectionOp``). The operator matrix is real, so the same transform
    serves the complex state and each (re, im) plane; the whole op is one
    reduction + one elementwise pass regardless of width (vs 2k+1 gate
    passes for the H/X/mcZ composition the reference would run)."""
    red, shape = _reflection_sum_2d(n, op.indices, x2d)
    scale = 2.0 / (1 << op.num_indices)
    if shape is not None:
        return (scale * red - x2d.reshape(shape)).reshape(x2d.shape)
    return scale * red - x2d


def _apply_to_state(n: int, op: MatrixOp, state: jnp.ndarray) -> jnp.ndarray:
    if isinstance(op, PhaseProductOp):
        _, R, C = _geometry(n)
        return _apply_phase_product_2d(n, op, state.reshape(R, C)).reshape(-1)
    if isinstance(op, DenseOp):
        return _apply_dense(n, op.indices, op.data, state)
    if isinstance(op, SparseOp):
        if op.num_indices > DENSE_CAP:
            # Wide sparse/oracle ops: gather passes, never a dense matrix
            # (ref streams any width — qubit_iterators.rs:60,223).
            return _apply_sparse_wide(n, op, state)
        return _apply_dense(n, op.indices, op_to_dense(op), state)
    if isinstance(op, SwapOp):
        return _apply_swap(n, op, state)
    if isinstance(op, ControlOp):
        return _apply_control(n, op, state)
    if isinstance(op, FnOp):
        # Traced-function oracle: one gather pass, nothing embeds
        # (the reference's lazy FunctionOpIterator, qubit_iterators.rs:223).
        return _apply_fn_wide(n, op, state)
    if isinstance(op, ReflectionOp):
        _, R, C = _geometry(n)
        return _apply_reflection_2d(n, op, state.reshape(R, C)).reshape(-1)
    raise TypeError(f"Unknown op {op!r}")


# ---------------------------------------------------------------------------
# CPU path: rank-n tensor contraction (nnz-efficient FLOPs).
#
# The layout-aware path above trades FLOPs for TPU tile alignment (a
# 1-qubit gate becomes a 128-wide matmul — free on the MXU, 64x the work on
# a scalar core). On CPU backends the classic formulation wins: reshape to
# (2,)*n and contract only the gate's own axes (2 MACs per amplitude for a
# 1-qubit gate). Dispatch picks per backend at trace time.
# ---------------------------------------------------------------------------


def _t_dense(tensor: jnp.ndarray, mat: np.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    k = len(axes)
    mat_t = jnp.asarray(mat, dtype=tensor.dtype).reshape((2,) * (2 * k))
    out = jnp.tensordot(
        mat_t,
        tensor,
        axes=(tuple(range(k, 2 * k)), tuple(axes)),
        precision=MATMUL_PRECISION,
    )
    return jnp.moveaxis(out, tuple(range(k)), tuple(axes))


def _t_apply(n: int, op: MatrixOp, tensor: jnp.ndarray) -> jnp.ndarray:
    if isinstance(op, PhaseProductOp):
        for tidx, tdiag in op.terms:
            kt = len(tidx)
            dd = np.asarray(tdiag, dtype=np.complex128).reshape((2,) * kt)
            order = tuple(np.argsort(tidx))
            dd = dd.transpose(order)
            bshape = [1] * n
            for q in sorted(tidx):
                bshape[q] = 2
            tensor = tensor * jnp.asarray(dd.reshape(bshape), dtype=tensor.dtype)
        return tensor
    if isinstance(op, DenseOp):
        return _t_dense(tensor, op.data, op.indices)
    if isinstance(op, SparseOp):
        if op.num_indices > DENSE_CAP:
            flat = _apply_sparse_wide(n, op, tensor.reshape(-1))
            return flat.reshape(tensor.shape)
        return _t_dense(tensor, op_to_dense(op), op.indices)
    if isinstance(op, SwapOp):
        h = op.half
        perm = list(range(n))
        for a, b in zip(op.indices[:h], op.indices[h:]):
            perm[a], perm[b] = perm[b], perm[a]
        return jnp.transpose(tensor, perm)
    if isinstance(op, ControlOp):
        # Static slab update: only the all-controls-|1> sub-tensor changes.
        ctrl = op.control_indices
        idx = tuple(1 if ax in ctrl else slice(None) for ax in range(n))
        slab = tensor[idx]
        removed = sorted(ctrl)
        inner_axes = tuple(
            t - sum(1 for r in removed if r < t) for t in op.inner.indices
        )
        inner = _reindex_op(op.inner, inner_axes)
        new_slab = _t_apply(n - op.n_ctrl, inner, slab)
        return tensor.at[idx].set(new_slab)
    if isinstance(op, FnOp):
        flat = _apply_fn_wide(n, op, tensor.reshape(-1))
        return flat.reshape(tensor.shape)
    if isinstance(op, ReflectionOp):
        scale = 2.0 / (1 << op.num_indices)
        red = jnp.sum(tensor, axis=op.indices, keepdims=True)
        return scale * red - tensor
    raise TypeError(f"Unknown op {op!r}")


def _reindex_op(op: MatrixOp, new_indices: Tuple[int, ...]) -> MatrixOp:
    if isinstance(op, PhaseProductOp):
        remap = dict(zip(op.indices, new_indices))
        return PhaseProductOp(
            tuple(
                (tuple(remap[q] for q in tidx), tdiag)
                for tidx, tdiag in op.terms
            )
        )
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
    if isinstance(op, FnOp):
        # ``fn`` operates in the op's own k-bit index space, keyed by the
        # POSITION of each qubit in ``indices`` — a positional reindex
        # preserves semantics exactly.
        return FnOp(
            tuple(new_indices), op.fn, op.tag, op.conjugated,
            op.self_transpose, op.diagonal,
        )
    if isinstance(op, ReflectionOp):
        # Order-invariant (|s><s| is permutation-symmetric): re-sort.
        return ReflectionOp(tuple(sorted(new_indices)))
    raise TypeError(f"Unknown op {op!r}")


def _use_tiled_layout() -> bool:
    return jax.default_backend() == "tpu"


def apply_op(n: int, op: MatrixOp, state: jnp.ndarray) -> jnp.ndarray:
    """Apply one gate op to a flat 2^n state vector; returns a new vector.

    Semantically identical to the reference's ``apply_op_overwrite``
    (qip-iterators/src/matrix_ops.rs:127) with zero offsets; distribution is
    handled by sharding the array itself (see ``rustqip_tpu/parallel``).
    """
    state = jnp.asarray(state)
    if _use_tiled_layout():
        return _apply_to_state(n, op, state)
    return _t_apply(n, op, state.reshape((2,) * n)).reshape(-1)


def apply_op_add(
    n: int, op: MatrixOp, state: jnp.ndarray, acc: jnp.ndarray
) -> jnp.ndarray:
    """Accumulating apply: ``acc + op @ state`` — the reference's
    ``apply_op`` (+=) semantics (qip-iterators/src/matrix_ops.rs:98-123),
    used when summing op contributions (e.g. building op matrices)."""
    return jnp.asarray(acc) + apply_op(n, op, state)


def apply_ops(n: int, ops: Sequence[MatrixOp], state: jnp.ndarray) -> jnp.ndarray:
    """Apply ops in sequence (the reference's ``apply_ops`` fusion entry,
    matrix_ops.rs:158 — adjacent-gate fusion happens ahead of time in
    ``fusion.py``; XLA fuses the remaining elementwise work)."""
    state = jnp.asarray(state)
    if _use_tiled_layout():
        for op in ops:
            state = _apply_to_state(n, op, state)
        return state
    tensor = state.reshape((2,) * n)
    for op in ops:
        tensor = _t_apply(n, op, tensor)
    return tensor.reshape(-1)
