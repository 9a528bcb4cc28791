"""Explicit shard-local / collective gate application (shard_map path).

The default sharded executor (``sharded.py``) lets GSPMD partition the
engine code. This module is the hand-scheduled alternative — the direct
TPU-native realization of the amplitude-exchange the reference's
``input_offset``/``output_offset`` seams anticipate but never implement
(qip-iterators/src/matrix_ops.rs:96-104):

* gate on local qubits                -> shard-local engine pass (with the
  engine's sweep pairing), zero comms;
* diagonal on any qubits              -> zero comms (device-index factor);
* dense gate on one global qubit      -> one ``ppermute`` pairing each shard
  with its partner (the two halves of the qubit's amplitude pairs live on
  devices differing in that index bit), then a 2x2 recombination — exactly
  one shard-sized exchange over ICI neighbor links;
* control on global qubits            -> zero communication: devices whose
  index bits satisfy the controls apply the inner op locally, the rest
  pass through (the distributed analog of the reference's
  ControlledOpIterator identity rows);
* anything else (multi-global dense, global-target controls) -> global
  target qubits relocate into free local slots (2 exchanges per qubit);
* wide FnOp / sparse op whose globals outnumber the free local slots ->
  generalized-permutation exchange: XOR-stage ppermutes with per-element
  in-trace source routing, never densifying (``_lower_gex``). Ops whose
  LOCAL support is small recombine by XOR-flip re-addressing (bit-axis
  flips, ~26x cheaper than the whole-shard gather at real shard sizes —
  scripts/gex_cost_probe.py); the gather is the wide-local fallback.

``apply_sharded_ops`` lowers a whole op sequence into ONE shard_map body:
consecutive local ops batch into a single engine pass run, and every
exchange lives in the same XLA program, so the compiler can overlap
collectives with compute — the hand-pinned schedule GSPMD has to infer.

State convention: flat 2^n amplitudes sharded contiguously over the mesh
axis — the top g = log2(D) qubits are the device index bits.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rustqip_tpu.engine.real_apply import apply_ops_ri
from rustqip_tpu.engine.apply import _reindex_op
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
    make_swap_op,
    op_to_dense,
    expand_op_matrix,
)

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _mesh_geometry(mesh: jax.sharding.Mesh) -> Tuple[str, int, int]:
    if len(mesh.axis_names) != 1:
        raise CircuitError(
            "The explicit shard_map path needs a 1-D mesh; multi-axis "
            "(e.g. DCN x ICI) meshes run through the GSPMD executor"
        )
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    g = d.bit_length() - 1
    if (1 << g) != d:
        raise CircuitError("Mesh size must be a power of two")
    return axis, d, g


def _op_index_dtype(k: int):
    """Dtype for op-local ``k``-bit index/pattern math in the traced
    schedule blocks (gex/fndiag — the any-width paths). int32 covers
    k <= 31; a wider traced oracle needs int64, and without
    ``jax_enable_x64`` the high-bit shifts would silently wrap and route
    amplitudes to the wrong shard/column — raise instead (forced-CPU
    tests run with x64 on; wider-than-31-qubit states exceed this
    environment's memory anyway). Ref asymptotics: qubit_iterators.rs:223
    (fn ops at any width)."""
    if k <= 31:
        return jnp.int32
    if jax.config.jax_enable_x64:
        return jnp.int64
    raise CircuitError(
        f"sharded op spans {k} qubits: op-local index math needs int64 "
        "(enable jax_enable_x64)"
    )


def _local_op(op: MatrixOp, g: int) -> MatrixOp:
    """Reindex an op on qubits >= g into the shard-local qubit space."""
    return _reindex_op(op, tuple(q - g for q in op.indices))


def _reflect_psum_groups(g: int, gq: Tuple[int, ...]):
    """Device groups for a psum over a SUBSET of the g device-index bits
    (a reflection whose global qubits are a strict subset): devices that
    agree on every non-``gq`` global bit reduce together."""
    keep = 0
    for q in range(g):
        if q not in gq:
            keep |= 1 << (g - 1 - q)
    groups: dict = {}
    for dev in range(1 << g):
        groups.setdefault(dev & keep, []).append(dev)
    return [groups[k] for k in sorted(groups)]


def _remap_op(op: MatrixOp, mapping: dict) -> MatrixOp:
    return _reindex_op(op, tuple(mapping.get(q, q) for q in op.indices))


def _gex_flip_max() -> int:
    """Max local-op-qubit count routed through the XOR-flip gex
    recombination (RUSTQIP_TPU_GEX_FLIP, default 4; 0 still routes
    fully-global ops, whose flip is the identity read; -1 forces the
    gather path everywhere — the A/B lever).

    The flip path replaces the per-slot whole-shard gather with <= 2^kl
    bit-axis flips: measured on v5e (scripts/gex_cost_probe.py,
    2026-08-20, 2^25-elem shards) the gather costs 1016-1939 ms/stage
    and scales super-linearly, while one flip+MAC is ~39 ms — within
    noise of the bare MAC floor (35.6 ms). Break-even is ~2x at kl=4;
    beyond that the 2^kl flip fan-out loses to one gather. Participates
    in every executor's compile-cache fingerprint via
    ``engine.compile._env_plan_flags``."""
    import os

    try:
        return int(os.environ.get("RUSTQIP_TPU_GEX_FLIP", "4"))
    except ValueError:
        return 4


def _xor_flip_flat(x: jnp.ndarray, lmask: int) -> jnp.ndarray:
    """``x`` re-addressed at ``i ^ lmask`` (static mask) without a gather.

    XOR on the row bits of a (rows, 128) view = reversing the matching
    bit axes of a ``(2,)*rbits x 128`` reshape (the lane axis stays
    128-wide — no tiny trailing dims, per the TPU tiling rule); XOR on
    the 7 lane bits = one static 128-column take. Bit-exactness vs the
    gather is probe-verified (gex_cost_probe.py C==B)."""
    if lmask == 0:
        return x
    size = x.size
    nb = size.bit_length() - 1
    if size >= 128:
        rows = size // 128
        rbits = nb - 7
        row_mask = lmask >> 7
        lane_mask = lmask & 127
        y = x.reshape((2,) * rbits + (128,))
        axes = [t for t in range(rbits) if (row_mask >> (rbits - 1 - t)) & 1]
        if axes:
            y = jnp.flip(y, axes)
        if lane_mask:
            lane_perm = jnp.asarray(
                np.arange(128, dtype=np.int32) ^ lane_mask
            )
            y = jnp.take(y.reshape(rows, 128), lane_perm, axis=1)
        return y.reshape(-1)
    # Tiny shards (virtual-mesh CPU tests): all bits are "row" bits.
    y = x.reshape((2,) * nb)
    axes = [t for t in range(nb) if (lmask >> (nb - 1 - t)) & 1]
    return jnp.flip(y, axes).reshape(-1)


# ---------------------------------------------------------------------------
# Schedule lowering (host side)
# ---------------------------------------------------------------------------
#
# Schedule entries:
#   ("local", [ops...])           shard-local engine ops (already reindexed)
#   ("ctrl", gctrl, inner_op)     global controls -> device-index select
#   ("exchange", d_mask, blocks, rest_local)
#                                 single-global dense: ppermute + 2x2 blocks
#   ("diag", terms)               zero-comm diagonal factor gather
#   ("fndiag", fnop)              traced phase oracle: zero-comm elementwise
#   ("exchange_multi", ...)       dense on h>=2 immovable globals: XOR stages
#   ("gex", indices, gq, payload) wide FnOp / sparse tables on immovable
#                                 globals: per-element source routing over
#                                 XOR stages (see _lower_gex)


def _lower_op(n: int, g: int, op: MatrixOp, sched: List) -> None:
    local_n = n - g
    globals_ = tuple(q for q in op.indices if q < g)

    if isinstance(op, SwapOp) and op.half > 1 and globals_:
        # A coalesced multi-pair swap touching global qubits lowers
        # pair-by-pair: each 2-qubit pair hits the local / single-exchange
        # branches directly (densifying the whole k-qubit permutation
        # would materialize a 2^k x 2^k matrix).
        for a, b in zip(op.indices[: op.half], op.indices[op.half :]):
            _lower_op(n, g, SwapOp((a, b)), sched)
        return

    if isinstance(op, PhaseProductOp) and globals_:
        terms = []
        for tidx, tdiag in op.terms:
            arr = np.asarray(tdiag, dtype=np.complex128)
            terms.append((tuple(tidx), np.real(arr), np.imag(arr)))
        sched.append(("diag", tuple(terms)))
        return

    if isinstance(op, FnOp) and op.diagonal and globals_:
        # Declared traced phase oracle: zero comms at ANY width — each
        # shard evaluates fn on its own op-local indices, with global
        # qubit bits read from the device index (cf. the "diag" entry).
        # This is how a 33q+ sharded Grover marks states without a single
        # collective.
        sched.append(("fndiag", op))
        return

    if isinstance(op, ReflectionOp) and globals_:
        # Reflection about the uniform superposition: the distributed
        # mean IS one (grouped) psum of the shard-local partial sums —
        # the textbook all-reduce shape, zero data exchange beyond the
        # reduced plane. No relocation ever needed.
        sched.append(("reflect", op, (), ()))
        return

    if (
        isinstance(op, ControlOp)
        and isinstance(op.inner, ReflectionOp)
        and any(q < g for q in op.inner.indices)
    ):
        # Controlled reflection whose target spans global qubits: same
        # psum path, with the control select folded in (global controls
        # read the device index, local ones the flat iota).
        gctrl = tuple(q for q in op.control_indices if q < g)
        lctrl = tuple(q - g for q in op.control_indices if q >= g)
        sched.append(("reflect", op.inner, gctrl, lctrl))
        return

    if (
        isinstance(op, ControlOp)
        and isinstance(op.inner, FnOp)
        and op.inner.diagonal
        and globals_
    ):
        # Conditioned traced phase oracle (cb.apply_fn_matrix(...,
        # diagonal=True) — the sharded-Grover marking shape): a
        # controlled diagonal is still diagonal, so wrap the control
        # select into the traced fn and take the zero-comm path.
        sched.append(("fndiag", _controlled_fn_op(op)))
        return

    if not globals_:
        lop = _local_op(op, g)
        if sched and sched[-1][0] == "local":
            sched[-1][1].append(lop)
        else:
            sched.append(("local", [lop]))
        return

    if isinstance(op, ControlOp) and all(q >= g for q in op.inner.indices):
        gctrl = tuple(q for q in op.control_indices if q < g)
        lctrl = tuple(q for q in op.control_indices if q >= g)
        inner = op.inner if not lctrl else ControlOp(
            len(lctrl), lctrl + op.inner.indices, op.inner
        )
        sched.append(("ctrl", gctrl, _local_op(inner, g)))
        return

    if isinstance(op, (DenseOp, SwapOp)) and len(globals_) == 1:
        # One global qubit: block-decompose the gate over that qubit's bit
        # and exchange partner shards with a single ppermute.
        q = globals_[0]
        mask = 1 << (g - 1 - q)
        mat = op_to_dense(op)
        # Reorder so the global qubit is the leading (most significant) bit.
        order = sorted(op.indices, key=lambda x: (x != q, x))
        pos = tuple(order.index(x) for x in op.indices)
        mat_o = expand_op_matrix(mat, pos, len(op.indices))
        k = len(op.indices)
        half = 1 << (k - 1)
        blocks = (
            (mat_o[:half, :half], mat_o[:half, half:]),
            (mat_o[half:, :half], mat_o[half:, half:]),
        )
        rest = tuple(x for x in order if x != q)
        rest_local = tuple(x - g for x in rest)
        sched.append(("exchange", mask, blocks, rest_local))
        return

    # General case: relocate each global *target* qubit into a free local
    # slot via single-exchange swaps, apply shard-locally, swap back —
    # the standard distributed-simulator qubit-relocation schedule. Global
    # *control* qubits never move (the index select handles them).
    if isinstance(op, ControlOp):
        move = [q for q in op.target_indices if q < g]
        spare = 0  # the ctrl branch needs ALL targets local
    else:
        move = list(globals_)
        # Only DenseOp/SwapOp have a single-global exchange branch to
        # absorb one leftover global; anything else (wide SparseOp, ...)
        # must relocate everything.
        spare = 1 if isinstance(op, (DenseOp, SwapOp)) else 0
    free_local = [q for q in range(g, n) if q not in op.indices]
    if len(move) - spare > len(free_local):
        from rustqip_tpu.engine.apply import DENSE_CAP

        if isinstance(op, FnOp):
            # Wide traced oracle with immovable global qubits: the
            # generalized-permutation exchange (never densify an FnOp —
            # O(1) program size is its whole point; see _lower_gex).
            _lower_gex(op, globals_, sched)
            return
        if isinstance(op, ControlOp) and isinstance(op.inner, FnOp):
            # Conditioned traced oracle (controlled modular arithmetic —
            # the Shor shape) too wide/global to relocate or densify:
            # wrap the control select into the fn and ride gex.
            _lower_gex(_controlled_fn_op(op), globals_, sched)
            return
        if isinstance(op, ControlOp) and op.num_indices <= DENSE_CAP:
            # Fold the control into a dense op; its globals then relocate
            # with the one-leftover allowance.
            _lower_op(
                n, g, DenseOp(op.indices, op_to_dense(op)), sched
            )
            return
        if (
            not isinstance(op, ControlOp)
            and op.num_indices <= DENSE_CAP
        ):
            # No room to relocate at all: direct multi-global block
            # exchange (2^h - 1 XOR-ppermutes; see _lower_multi_exchange).
            _lower_multi_exchange(n, g, op, globals_, sched)
            return
        if isinstance(op, SparseOp):
            # Wider than DENSE_CAP: per-nnz-slot generalized exchange —
            # same stage loop as FnOp, sources from the embedded tables.
            _lower_gex(op, globals_, sched)
            return
        raise CircuitError(
            f"Cannot relocate {len(move)} global qubits: only "
            f"{len(free_local)} free local qubits (n={n})"
        )
    if spare and len(move) > len(free_local):
        # Partial relocation: leave one global in place; the remapped op
        # reaches the single-global exchange branch.
        move = move[1:]
    if not move:  # pragma: no cover - guarded by the branches above
        raise CircuitError(
            f"Cannot lower {type(op).__name__} on globals {globals_} "
            f"(n={n}, mesh={1 << g})"
        )
    # Highest-index free slots: column qubits on the engine's (R, C)
    # layout, so the post-swap local apply rides the MXU fast path.
    slots = free_local[-len(move):]
    mapping = {}
    for gq, lq in zip(move, slots):
        mapping[gq] = lq
        mapping[lq] = gq
    swaps = [make_swap_op([gq], [mapping[gq]]) for gq in move]
    for s in swaps:
        _lower_op(n, g, s, sched)
    _lower_op(n, g, _remap_op(op, mapping), sched)
    for s in swaps:
        _lower_op(n, g, s, sched)


def _lower_multi_exchange(
    n: int, g: int, op: MatrixOp, globals_, sched: List
) -> None:
    """Direct block exchange for a dense op on h >= 2 global qubits when no
    free local slots exist (tiny-n circuits): each shard fetches its 2^h-1
    partner shards with XOR-ppermutes and combines them through the op's
    (2^h x 2^h) grid of sub-blocks, its own row selected by device index.
    """
    local_n = n - g
    h = len(globals_)
    k = op.num_indices
    dl = 1 << (k - h)
    order = sorted(globals_) + sorted(q for q in op.indices if q >= g)
    pos = tuple(order.index(x) for x in op.indices)
    mat_o = expand_op_matrix(op_to_dense(op), pos, k)
    bstack = np.empty((1 << h, 1 << h, dl, dl), dtype=np.complex128)
    for gj in range(1 << h):
        for gi in range(1 << h):
            bstack[gj, gi] = mat_o[
                gj * dl : (gj + 1) * dl, gi * dl : (gi + 1) * dl
            ]
    rest_local = tuple(q - g for q in order[h:])
    gq_sorted = tuple(sorted(globals_))
    sched.append(("exchange_multi", gq_sorted, bstack, rest_local, local_n))


def _controlled_fn_op(op: ControlOp) -> FnOp:
    """An equivalent ``FnOp`` for a ControlOp whose inner is an FnOp: the
    control select moves INSIDE the traced fn (identity row when any
    control is |0>). Preserves laziness (nothing materializes at any
    width), the ``diagonal`` declaration (a controlled diagonal is
    diagonal), and the conjugation flag (conj(1) == 1 on inactive rows,
    so flag-level conjugation commutes with the select). The distributed
    form of the reference's ControlledOpIterator identity rows
    (qip-iterators/src/iterators/qubit_iterators.rs:137-221)."""
    inner = op.inner
    nc = op.n_ctrl
    ki = inner.num_indices
    cmask = ((1 << nc) - 1) << ki
    tmask = (1 << ki) - 1

    def fn(row):
        active = (row & cmask) == cmask
        icol, ival = inner.fn(row & tmask)
        ival = jnp.asarray(ival)
        one = jnp.ones_like(ival)
        col = jnp.where(active, (row & ~np.int32(tmask)) | icol, row)
        return col, jnp.where(active, ival, one)

    return FnOp(
        op.indices,
        fn,
        f"ctrl{nc}:{inner.tag}",
        inner.conjugated,
        inner.self_transpose,
        inner.diagonal,
    )


def _lower_gex(op: MatrixOp, globals_, sched: List) -> None:
    """Generalized-permutation exchange for wide ops with immovable global
    qubits (more globals than free local slots, wider than the dense cap).

    Works for any op stored as per-row source entries — traced FnOps
    (``fn(row) -> (col, val)``; the distributed answer to the reference's
    lazy ``FunctionOpIterator``, qip-iterators/src/iterators/
    qubit_iterators.rs:223) and sparse tables alike. Schedule: 2^h - 1
    XOR-ppermutes over the h global op qubits; at each stage every shard
    gathers, from the fetched partner shard, exactly those elements whose
    source amplitude lives there (the element's own source coordinates are
    computed in-trace from its row index), and accumulates. No
    densification, no relocation swaps — O(1) program size at any width.
    """
    gq = tuple(sorted(globals_))
    if isinstance(op, FnOp):
        sched.append(("gex", op.indices, gq, ("fn", op)))
        return
    # SparseOp: pad per-row entries to max-nnz slot tables (the same
    # columnar layout as the single-chip gather path, engine/apply.py
    # _sparse_plan) — embedded constants indexed by the op-local row.
    dim = 1 << op.num_indices
    max_nnz = max(len(r) for r in op.rows)
    cols_t = np.zeros((max_nnz, dim), np.int32)
    vre_t = np.zeros((max_nnz, dim), np.float64)
    vim_t = np.zeros((max_nnz, dim), np.float64)
    for row, entries in enumerate(op.rows):
        for t, (c, v) in enumerate(entries):
            cols_t[t, row] = c
            vre_t[t, row] = v.real
            vim_t[t, row] = v.imag
    sched.append(
        ("gex", op.indices, gq, ("sp", max_nnz, cols_t, vre_t, vim_t))
    )


def _traced_local_apply(U, rest_local, local_n, re_s, im_s):
    """Apply a TRACED (dl, dl) complex matrix on the given local qubits.

    Groups the local index bits into runs around the support bits (rank
    2*(k-h)+1, never rank-local_n — TPU chokes on high ranks), moves the
    support axes to the front, and contracts. Fallback path only."""
    kk = len(rest_local)
    srt = sorted(rest_local)
    shape: List[int] = []
    axes: List[int] = []
    prev = 0
    for q in srt:
        shape.append(1 << (q - prev))
        shape.append(2)
        axes.append(len(shape) - 1)
        prev = q + 1
    shape.append(1 << (local_n - prev))
    x = jax.lax.complex(re_s, im_s).reshape(shape)
    # listed-order support: op bit j <-> rest_local[j]
    front = [axes[srt.index(q)] for q in rest_local]
    x = jnp.moveaxis(x, front, list(range(kk)))
    lead = x.shape[:kk]
    x2 = x.reshape(1 << kk, -1)
    from rustqip_tpu.engine.apply import MATMUL_PRECISION as _P

    y2 = jnp.dot(U.astype(x2.dtype), x2, precision=_P)
    y = y2.reshape(lead + x.shape[kk:])
    y = jnp.moveaxis(y, list(range(kk)), front)
    y = y.reshape(re_s.shape)
    return jnp.real(y), jnp.imag(y)


def _lower_schedule(n: int, g: int, ops: Sequence[MatrixOp]) -> List:
    sched: List = []
    for op in ops:
        _lower_op(n, g, op, sched)
    return [
        (e[0], tuple(e[1]), *e[2:]) if e[0] == "local" else e for e in sched
    ]


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------


def _exchange_chunks() -> int:
    """Chunk count for the pipelined single-global exchange (see
    ``apply_sharded_ops``). Default 1 (single full-shard ppermute)."""
    import os

    try:
        k = int(os.environ.get("RUSTQIP_TPU_EXCHANGE_CHUNKS", "1"))
    except ValueError:
        return 1
    return k if k >= 1 and (k & (k - 1)) == 0 else 1


def apply_sharded_ops(
    mesh: jax.sharding.Mesh,
    n: int,
    ops: Sequence[MatrixOp],
    re: jnp.ndarray,
    im: jnp.ndarray,
    chunks: int = 0,
    kernel_ok: "bool | None" = None,
    times: int = 1,
) -> Pair:
    """Apply a gate-op sequence to a mesh-sharded (re, im) state pair as
    ONE shard_map program with a hand-pinned collective schedule.

    ``times`` repeats the WHOLE schedule via a ``lax.fori_loop`` placed
    INSIDE the shard_map body (loop-in-manual-region, the scalable
    direction: a shard_map inside a fori_loop trips GSPMD's
    manual-sharding propagation, and unrolling makes compile time
    O(times)). This is how sharded repeat blocks (Grover rounds, Trotter
    steps) compile in O(body) — the distributed analog of the single-chip
    repeat fold (ref qip/src/builder.rs:423).

    ``chunks`` (0 = read ``RUSTQIP_TPU_EXCHANGE_CHUNKS``, default 1)
    splits each single-global exchange into that many independent
    ppermute+recombine pipelines along the leading local qubits — the
    double-buffered ring exchange: chunk k's ICI transfer overlaps chunk
    k-1's recombination (XLA schedules the independent collectives
    asynchronously on real hardware). Falls back to the whole-shard
    exchange when the op's local support touches the chunking qubits.
    Needs real multi-chip hardware to show a win; equivalence is tested
    on the virtual mesh.

    ``kernel_ok`` (None = derive from backend availability + f32 planes,
    like ``apply_ops_ri``) lets shard-LOCAL runs and the global-control
    inner applies ride the Pallas window kernel: inside ``shard_map``
    every device holds its shard as a plain local array, so a per-device
    ``pallas_call`` is the standard manual-sharding pattern — the kernel
    sweeps the shard's own (rows, 128) canonical view. Exchange-path
    block recombinations stay on XLA (they are ppermute-bound)."""
    from rustqip_tpu.engine import pallas_kernels

    axis, d, g = _mesh_geometry(mesh)
    local_n = n - g
    times = int(times)
    if times < 1:
        raise CircuitError("apply_sharded_ops needs times >= 1")
    sched = _lower_schedule(n, g, list(ops))
    if kernel_ok is None:
        kernel_ok = pallas_kernels.available()
    kernel_ok = kernel_ok and jnp.asarray(re).dtype == jnp.float32
    if chunks == 0:
        chunks = _exchange_chunks()
    kbits = max(chunks.bit_length() - 1, 0)

    def blk_apply(b, re_s, im_s, rest_local, sub_n=None):
        if not np.any(b):
            return jnp.zeros_like(re_s), jnp.zeros_like(im_s)
        if rest_local:
            lop = DenseOp(rest_local, np.ascontiguousarray(b))
            return apply_ops_ri(
                local_n if sub_n is None else sub_n,
                [lop],
                re_s,
                im_s,
                kernel_ok=False,
            )
        val = complex(b[0, 0])
        return (
            re_s * val.real - im_s * val.imag,
            re_s * val.imag + im_s * val.real,
        )

    def step(my, re_s, im_s):
        for entry in sched:
            kind = entry[0]
            if kind == "local":
                # The shard-local run sweeps this device's own (rows, 128)
                # canonical view — with kernel_ok, plan_sweeps windows it
                # onto the Pallas kernel exactly as on a single chip (the
                # compile-time fusion planned for the LOCAL qubit space;
                # see ExplicitShardedCircuit._fusion_joint_ok).
                re_s, im_s = apply_ops_ri(
                    local_n, entry[1], re_s, im_s, kernel_ok=kernel_ok
                )
            elif kind == "ctrl":
                _, gctrl, inner = entry
                active = jnp.bool_(True)
                for q in gctrl:
                    active = active & (((my >> (g - 1 - q)) & 1) == 1)
                nr, ni = apply_ops_ri(
                    local_n, [inner], re_s, im_s, kernel_ok=kernel_ok
                )
                re_s = jnp.where(active, nr, re_s)
                im_s = jnp.where(active, ni, im_s)
            elif kind == "exchange_multi":
                _, gq, bstack, rest_local, _ = entry
                h = len(gq)
                e = jnp.zeros((), jnp.int32)
                for j, q in enumerate(gq):
                    e = e | (((my >> (g - 1 - q)) & 1) << (h - 1 - j))
                # complex constants never cross the boundary: float planes
                br = jnp.asarray(np.real(bstack), dtype=re_s.dtype)
                bi = jnp.asarray(np.imag(bstack), dtype=re_s.dtype)
                acc_r = acc_i = None
                for t in range(1 << h):
                    mask_t = 0
                    for j, q in enumerate(gq):
                        if (t >> (h - 1 - j)) & 1:
                            mask_t |= 1 << (g - 1 - q)
                    if mask_t == 0:
                        dr, di = re_s, im_s
                    else:
                        permt = [(i, i ^ mask_t) for i in range(d)]
                        dr = jax.lax.ppermute(re_s, axis, permt)
                        di = jax.lax.ppermute(im_s, axis, permt)
                    U = jax.lax.complex(br[e, e ^ t], bi[e, e ^ t])
                    tr, ti = _traced_local_apply(
                        U, rest_local, local_n, dr, di
                    )
                    if acc_r is None:
                        acc_r, acc_i = tr, ti
                    else:
                        acc_r, acc_i = acc_r + tr, acc_i + ti
                re_s, im_s = acc_r, acc_i
            elif kind == "exchange":
                _, mask, blocks, rest_local = entry
                perm = [(i, i ^ mask) for i in range(d)]
                bit = (my & mask) != 0

                def one_exchange(rs, is_, rest, sub_n):
                    pre = jax.lax.ppermute(rs, axis, perm)
                    pim = jax.lax.ppermute(is_, axis, perm)
                    # own shard has global bit = bit; partner the
                    # complement.
                    r00, i00 = blk_apply(blocks[0][0], rs, is_, rest, sub_n)
                    r01, i01 = blk_apply(blocks[0][1], pre, pim, rest, sub_n)
                    r10, i10 = blk_apply(blocks[1][0], pre, pim, rest, sub_n)
                    r11, i11 = blk_apply(blocks[1][1], rs, is_, rest, sub_n)
                    return (
                        jnp.where(bit, r10 + r11, r00 + r01),
                        jnp.where(bit, i10 + i11, i00 + i01),
                    )

                if (
                    kbits > 0
                    and local_n - kbits >= 1
                    and all(q >= kbits for q in rest_local)
                ):
                    # Pipelined: independent per-chunk ppermutes along the
                    # top local qubits (outside the op's support), so each
                    # chunk's transfer can overlap the previous chunk's
                    # recombination.
                    sub_n = local_n - kbits
                    sub = tuple(q - kbits for q in rest_local)
                    rs = re_s.reshape(1 << kbits, -1)
                    is_ = im_s.reshape(1 << kbits, -1)
                    outs = [
                        one_exchange(rs[c], is_[c], sub, sub_n)
                        for c in range(1 << kbits)
                    ]
                    re_s = jnp.concatenate(
                        [o[0] for o in outs]
                    ).reshape(re_s.shape)
                    im_s = jnp.concatenate(
                        [o[1] for o in outs]
                    ).reshape(im_s.shape)
                else:
                    re_s, im_s = one_exchange(
                        re_s, im_s, rest_local, local_n
                    )
            elif kind == "gex":
                # Generalized-permutation exchange (see _lower_gex): h
                # global op qubits -> 2^h XOR stages. Each element of MY
                # shard knows its own source coordinates (computed
                # in-trace); stage t fetches the partner shard differing
                # in global-bit pattern t and accumulates exactly the
                # elements whose source lives there.
                _, indices, gq, payload = entry
                k = len(indices)
                h = len(gq)
                idt = _op_index_dtype(k)
                rr, ii = re_s.reshape(-1), im_s.reshape(-1)
                flat = jnp.arange(rr.size, dtype=jnp.int32)
                pat = jnp.zeros(flat.shape, idt)
                for j, q in enumerate(indices):
                    sh = k - 1 - j
                    if q < g:
                        pat = pat | (
                            ((my >> (g - 1 - q)) & 1).astype(idt) << sh
                        )
                    else:
                        pat = pat | (
                            ((flat >> (local_n - 1 - (q - g))) & 1).astype(
                                idt
                            )
                            << sh
                        )
                rdtype = rr.dtype
                slots = []  # (src op-local col, value planes) per nnz slot
                if payload[0] == "fn":
                    fop = payload[1]
                    sc, val = fop.fn(pat)
                    sc = jnp.asarray(sc, idt)
                    val = jnp.asarray(val)
                    if jnp.iscomplexobj(val):
                        vr = jnp.real(val).astype(rdtype)
                        vi = jnp.imag(val).astype(rdtype)
                        if fop.conjugated:
                            vi = -vi
                    else:
                        vr = val.astype(rdtype)
                        vi = None
                    slots.append((sc, vr, vi))
                else:
                    _, max_nnz, cols_t, vre_t, vim_t = payload
                    for t in range(max_nnz):
                        sc = jnp.take(jnp.asarray(cols_t[t]), pat)
                        vr = jnp.take(
                            jnp.asarray(vre_t[t], dtype=rdtype), pat
                        )
                        vi = (
                            jnp.take(jnp.asarray(vim_t[t], dtype=rdtype), pat)
                            if np.any(vim_t[t])
                            else None
                        )
                        slots.append((sc, vr, vi))
                # Decompose each slot's source column into (global-bit
                # pattern over gq, shard-local source index).
                myg = jnp.zeros((), jnp.int32)
                for jj, q in enumerate(gq):
                    myg = myg | (
                        ((my >> (g - 1 - q)) & 1) << (h - 1 - jj)
                    )
                decomp = []
                for sc, vr, vi in slots:
                    srcg = jnp.zeros_like(sc)
                    srcl = flat
                    for j, q in enumerate(indices):
                        bit = (sc >> (k - 1 - j)) & 1
                        if q < g:
                            jj = gq.index(q)
                            srcg = srcg | (bit << (h - 1 - jj))
                        else:
                            shl = local_n - 1 - (q - g)
                            srcl = (srcl & np.int32(~(1 << shl))) | (
                                bit << shl
                            )
                    decomp.append((srcg, srcl, vr, vi))
                # Recombination layout. srcl differs from the identity
                # only on the op's LOCAL qubit bits (it is built from
                # ``flat`` by overwriting exactly those), so the
                # per-slot whole-shard gather dr[srcl] — measured
                # gather-pathological at real shard sizes (1.0-1.9
                # s/stage at 2^25 elems, gex_cost_probe.py 2026-08-20)
                # — decomposes EXACTLY into <= 2^kl XOR-flips at ~39 ms
                # each: partition elements by delta = srcl ^ flat, fold
                # each slot's coefficients into per-delta effective
                # planes, and read the partner shard through
                # ``_xor_flip_flat``. Gather kept for kl above the
                # break-even threshold (RUSTQIP_TPU_GEX_FLIP).
                local_shifts = sorted(
                    local_n - 1 - (q - g) for q in indices if q >= g
                )
                kl = len(local_shifts)
                use_flip = kl <= _gex_flip_max()
                acc_r = jnp.zeros_like(rr)
                acc_i = jnp.zeros_like(ii)
                for t in range(1 << h):
                    mask_t = 0
                    for jj, q in enumerate(gq):
                        if (t >> (h - 1 - jj)) & 1:
                            mask_t |= 1 << (g - 1 - q)
                    if mask_t == 0:
                        dr, di = rr, ii
                    else:
                        permt = [(i, i ^ mask_t) for i in range(d)]
                        dr = jax.lax.ppermute(rr, axis, permt)
                        di = jax.lax.ppermute(ii, axis, permt)
                    if use_flip:
                        for lt in range(1 << kl):
                            lmask = 0
                            for j, sh in enumerate(local_shifts):
                                if (lt >> j) & 1:
                                    lmask |= 1 << sh
                            evr = None
                            evi = None
                            for srcg, srcl, vr, vi in decomp:
                                sel = (srcg == (myg ^ t)) & (
                                    (srcl ^ flat) == lmask
                                )
                                term_r = jnp.where(sel, vr, 0)
                                evr = (
                                    term_r if evr is None else evr + term_r
                                )
                                if vi is not None:
                                    term_i = jnp.where(sel, vi, 0)
                                    evi = (
                                        term_i
                                        if evi is None
                                        else evi + term_i
                                    )
                            gr = _xor_flip_flat(dr, lmask)
                            gi = _xor_flip_flat(di, lmask)
                            if evi is None:
                                acc_r = acc_r + gr * evr
                                acc_i = acc_i + gi * evr
                            else:
                                acc_r = acc_r + (gr * evr - gi * evi)
                                acc_i = acc_i + (gi * evr + gr * evi)
                    else:
                        for srcg, srcl, vr, vi in decomp:
                            sel = srcg == (myg ^ t)
                            gr = dr[srcl]
                            gi = di[srcl]
                            if vi is None:
                                tr, ti = gr * vr, gi * vr
                            else:
                                tr = gr * vr - gi * vi
                                ti = gi * vr + gr * vi
                            acc_r = acc_r + jnp.where(sel, tr, 0)
                            acc_i = acc_i + jnp.where(sel, ti, 0)
                re_s = acc_r.reshape(re_s.shape)
                im_s = acc_i.reshape(im_s.shape)
            elif kind == "reflect":
                _, rop, gctrl, lctrl = entry
                from rustqip_tpu.engine.apply import (
                    _geometry,
                    _reflection_sum_2d,
                )

                gq = tuple(q for q in rop.indices if q < g)
                lidx = tuple(q - g for q in rop.indices if q >= g)
                scale = 2.0 / (1 << rop.num_indices)
                _, R_l, C_l = _geometry(local_n)
                x_r = re_s.reshape(R_l, C_l)
                x_i = im_s.reshape(R_l, C_l)
                # Shard-local partial sums (reduced keepdims planes) ...
                sr, shp = _reflection_sum_2d(local_n, lidx, x_r)
                si, _ = _reflection_sum_2d(local_n, lidx, x_i)
                # ... then ONE (grouped) psum over the op's device bits.
                if gq:
                    if len(gq) == g:
                        sr = jax.lax.psum(sr, axis)
                        si = jax.lax.psum(si, axis)
                    else:
                        groups = _reflect_psum_groups(g, gq)
                        sr = jax.lax.psum(
                            sr, axis, axis_index_groups=groups
                        )
                        si = jax.lax.psum(
                            si, axis, axis_index_groups=groups
                        )
                xs_r = x_r.reshape(shp) if shp is not None else x_r
                xs_i = x_i.reshape(shp) if shp is not None else x_i
                out_r = (scale * sr - xs_r).reshape(R_l, C_l)
                out_i = (scale * si - xs_i).reshape(R_l, C_l)
                if gctrl or lctrl:
                    mask = jnp.ones((R_l, C_l), dtype=bool)
                    for q in gctrl:
                        mask = mask & (((my >> (g - 1 - q)) & 1) == 1)
                    if lctrl:
                        flat = jnp.arange(
                            re_s.size, dtype=jnp.int32
                        ).reshape(R_l, C_l)
                        for ql in lctrl:
                            mask = mask & (
                                ((flat >> (local_n - 1 - ql)) & 1) == 1
                            )
                    out_r = jnp.where(mask, out_r, x_r)
                    out_i = jnp.where(mask, out_i, x_i)
                re_s = out_r.reshape(re_s.shape)
                im_s = out_i.reshape(im_s.shape)
            elif kind == "fndiag":
                _, fop = entry
                flat = jnp.arange(re_s.size, dtype=jnp.int32)
                k = fop.num_indices
                idt = _op_index_dtype(k)
                idx = jnp.zeros(flat.shape, idt)
                pat = jnp.zeros((), idt)
                for t, q in enumerate(fop.indices):
                    shift = k - 1 - t
                    if q < g:
                        pat = pat | (
                            ((my >> (g - 1 - q)) & 1).astype(idt) << shift
                        )
                    else:
                        idx = idx | (
                            ((flat >> (local_n - 1 - (q - g))) & 1).astype(
                                idt
                            )
                            << shift
                        )
                _, val = fop.fn(idx | pat)
                val = jnp.asarray(val)
                rr, ii = re_s.reshape(-1), im_s.reshape(-1)
                if jnp.iscomplexobj(val):
                    fr = jnp.real(val).astype(rr.dtype)
                    fi = jnp.imag(val).astype(rr.dtype)
                    if fop.conjugated:
                        fi = -fi
                    rr, ii = rr * fr - ii * fi, rr * fi + ii * fr
                else:
                    fr = val.astype(rr.dtype)
                    rr, ii = rr * fr, ii * fr
                re_s = rr.reshape(re_s.shape)
                im_s = ii.reshape(im_s.shape)
            else:  # diag
                _, terms = entry
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
                                ((flat >> (local_n - 1 - (q - g))) & 1)
                                << shift
                            )
                    idx = vec | pat
                    fr = jnp.take(jnp.asarray(tre, dtype=rr.dtype), idx)
                    fi = jnp.take(jnp.asarray(tim, dtype=rr.dtype), idx)
                    rr, ii = rr * fr - ii * fi, rr * fi + ii * fr
                re_s = rr.reshape(re_s.shape)
                im_s = ii.reshape(im_s.shape)
        return re_s, im_s

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        # pallas_call results carry no varying-mesh-axes annotation, so
        # the per-shard kernel path needs vma checking off (as do the
        # measurement shard_maps).
        check_vma=False,
    )
    def run(re_s, im_s):
        my = jax.lax.axis_index(axis)
        if times == 1:
            return step(my, re_s, im_s)
        return jax.lax.fori_loop(
            0, times, lambda _, c: step(my, c[0], c[1]), (re_s, im_s)
        )

    return run(re, im)


def apply_sharded_op(
    mesh: jax.sharding.Mesh, n: int, op: MatrixOp, re: jnp.ndarray,
    im: jnp.ndarray,
) -> Pair:
    """Apply one gate op to a mesh-sharded (re, im) state pair.

    Every op class is supported, each with its cheapest hand-picked
    schedule (see the module docstring). The GSPMD executor in
    ``sharded.py`` is the compiler-scheduled alternative; this path pins
    the collective schedule by hand.
    """
    return apply_sharded_ops(mesh, n, [op], re, im)


def make_sharded_pair(
    mesh: jax.sharding.Mesh, n: int, initial_index: int = 0, dtype=np.float32
) -> Pair:
    """A basis-state (re, im) pair sharded over the mesh."""
    axis, d, g = _mesh_geometry(mesh)
    sharding = NamedSharding(mesh, P(axis))
    re = jnp.zeros(1 << n, dtype=dtype).at[initial_index].set(1.0)
    im = jnp.zeros(1 << n, dtype=dtype)
    return jax.device_put(re, sharding), jax.device_put(im, sharding)
