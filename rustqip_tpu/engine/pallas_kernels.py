"""Pallas TPU kernels for the hot gate-apply path.

The single hottest operation in state-vector simulation is "apply a fused
k-qubit unitary to every 2^m-amplitude group": with the low-qubit block
expanded to C x C (C = 128 = one MXU tile), it is exactly

    out[R, C] = state[R, C] @ B^T

over complex amplitudes stored as separate float32 planes (complex never
materializes on TPU here). The kernel streams row blocks HBM -> VMEM,
issues the four real matmuls of the complex product on the MXU, and writes
back — one read + one write of the state per gate pass, the speed-of-light
minimum. (XLA's complex dot lowering reads each operand plane twice; doing
it in one kernel halves traffic.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rustqip_tpu.types import MINOR_QUBITS

_C = 1 << MINOR_QUBITS  # 128

def _diag_mask_max() -> int:
    """Row-support GROUP count above which a diag step's phase evaluates
    by ANGLE ACCUMULATION + one block cos/sin instead of per-group
    masked broadcast multiplies (see ``diag_phase``/``diag_factors``).
    At ~10 VPU ops per masked group vs ~2 per accumulated one plus a
    ~20-35 op block cos/sin, break-even sits around 4.
    RUSTQIP_TPU_DIAG_MASK_MAX overrides (large value = always-mask —
    the A/B lever); joins the compile-cache fingerprint via
    ``compile._env_plan_flags``."""
    import os

    try:
        return int(os.environ.get("RUSTQIP_TPU_DIAG_MASK_MAX", "4"))
    except ValueError:
        return 4

#: True-f32 dots (the TPU "default" silently drops to bf16 — 2.7e-3 rel
#: error per pass; see engine.apply.MATMUL_PRECISION).
_PREC = jax.lax.Precision.HIGHEST

#: Rows per grid step. 8 * 128 sublane tiles; 512 rows x 128 lanes x 4B x 2
#: planes x (in + out) = 1 MiB of VMEM per step — far under the 16 MiB
#: budget while long enough to hide DMA latency.
_BLOCK_ROWS = 512


def _block_rows_policy() -> int:
    """RUSTQIP_TPU_BLOCK_ROWS overrides the non-diag window block size
    (power of two, 256..2048). Plan-affecting (block size gates rbf
    admission and VMEM requests), so it joins ``_env_plan_flags``."""
    import os

    try:
        v = int(os.environ.get("RUSTQIP_TPU_BLOCK_ROWS", str(_BLOCK_ROWS)))
    except ValueError:
        return _BLOCK_ROWS
    return v if v in (256, 512, 1024, 2048) else _BLOCK_ROWS


def available() -> bool:
    """Use the Pallas kernel?

    On TPU this is the fast path (one read+write per gate pass). Exception:
    under the axon remote-compile relay each Mosaic kernel costs ~10-20
    minutes of AOT compile (it runs fine afterwards), so it defaults off
    there; set RUSTQIP_TPU_PALLAS=1/0 to override either way.
    """
    import os

    if jax.default_backend() != "tpu":
        return False
    env = os.environ.get("RUSTQIP_TPU_PALLAS")
    if env is not None:
        return env == "1"
    return "PALLAS_AXON_TPU_GEN" not in os.environ


def _scalar_pair(sr, si, v):
    """(sr + i si) * v with trace-time special cases, or None for v == 0
    (the term contributes nothing to an accumulation). Shared by the
    kernel's mix and rmix scalar branches — keep any new special case in
    this one place (real_apply._scalar_mul is the XLA-path analog)."""
    if v == 0:
        return None
    if v == 1:
        return sr, si
    if v.imag == 0:
        return sr * v.real, si * v.real
    if v.real == 0:
        return -si * v.imag, sr * v.imag
    return sr * v.real - si * v.imag, sr * v.imag + si * v.real


def _window_qubits(n: int, seg_sizes) -> list:
    """Qubit ids of the window bits, from the segment layout: window bit
    j sits above seg_sizes[j+1..h] and the h-1-j lower window bits."""
    h = len(seg_sizes) - 1
    m = min(n, MINOR_QUBITS)
    n_m = n - m
    wq = []
    for j in range(h):
        pos = sum(
            int(seg_sizes[k]).bit_length() - 1 for k in range(j + 1, h + 1)
        ) + (h - 1 - j)
        wq.append(n_m - 1 - pos)
    return wq


def _window_row_positions(seg_sizes) -> list:
    """Absolute ROW-iota bit position of each window bit (the positions
    butterfly ctrl specs ("r", pos) test against)."""
    h = len(seg_sizes) - 1
    return [
        sum(int(seg_sizes[k]).bit_length() - 1 for k in range(j + 1, h + 1))
        + (h - 1 - j)
        for j in range(h)
    ]


def _specialize_groups(groups, wvals):
    """Partially evaluate diag angle groups for one strip: ``wvals`` maps
    window QUBIT ids to their 0/1 value in the strip (free qubits absent).
    Monomials touching a 0-valued window bit DROP, fully-window monomials
    fold into the constant, and mixed monomials whose row part was all
    window bits demote to (cheaper) col monomials. QFT ladders lose half
    their transcendental work this way (the controlled-phase diag of a
    window qubit is the identity on every bit=0 strip). Shared by the
    kernel body and ``window_strip_activity`` so the trace-time identity
    decision and the planner's strip-skip decision cannot diverge."""
    const, row_monos, col_monos, mixed = groups
    const2 = float(const)
    rm2 = []
    for rq, c in row_monos:
        keep, dead = [], False
        for q in rq:
            v = wvals.get(q)
            if v == 0:
                dead = True
                break
            if v is None:
                keep.append(q)
        if dead:
            continue
        if keep:
            rm2.append((tuple(keep), c))
        else:
            const2 += c
    cm2 = list(col_monos)
    mx2 = []
    for rq, cq, c in mixed:
        keep, dead = [], False
        for q in rq:
            v = wvals.get(q)
            if v == 0:
                dead = True
                break
            if v is None:
                keep.append(q)
        if dead:
            continue
        if keep:
            mx2.append((tuple(keep), cq, c))
        else:
            cm2.append((cq, c))
    return const2, tuple(rm2), tuple(cm2), tuple(mx2)


def _strip_skip_enabled() -> bool:
    """RUSTQIP_TPU_KERNEL_SKIP_STRIPS=0 disables identity-strip skipping
    (the sparse-window traffic optimization); default on. Joins the
    compile-cache fingerprint via ``compile._env_plan_flags``."""
    import os

    return os.environ.get("RUSTQIP_TPU_KERNEL_SKIP_STRIPS", "1") != "0"


def _strip_skip_plan(n, seg_sizes, steps, ns):
    """Shared gating for identity-strip skipping: ``(in_ids, out_ids,
    skip)``. ``out_ids`` empty means the whole window is the identity;
    when skipping is disabled or saves nothing the id sets widen to all
    ``ns`` strips and ``skip`` is False. ONE decision point so the
    interpret path (what CPU parity tests execute) and the pipelined
    real-TPU path can never gate differently."""
    in_ids, out_ids = window_strip_activity(n, seg_sizes, steps)
    if not out_ids:
        return in_ids, out_ids, False
    skip = _strip_skip_enabled() and (len(in_ids) + len(out_ids) < 2 * ns)
    if not skip:
        in_ids = out_ids = tuple(range(ns))
    return in_ids, out_ids, skip


def window_strip_activity(n: int, seg_sizes, steps):
    """Which window strips must a sweep READ from / WRITE back to HBM?

    Returns ``(in_ids, out_ids)`` sorted strip-index tuples. Controlled
    and permutation ops are SPARSE in strip space — a CCX expands to a
    mix step that is the identity on 6 of its 8 strips — so with in-place
    (aliased) outputs the untouched strips need no HBM traffic at all:
    the sweep reads only the strips some computation consumes and writes
    only the strips whose value changes. The reference's iterators touch
    every amplitude regardless (matrix_ops.rs:98-152); this is the
    TPU-native analog of "a controlled gate only owes its controlled
    subspace".

    The analysis runs per step, tracking the modified set:

    - ``mix``/``rmix``: a strip is written unless its only block is the
      1-valued diagonal; inputs are its nonzero block columns.
    - ``diag``: per-strip specialization (``_specialize_groups``) —
      identity strips (no surviving monomials, zero constant) skip.
    - ``cbf``/``rbf``/``cmix``: a strip is untouched when a ("r", pos)
      control tests a WINDOW bit that is 0 there (trace-time known);
      otherwise read+written (in-block partner / strip pair).
    - ``low``/``lowr``: every strip.
    """
    h = len(seg_sizes) - 1
    ns = 1 << h
    wq = _window_qubits(n, seg_sizes)
    pos_to_j = {p: j for j, p in enumerate(_window_row_positions(seg_sizes))}

    def wbit(i, j):
        return (i >> (h - 1 - j)) & 1

    def ctrl_dead(i, ctrl):
        return any(
            ck == "r" and pc in pos_to_j and wbit(i, pos_to_j[pc]) == 0
            for ck, pc in ctrl
        )

    modified: set = set()
    reads: set = set()

    def consume(i):
        if i not in modified:
            reads.add(i)

    for step in steps:
        kind = step[0]
        if kind in ("mix", "rmix"):
            blocks = step[1]
            newmod = set()
            for j in range(ns):
                ins = []
                for i in range(ns):
                    blk = blocks.get((j, i))
                    if blk is None:
                        continue
                    if kind == "mix":
                        if blk == 0:
                            continue
                        one = blk == 1
                    else:
                        if blk[0] == "scalar" and blk[1] == 0:
                            continue
                        one = blk[0] == "scalar" and blk[1] == 1
                    ins.append((i, one))
                if len(ins) == 1 and ins[0] == (j, True):
                    continue  # identity on this strip
                for i, _ in ins:
                    consume(i)
                newmod.add(j)
            modified |= newmod
        elif kind == "diag":
            for i in range(ns):
                wvals = {wq[j]: wbit(i, j) for j in range(h)}
                const2, rm2, cm2, mx2 = _specialize_groups(step[1], wvals)
                if not rm2 and not cm2 and not mx2 and const2 == 0.0:
                    continue
                consume(i)
                modified.add(i)
        elif kind in ("cbf", "rbf"):
            ctrl = step[3] if len(step) > 3 else ()
            for i in range(ns):
                if ctrl_dead(i, ctrl):
                    continue
                consume(i)
                modified.add(i)
        elif kind == "cmix":
            bp = step[1]
            ctrl = step[3] if len(step) > 3 else ()
            for j0 in range(ns):
                if j0 & (1 << bp):
                    continue
                j1 = j0 | (1 << bp)
                # ctrl bits are disjoint from the target bit, so one
                # deadness answer serves the pair
                if ctrl_dead(j0, ctrl):
                    continue
                consume(j0)
                consume(j1)
                modified |= {j0, j1}
        else:  # low / lowr: per-strip matmul on every strip
            for i in range(ns):
                consume(i)
                modified.add(i)
    return tuple(sorted(reads)), tuple(sorted(modified))


def _window_kernel_body(n: int, seg_sizes, steps, br, in_ids, out_ids, *refs):
    """Kernel body: chain a whole strip-window in VMEM.

    ``refs`` = len(in_ids) (xr, xi) input ref pairs (one per strip the
    sweep reads — ``window_strip_activity``), per-low-step (br, bi)
    matrix refs, then len(out_ids) (or, oi) output ref pairs. Each grid
    step holds one row block of every LIVE strip, so scalar-high mixes,
    C x C matmuls, unitary diagonals (phase factors evaluated in-body
    from the block's row/col iotas), AND single-column-qubit gates
    (lane-roll butterflies — a 2x2 on lane bit p costs ~8 VPU
    ops/element instead of a 128-wide MXU matmul) chain without
    returning to HBM — the whole window costs one read+write of the
    ACTIVE strips plus compute (skipped strips persist via output
    aliasing).
    """
    from jax.experimental import pallas as pl

    h = len(seg_sizes) - 1
    ns = 1 << h

    def _mat_end(ent):
        return ent[1] + (3 if ent[0] == "low" else 1)

    n_mat_refs = 0
    for s in steps:
        if s[0] in ("low", "lowr"):
            n_mat_refs = max(n_mat_refs, _mat_end(s))
        elif s[0] == "rmix":
            for blk in s[1].values():
                if blk[0] != "scalar":
                    n_mat_refs = max(n_mat_refs, _mat_end(blk))
    n_in = len(in_ids)
    ins = refs[: 2 * n_in]
    mats = refs[2 * n_in : 2 * n_in + n_mat_refs]
    outs = refs[2 * n_in + n_mat_refs :]
    m = min(n, MINOR_QUBITS)
    n_m = n - m
    sl = seg_sizes[-1] // br
    r_id = pl.program_id(0)

    def block_rows(i):
        """Full row indices (B, 1) of strip i's current block — the same
        strip-ordinal factoring as ``_strip_index_map`` (shared helper;
        here it runs on the traced grid index)."""
        blk_row, _ = _strip_index_map(seg_sizes, sl, i)(r_id)
        base = blk_row * br
        return base + jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, _C), 1)

    def ctrl_col_mask(ctrl):
        """Column-control conjunction of a ("r"|"c", bit) spec —
        strip-independent, computed once per step. None when the spec
        has no column bits. ONE definition shared by every controlled
        step kind (cbf/rbf/cmix) so their mask semantics cannot
        diverge."""
        cmask = None
        for ck, pc in ctrl:
            if ck == "c":
                m_ = ((cols >> pc) & 1) == 1
                cmask = m_ if cmask is None else (cmask & m_)
        return cmask

    def ctrl_mask_for(ctrl, cmask, i):
        """Full control mask for strip ``i``: the precomputed column
        part AND the row bits read from the strip's absolute row iota."""
        m_ = cmask
        rabs = None
        for ck, pc in ctrl:
            if ck == "r":
                if rabs is None:
                    rabs = block_rows(i)
                mr = ((rabs >> pc) & 1) == 1
                m_ = mr if m_ is None else (m_ & mr)
        return m_

    _wq = _window_qubits(n, seg_sizes)
    _pos_to_j = {
        p: j for j, p in enumerate(_window_row_positions(seg_sizes))
    }

    def _specialize(groups, i):
        """Per-strip partial evaluation of diag angle groups (module-level
        ``_specialize_groups`` with this strip's window-bit values)."""
        wvals = {_wq[j]: (i >> (h - 1 - j)) & 1 for j in range(h)}
        return _specialize_groups(groups, wvals)

    def _ctrl_dead(i, ctrl):
        """True when a ("r", pos) control tests a WINDOW bit that is 0 in
        strip ``i`` — the step is the identity there at trace time (the
        same predicate ``window_strip_activity`` uses, so the skip
        decision and the body agree)."""
        return any(
            ck == "r" and pc in _pos_to_j
            and ((i >> (h - 1 - _pos_to_j[pc])) & 1) == 0
            for ck, pc in ctrl
        )

    def diag_factors(groups, i):
        """Separable phase factors of the angle over strip i's block:
        ``((rc, rs), (cc, cs), masks)`` with e^{i angle} = (rc + i rs)
        (br, 1) x (cc + i cs) (1, C) x masked per-element factors.

        The row/col monomial sums are SEPARABLE — e^{i(a_row + a_col)} =
        e^{i a_row} e^{i a_col} — so cos/sin run over br + C VECTOR
        elements instead of br x C block elements. Mixed (free-row x
        col) monomials GROUP BY ROW SUPPORT: within a group the col
        parts are separable too, so the group folds into one (br, 1)
        row mask + one (1, C) lane-vector phase (cos/sin on C elements,
        ~free) — a QFT CP fan (r_t x 7 lanes) is ONE group, one masked
        broadcast multiply, where the old per-monomial scalar masks paid
        7 masked multiplies on (br, C) masks (same-session v5e A/B
        2026-08-20: seam sweep 93.5 -> 73.9 ms came from replacing that
        with a block cos/sin; this grouping removes the block
        transcendental as well)."""
        const, row_monos, col_monos, mixed = groups
        rows = block_rows(i)

        def rbit(q):
            return ((rows >> (n_m - 1 - q)) & 1).astype(jnp.float32)

        def cbit(q):
            return ((cols >> (n - 1 - q)) & 1).astype(jnp.float32)

        def mono(bits, coeff):
            acc = None
            for b in bits:
                acc = b if acc is None else acc * b
            return acc * jnp.float32(coeff)

        rfac = None
        if row_monos or const != 0.0:
            angle = jnp.full((br, 1), const, dtype=jnp.float32)
            for rq, c in row_monos:
                angle = angle + mono([rbit(q) for q in rq], c)
            rfac = (jnp.cos(angle), jnp.sin(angle))
        cfac = None
        if col_monos:
            cangle = jnp.zeros((1, _C), dtype=jnp.float32)
            for cq, c in col_monos:
                cangle = cangle + mono([cbit(q) for q in cq], c)
            cfac = (jnp.cos(cangle), jnp.sin(cangle))
        by_row = {}
        for rq, cq, c in mixed:
            by_row.setdefault(rq, []).append((cq, c))
        masks = []
        for rq, terms in by_row.items():
            mask = mono([rbit(q) for q in rq], 1.0)
            vangle = jnp.zeros((1, _C), dtype=jnp.float32)
            for cq, c in terms:
                vangle = vangle + mono([cbit(q) for q in cq], c)
            masks.append((mask, jnp.cos(vangle), jnp.sin(vangle)))
        return rfac, cfac, masks

    def diag_phase(groups, i):
        """(pc, ps) phase planes for one strip's block.

        Few ROW-SUPPORT GROUPS of mixed monomials (a QFT CP fan is one
        group however many lanes it spans): the grouped-mask path in
        ``diag_factors`` — all transcendentals on (br,1)/(1,C) vectors,
        ~10 VPU ops per group per element. Many groups (every monomial a
        distinct row support): ANGLE ACCUMULATION — add the G outer
        products onto a (br, C) angle plane (2 ops per group) and pay
        ONE block-shaped cos/sin (~20-35 ops), which beats G masked
        multiplies once G exceeds ~4. Both replaced the per-MONOMIAL
        scalar masks whose ~10 ops x 7 monomials x 10 steps made QFT-28's
        seam sweep 93.5 ms of a 232.9 ms total (profiled 2026-08-20;
        block-angle landed 73.9 ms, grouping removes the block cos/sin
        too)."""
        const, row_monos, col_monos, mixed = groups
        if len({rq for rq, _cq, _c in mixed}) <= _diag_mask_max():
            return _combine_factors(*diag_factors(groups, i))
        rows = block_rows(i)

        def rbit(q):
            return ((rows >> (n_m - 1 - q)) & 1).astype(jnp.float32)

        def cbit(q):
            return ((cols >> (n - 1 - q)) & 1).astype(jnp.float32)

        def mono(bits, coeff):
            acc = None
            for b in bits:
                acc = b if acc is None else acc * b
            return acc * jnp.float32(coeff)

        angle = jnp.full((br, 1), const, dtype=jnp.float32)
        for rq, c in row_monos:
            angle = angle + mono([rbit(q) for q in rq], c)
        cangle = jnp.zeros((1, _C), dtype=jnp.float32)
        for cq, c in col_monos:
            cangle = cangle + mono([cbit(q) for q in cq], c)
        by_row = {}
        for rq, cq, c in mixed:
            by_row.setdefault(rq, []).append((cq, c))
        angle = angle + cangle
        for rq, terms in by_row.items():
            v = jnp.zeros((1, _C), dtype=jnp.float32)
            for cq, c in terms:
                v = v + mono([cbit(q) for q in cq], c)
            angle = angle + mono([rbit(q) for q in rq], 1.0) * v
        return jnp.cos(angle), jnp.sin(angle)

    def _combine_factors(rfac, cfac, masks):
        """Fold separable + masked factors into one complex phase array
        of the minimal broadcastable shape ((br,1), (1,C) or (br,C)).
        Each mask entry is (row mask (br,1), cos, sin) where cos/sin are
        scalar-or-(1,C) lane-vector phases (grouped mixed monomials)."""
        if rfac is None and cfac is None:
            pc = jnp.ones((1, 1), jnp.float32)
            ps = jnp.zeros((1, 1), jnp.float32)
        elif cfac is None:
            pc, ps = rfac
        elif rfac is None:
            pc, ps = cfac
        else:
            rc, rs = rfac
            cc, cs = cfac
            pc, ps = rc * cc - rs * cs, rc * cs + rs * cc
        for mask, mc, ms in masks:
            nr = pc * mc - ps * ms
            ni = pc * ms + ps * mc
            pc = pc + mask * (nr - pc)
            ps = ps + mask * (ni - ps)
        return pc, ps

    def _dot(x, m):
        return jnp.dot(
            x, m, preferred_element_type=jnp.float32, precision=_PREC
        )

    def _matmul_pair(xr, xi, ent):
        """(xr + i xi) @ B^T via a ("lowr"/"low", idx) operand entry:
        real B = 2 dots, complex B = 3-dot Karatsuba."""
        if ent[0] == "lowr":
            mr = mats[ent[1]][:]
            return _dot(xr, mr), _dot(xi, mr)
        mr = mats[ent[1]][:]
        mi = mats[ent[1] + 1][:]
        ms = mats[ent[1] + 2][:]
        rr = _dot(xr, mr)
        ii = _dot(xi, mi)
        m_ = _dot(xr + xi, ms)
        return rr - ii, m_ - rr - ii

    # Live strips: value-by-strip-id. Strips outside in_ids join when a
    # step first PRODUCES them (window_strip_activity guarantees every
    # CONSUMED strip is in in_ids); strips a step leaves alone keep their
    # entry (or stay absent — output aliasing preserves them in HBM).
    cur = {
        sid: (ins[2 * k][:], ins[2 * k + 1][:])
        for k, sid in enumerate(in_ids)
    }

    def _zeros():
        return jnp.zeros((br, _C), jnp.float32)

    for step in steps:
        if step[0] == "diag":
            groups = step[1]
            cache = {}  # strips with identical specialized groups share
            for i in sorted(cur):
                xr, xi = cur[i]
                sg = _specialize(groups, i)
                const2, rm2, cm2, mx2 = sg
                if not rm2 and not cm2 and not mx2 and const2 == 0.0:
                    continue  # identity on this strip
                # Cache key: strips differ only in WINDOW bit values, so
                # free-bit factors are identical whenever the specialized
                # groups coincide (free row bits carry the same pattern
                # across paired strip blocks at a given grid step). The
                # CACHED value is the fully COMBINED phase (row x col
                # outer product + masked mixed factors): building it
                # costs one (br, C)-shaped pass per DISTINCT group —
                # amortized across the strips sharing it (a QFT ladder's
                # bit=1 strips all share one) — and every strip then
                # pays exactly ONE complex multiply, same as the old
                # transcendental path but with cos/sin on br + C vector
                # elements only.
                if sg in cache:
                    pc, ps = cache[sg]
                else:
                    pc, ps = diag_phase(sg, i)
                    cache[sg] = (pc, ps)
                cur[i] = (xr * pc - xi * ps, xr * ps + xi * pc)
            continue
        if step[0] in ("cbf", "rbf"):
            # 2x2 [[a,b],[c,d]] butterfly on one in-block index bit: out
            # at positions with the bit clear = a*x + b*partner; set =
            # d*x + c*partner. "cbf" pairs lanes (column bit p, roll on
            # axis 1), "rbf" pairs sublane rows (row bit p < log2(br),
            # roll on axis 0 — the partner rows live inside the same
            # block, so no strips are needed). Exact f32 (no dots); ~2x
            # cheaper than a HIGHEST-precision 128-wide matmul.
            # An optional 4th element carries CONTROL bits (("r"|"c",
            # absolute bit position) pairs): the butterfly result is
            # select-masked against absolute row/col iotas, so
            # controlled single-qubit gates — CCX/CNOT chains, wide
            # multi-controlled phases — chain in-window at any control
            # position (only the TARGET needs in-block locality).
            from jax.experimental.pallas import tpu as pltpu

            p, coeffs = step[1], step[2]
            ctrl = step[3] if len(step) > 3 else ()
            a, b, c, d = coeffs
            s = 1 << p
            if step[0] == "cbf":
                axis, size = 1, _C
                bit = ((cols >> p) & 1) == 1
            else:
                axis, size = 0, br
                rows_io = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0)
                bit = ((rows_io >> p) & 1) == 1
            # Symmetric coefficients (a == d, b == c) need no per-lane
            # coefficient vectors at all: y = a*x + b*partner with SCALAR
            # factors, and _scalar_pair folds the 0/1/±i cases away. This
            # is the hot path for the arithmetic library — X-type CCX/
            # CNOT carry ladders (a=d=0, b=c=1) reduce to a masked
            # partner select, skipping 4 multiplies + 2 adds per plane
            # per step (the adder's 63-step window is VPU-bound).
            scalar_fold = a == d and b == c
            if not scalar_fold:
                u_r = jnp.where(
                    bit, np.float32(d.real), np.float32(a.real)
                )
                v_r = jnp.where(
                    bit, np.float32(c.real), np.float32(b.real)
                )
            real_only = all(v.imag == 0 for v in coeffs)
            if not scalar_fold and not real_only:
                u_i = jnp.where(bit, np.float32(d.imag), np.float32(a.imag))
                v_i = jnp.where(bit, np.float32(c.imag), np.float32(b.imag))
            cmask = ctrl_col_mask(ctrl)
            for i in sorted(cur):
                if _ctrl_dead(i, ctrl):
                    continue  # a window control bit is 0: identity strip
                xr, xi = cur[i]
                pr = jnp.where(
                    bit,
                    pltpu.roll(xr, s, axis),
                    pltpu.roll(xr, size - s, axis),
                )
                pi = jnp.where(
                    bit,
                    pltpu.roll(xi, s, axis),
                    pltpu.roll(xi, size - s, axis),
                )
                if scalar_fold:
                    tx = _scalar_pair(xr, xi, a)
                    tp = _scalar_pair(pr, pi, b)
                    if tx is None and tp is None:
                        yr = jnp.zeros_like(xr)
                        yi = jnp.zeros_like(xi)
                    elif tx is None:
                        yr, yi = tp
                    elif tp is None:
                        yr, yi = tx
                    else:
                        yr, yi = tx[0] + tp[0], tx[1] + tp[1]
                elif real_only:
                    yr, yi = u_r * xr + v_r * pr, u_r * xi + v_r * pi
                else:
                    yr = u_r * xr - u_i * xi + v_r * pr - v_i * pi
                    yi = u_r * xi + u_i * xr + v_r * pi + v_i * pr
                if ctrl:
                    m = ctrl_mask_for(ctrl, cmask, i)
                    yr = jnp.where(m, yr, xr)
                    yi = jnp.where(m, yi, xi)
                cur[i] = (yr, yi)
            continue
        if step[0] == "cmix":
            # Controlled INTER-STRIP butterfly: 2x2 [[a,b],[c,d]] on a
            # WINDOW bit — the target row bit sits too high for an
            # in-block rbf roll, so the pair partner is another strip,
            # not a rolled copy. Controls mask against absolute row/col
            # iotas exactly like cbf/rbf (any control position works).
            # This is how wide multi-controlled 1q gates with high-row
            # targets — the arithmetic library's carry/overflow ops,
            # which otherwise cost a whole-state dense pass each —
            # chain in-window. Strictly pairwise (1:1 like mix), so the
            # large block schedule keeps.
            bp, coeffs = step[1], step[2]
            ctrl = step[3] if len(step) > 3 else ()
            a, b, c, d = coeffs
            cmask = ctrl_col_mask(ctrl)

            def _axpy(acc, sr, si, v):
                t = _scalar_pair(sr, si, v)
                if t is None:
                    return acc
                if acc is None:
                    return t
                return (acc[0] + t[0], acc[1] + t[1])

            for j0 in range(ns):
                if j0 & (1 << bp):
                    continue
                if _ctrl_dead(j0, ctrl):
                    continue  # a window control bit is 0: identity pair
                j1 = j0 | (1 << bp)
                x0r, x0i = cur[j0]
                x1r, x1i = cur[j1]
                y0 = _axpy(_axpy(None, x0r, x0i, a), x1r, x1i, b)
                y1 = _axpy(_axpy(None, x0r, x0i, c), x1r, x1i, d)
                if y0 is None:
                    y0 = (jnp.zeros_like(x0r), jnp.zeros_like(x0i))
                if y1 is None:
                    y1 = (jnp.zeros_like(x1r), jnp.zeros_like(x1i))
                # controls are disjoint from the target bit, and the two
                # pair strips differ ONLY in the target bit, so one mask
                # serves both
                m0 = ctrl_mask_for(ctrl, cmask, j0)
                if m0 is not None:
                    y0 = (
                        jnp.where(m0, y0[0], x0r),
                        jnp.where(m0, y0[1], x0i),
                    )
                    y1 = (
                        jnp.where(m0, y1[0], x1r),
                        jnp.where(m0, y1[1], x1i),
                    )
                cur[j0] = y0
                cur[j1] = y1
            continue
        if step[0] in ("low", "lowr"):
            # Per-strip C x C matmul: real B = 2 dots, complex B =
            # Karatsuba (3 dots instead of 4).
            for i in sorted(cur):
                cur[i] = _matmul_pair(cur[i][0], cur[i][1], step)
            continue
        if step[0] == "rmix":
            # Non-scalar row-block mix: out_strip[j] = sum_i f(strip[i])
            # where f is a scalar multiply or a C x C matmul — disjoint
            # dense ops straddling the row/col seam chain in-window.
            blocks = step[1]
            nxt = dict(cur)
            for jw in range(ns):
                ent = []
                for iw in range(ns):
                    blk = blocks.get((jw, iw))
                    if blk is None or (
                        blk[0] == "scalar" and blk[1] == 0
                    ):
                        continue
                    ent.append((iw, blk))
                if (
                    len(ent) == 1
                    and ent[0][0] == jw
                    and ent[0][1][0] == "scalar"
                    and ent[0][1][1] == 1
                ):
                    continue  # identity on this strip
                acc_r = acc_i = None
                for iw, blk in ent:
                    sr, si = cur[iw]
                    if blk[0] == "scalar":
                        t = _scalar_pair(sr, si, blk[1])
                        if t is None:
                            continue
                        tr, ti = t
                    else:
                        tr, ti = _matmul_pair(sr, si, blk)
                    if acc_r is None:
                        acc_r, acc_i = tr, ti
                    else:
                        acc_r, acc_i = acc_r + tr, acc_i + ti
                if acc_r is None:
                    acc_r, acc_i = _zeros(), _zeros()
                nxt[jw] = (acc_r, acc_i)
            cur = nxt
        else:  # mix: {(j, i): complex scalar}
            blocks = step[1]
            nxt = dict(cur)
            for j in range(ns):
                ent = [
                    (i, blocks[(j, i)])
                    for i in range(ns)
                    if blocks.get((j, i)) not in (None, 0)
                ]
                if len(ent) == 1 and ent[0] == (j, 1):
                    continue  # identity on this strip
                acc_r = acc_i = None
                for i, v in ent:
                    sr, si = cur[i]
                    t = _scalar_pair(sr, si, v)
                    if t is None:
                        continue
                    tr, ti = t
                    if acc_r is None:
                        acc_r, acc_i = tr, ti
                    else:
                        acc_r, acc_i = acc_r + tr, acc_i + ti
                if acc_r is None:
                    acc_r, acc_i = _zeros(), _zeros()
                nxt[j] = (acc_r, acc_i)
            cur = nxt
    for k, sid in enumerate(out_ids):
        outs[2 * k][:] = cur[sid][0]
        outs[2 * k + 1][:] = cur[sid][1]


#: Largest scoped-VMEM request a window sweep may make (bytes). v5e has
#: 128 MiB of VMEM; leaving ~28 MiB for XLA's own scratch is safe. The
#: planner (`real_apply._window_kernel_applicable`) rejects windows whose
#: estimated request exceeds this, so prefix salvage splits over-long op
#: chains into multiple sweeps instead of failing at compile time.
WINDOW_VMEM_CEIL = 100 * 1024 * 1024

#: XLA's default scoped-VMEM limit; requests below this pass it through.
_VMEM_DEFAULT = 16 * 1024 * 1024


def window_vmem_request(h: int, steps, br: int, n_mats: int = None) -> int:
    """Estimated scoped-VMEM need (bytes) of one window sweep, used both
    as the kernel's ``vmem_limit_bytes`` request and as the planner's
    admission cap.

    Measured behavior behind the model (v5e, relay AOT): Mosaic's stack
    allocation grows ~one (br, 128) f32 block per kernel step — a 65-step
    h=1 br=512 butterfly chain hit 17.77 MiB against the 16 MiB default
    (~0.85 block/step + 4 MiB pipeline buffers), while the 21-step QFT
    seam window (10 of them diag) fit. Components:

    - pipeline buffers: 2^h strips x 2 planes x (in+out) x double-buffer
    - body stack: ~1 block per step; diag steps carry transcendental
      temporaries (x2), and wider windows scale with live strips (x ns/2)
    - matrix operands: (C, C) f32 pairs resident in VMEM
    """
    ns = 1 << h
    blk = br * _C * 4
    buffers = 8 * ns * blk
    has_diag = any(s[0] == "diag" for s in steps)
    # Measured calibration points for the diag multiplier: at br <= 128
    # the x2 model covered every proven shape; at br = 512 a low-heavy
    # diag window measured 36.23M actual against a 28M x2-model request
    # (parity gate, 2026-08-19) — large blocks keep more per-step
    # temporaries live, so the multiplier rises to x3 there (x3 covers
    # 36.23M with margin; the request is a LIMIT, over-asking only
    # shrinks nothing as one kernel runs at a time).
    diag_mult = (3 if br >= 256 else 2) if has_diag else 1
    # ns/2 live blocks per step is the h<=3 calibration; at ns=16 (h=4)
    # a mix step holds BOTH strip generations (~ns blocks) at its
    # boundary — Grover-28's 4-step h=4 mix window measured 25.75M
    # actual against a 21.38M ns/2-model request (AOT OOM, 2026-08-19).
    strip_mult = ns if ns >= 16 else max(1, ns // 2)
    stack = len(steps) * blk * diag_mult * strip_mult
    # rmix steps hold one ACCUMULATOR block per output strip per plane
    # live for the whole step (out[j] = sum_i B[i,j] @ in[i]) on top of
    # the generic per-step block — the adder's merged 78-block rmix
    # window measured 17.34M actual against a 16.75M request without
    # this term (one kernel sweep, 2026-08-19).
    stack += sum(2 * ns * blk for s in steps if s[0] == "rmix")
    if n_mats is None:
        # worst case 3 operand arrays per matmul step (Karatsuba
        # re/im/re+im for complex matrices, pre-dedup)
        n_mats = 3 * _n_matmul_steps(steps)
    mats = n_mats * _C * _C * 4
    # Mosaic's actual scoped stack runs a few percent over any analytic
    # sum (register spills, pipeline bookkeeping — observed +3.5% on the
    # adder rmix window, +12% with PARALLEL semantics before that was
    # reverted): ask for 12.5% headroom. At 16 strips (h=4) the spill
    # overhead is much larger and less predictable — Grover-28's h=4
    # windows measured 25.75M actual against a 24.75M 12.5%-headroom
    # request, then (after a 31% bump) a second window hit 24.75M actual
    # against a 23.62M request, i.e. 1.375x its analytic sum (AOT OOMs,
    # 2026-08-20) — so h=4 asks for 50%. Over-asking costs nothing at
    # runtime (one kernel at a time); it only tightens the admission
    # ceiling, where a rejected window degrades to prefix splits.
    total = buffers + stack + mats
    headroom = total // 2 if ns >= 16 else total // 8
    return max(_VMEM_DEFAULT, total + headroom)


def window_block_rows(h: int, steps) -> int:
    """Rows per grid step for a window kernel: 2^h strips live at once
    (x2 planes, in+out, double-buffered by the pipeline). Windows without
    diagonal steps run 512-row blocks up to h=2 (the proven headline
    configuration; 2^h x 512 x 128 x 4 B x 2 planes x 2 dirs x 2 buffers
    = 16 MiB at h=3, over budget — so h=3 halves the block); diagonal
    steps add per-strip transcendental temporaries (a 512-row h=2 diag
    window measured 32 MiB of scoped VMEM against the 16 MiB budget), so
    those scale down with the strip count. "rmix" steps keep EVERY input
    strip live until all output strips are accumulated (out[j] =
    sum_i f(in[i]) — nothing frees mid-step, unlike 1:1 low/mix steps:
    a 512-row h=2 rmix window measured 24.2 MiB scoped VMEM), so they
    take the same reduced schedule as diag windows."""
    if not any(s[0] in ("diag", "rmix") for s in steps):
        br = _block_rows_policy()
        return br if h <= 2 else br // 2
    # Diag windows carry per-strip transcendental temporaries (angle +
    # cos/sin + per-mixed-monomial masks), which scale with the strip
    # count: a 256-row h=2 QFT diag window hit 25.2M scoped VMEM against
    # the 16M budget. Measured-safe points: h<=1 at 512 rows (14.0 ms vs
    # 19.5 ms at 64 rows), h=2 at 128 (14.7 ms vs 16.7 ms at 64, and a
    # 100x faster Mosaic compile: 5 s vs 524 s), h=3 at 64 (128 would
    # scale the temporaries like h=2 at 256 — over budget). Those points
    # predate per-window vmem_limit_bytes requests (windows now ask for
    # what they need, WINDOW_VMEM_CEIL-capped): RUSTQIP_TPU_DIAG_BLOCK_ROWS
    # overrides them for probing — admission still rejects over-ceiling
    # shapes, so an oversized override degrades to prefix splits, not
    # compile OOMs.
    import os

    try:
        dbr = int(os.environ.get("RUSTQIP_TPU_DIAG_BLOCK_ROWS", "0"))
    except ValueError:
        dbr = 0
    if dbr in (64, 128, 256, 512):
        return dbr
    # ADAPTIVE (round 4): diag-bearing windows PREFER 512-row blocks when
    # the (br>=256-calibrated) VMEM model fits the ceiling — big blocks
    # admit rbf bits up to 8, so e.g. QFT-28's middle rbf ladder fuses
    # into the (9,10,11) window: 6 sweeps -> 5, 254 -> 204 ms measured
    # same-session. rmix-bearing windows keep the proven ladder (their
    # keep-every-strip-live stack is not calibrated at large blocks).
    if not any(s[0] == "rmix" for s in steps):
        if window_vmem_request(h, steps, 512) <= WINDOW_VMEM_CEIL:
            return 512
    if h <= 1:
        return _BLOCK_ROWS
    # h=3 at 128 compiled and matched 64's steady time exactly (0.240 vs
    # 0.239 s QFT-28) once specialization pruned the temporaries — but
    # its VMEM fit depends on that pruning, so 64 stays (guaranteed).
    return 128 if h == 2 else 64


def _strip_index_map(seg_sizes, sl: int, i: int):
    """Block index map for strip ``i``: factor the strip-local block
    ordinal into per-segment coordinates, then interleave the strip's
    window-bit values back in."""
    h = len(seg_sizes) - 1

    def index_map(r, i=i):
        d = r % sl
        rest = r // sl
        coords = []
        for s in reversed(seg_sizes[:-1]):
            coords.append(rest % s)
            rest = rest // s
        coords = coords[::-1]
        blk = 0
        for j, c in enumerate(coords):
            blk = (blk * seg_sizes[j] + c) * 2 + ((i >> (h - 1 - j)) & 1)
        return blk * sl + d, 0

    return index_map


def _window_matrix_operands(steps):
    """Split steps into body tags + matrix operand arrays: real B -> a
    ("lowr", idx) operand (2-dot path), complex B -> ("low", idx) with
    (re, im, re+im) Karatsuba operands at mats[idx:idx+3] (3 dots instead
    of 4). "rmix" steps carry {(j, i): ("scalar", v) | ("lowr"/"low",
    idx)} block maps; identical matrices (byte-equal B^T) share one
    operand — a window-expanded rmix references the same few op blocks
    from up to 2^h strip pairs.

    Precision note: the Karatsuba imaginary plane (m - rr - ii with
    pre-rounded xr+xi / Br+Bi operands) carries a small constant-factor
    (~2x) worse worst-case rounding than the plain 4-dot form, so kernel
    outputs match the XLA fallback approximately (~1e-7 rel at f32), not
    bit-exactly. Still f32-grade — every dot runs at HIGHEST — and 25%
    fewer MXU passes; chosen deliberately."""
    body_steps = []
    mats = []
    index_of = {}

    def add_mat(B):
        bt = np.ascontiguousarray(np.asarray(B, dtype=np.complex128).T)
        key = bt.tobytes()
        ent = index_of.get(key)
        if ent is not None:
            return ent
        mbr = np.real(bt).astype(np.float32)
        mbi = np.imag(bt).astype(np.float32)
        if not np.any(mbi):
            ent = ("lowr", len(mats))
            mats.append(mbr)
        else:
            ent = ("low", len(mats))
            mats.extend([mbr, mbi, mbr + mbi])
        index_of[key] = ent
        return ent

    for step in steps:
        if step[0] == "low":
            body_steps.append(add_mat(step[1]))
        elif step[0] == "rmix":
            blocks = {
                k: (blk if blk[0] == "scalar" else add_mat(blk[1]))
                for k, blk in step[1].items()
            }
            body_steps.append(("rmix", blocks))
        else:
            body_steps.append(step)
    return tuple(body_steps), mats


def _inplace_policy(rows: int) -> bool:
    """Alias kernel outputs onto the input state buffers?

    In-place measured 5.5 ms SLOWER per sweep at n=28 (same-buffer DMA
    serializes), so fresh outputs are the default — but fresh outputs
    DOUBLE the HBM footprint, capping the single chip at n=29 (and the
    near-capacity allocation at n=29 measured ~4x per-sweep bandwidth
    loss). Above ~8 GiB of live state traffic the trade flips: aliasing
    lifts the ceiling to n=30 (8.6 GB state in 16 GB HBM). Aliasing is
    CORRECT at any size — each block is read (grid step r) strictly
    before its identical address is written (same step; the pipeline's
    prefetch of step r+1 touches different block offsets) — the policy
    is purely a speed/capacity trade. RUSTQIP_TPU_KERNEL_INPLACE=0/1
    forces either way; default 'auto' = in-place when in+out fresh
    buffers would exceed 8 GiB."""
    import os

    env = os.environ.get("RUSTQIP_TPU_KERNEL_INPLACE", "auto")
    if env in ("0", "1"):
        return env == "1"
    return 2 * 2 * rows * _C * 4 >= 8 * 1024**3


def _window_sweep_pipelined(n, xr, xi, seg_sizes, steps, br):
    """One VMEM-resident window sweep with an inner ``emit_pipeline``:
    strided input AND output block index maps, so the kernel writes the
    canonical (rows, C) layout directly — one state read + one write,
    nothing else. Outputs are fresh buffers below ~8 GiB of state
    traffic and alias the inputs above it (``_inplace_policy``).

    STRIP-SPARSE sweeps (``window_strip_activity`` finds identity
    strips — a lone CCX touches 2 of its 8) force in-place outputs and
    stream ONLY the active strips: the HBM traffic drops from one full
    state read+write to (reads + writes)/2^h of it, beating the
    whole-state one-pass floor on controlled/permutation gates. The
    reference's apply loop always walks every amplitude
    (matrix_ops.rs:98-152)."""
    import functools as _ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = xr.shape[0]
    h = len(seg_sizes) - 1
    ns = 1 << h
    srows = rows // ns
    nblk = srows // br
    sl = seg_sizes[-1] // br
    in_ids, out_ids, skip = _strip_skip_plan(n, seg_sizes, steps, ns)
    if not out_ids:
        return xr, xi  # whole window is the identity
    body_steps, mats = _window_matrix_operands(steps)
    n_mats = len(mats)
    # Skipping REQUIRES aliasing: the unwritten strips' data must already
    # live in the output buffer.
    in_place = skip or _inplace_policy(rows)

    def outer(*refs):
        xr_h, xi_h = refs[0], refs[1]
        mrefs = refs[2 : 2 + n_mats]
        or_h, oi_h = refs[2 + n_mats :]

        def body(*brefs):
            ins = brefs[: 2 * len(in_ids)]
            outs = brefs[2 * len(in_ids) :]
            _window_kernel_body(
                n,
                seg_sizes,
                body_steps,
                br,
                in_ids,
                out_ids,
                *ins,
                *mrefs,
                *outs,
            )

        def strip_specs(ids):
            specs = []
            for i in ids:
                bs = pl.BlockSpec(
                    (br, _C), _strip_index_map(seg_sizes, sl, i)
                )
                specs += [bs, bs]
            return specs

        pipe = pltpu.emit_pipeline(
            body,
            grid=(nblk,),
            in_specs=strip_specs(in_ids),
            out_specs=strip_specs(out_ids),
            # NOT dimension_semantics=(PARALLEL,): it measured +5% on
            # pure copies (scripts/copy_bandwidth_probe2.py) but grows
            # the ACTUAL scoped-VMEM stack past window_vmem_request's
            # model — Grover-28's default-config window went 16M
            # request -> 18M actual and failed AOT compile (2026-08-19).
            # Probed and reverted.
        )
        args = []
        outs = []
        for _ in in_ids:
            args += [xr_h, xi_h]
        for _ in out_ids:
            outs += [or_h, oi_h]
        pipe(*args, *outs)

    out_r, out_i = pl.pallas_call(
        outer,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_mats,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((rows, _C), jnp.float32),
            jax.ShapeDtypeStruct((rows, _C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * _C * _C * _n_matmul_steps(steps),
            bytes_accessed=(len(in_ids) + len(out_ids))
            * srows
            * _C
            * 4
            * 2,
            transcendentals=0,
        ),
        # Long step chains outgrow XLA's 16 MiB scoped-VMEM default (the
        # body stack grows ~1 block/step): request what the window needs.
        # The planner's admission estimate upper-bounds this request.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                window_vmem_request(h, steps, br, n_mats=n_mats)
            )
        ),
        input_output_aliases={0: 0, 1: 1} if in_place else {},
    )(xr, xi, *[jnp.asarray(m) for m in mats])
    return out_r, out_i


def _n_matmul_steps(steps) -> int:
    """Matmul count for cost estimates: low steps hit every strip once;
    each rmix matrix block is one strip-pair matmul."""
    n = 0
    for s in steps:
        if s[0] == "low":
            n += 1
        elif s[0] == "rmix":
            n += sum(1 for b in s[1].values() if b[0] != "scalar")
    return n


def window_sweep(
    n: int,
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    seg_sizes,
    steps,
    interpret: bool = False,
    _assemble: bool = True,
):
    """Execute a strip-window as one VMEM-resident Pallas sweep.

    ``seg_sizes``: the row-space segment sizes around the window bits —
    (s_0, s_1, ..., s_h) with the window bits interleaved between them
    (rows = s_0 * 2 * s_1 * 2 * ... * s_h); strips may therefore be
    STRIDED in HBM, expressed through block index maps. The block size
    adapts down to s_h (both powers of two), so strips are always unions
    of aligned blocks; the caller guarantees s_h >= 64 — one full
    (8, 128) tile per DMA block (``_window_kernel_applicable``).

    ``steps``: ("low", B_complex_ndarray) | ("mix", {(j, i): complex}) |
    ("rmix", {(j, i): ("scalar", v) | ("low"/"lowr", B)}) |
    ("diag", (const, row_monos, col_monos, mixed) angle groups) |
    ("cbf", lane_bit, (a, b, c, d)[, ctrl]) |
    ("rbf", row_bit, (a, b, c, d)[, ctrl]) |
    ("cmix", window_bit_pos, (a, b, c, d)[, ctrl]) —
    single-qubit 2x2s as lane-roll / sublane-roll butterflies (no
    operand; rbf's row bit must satisfy 2^(bit+1) <= block rows), or —
    "cmix" — as an inter-strip butterfly on the window-index bit at
    ``window_bit_pos`` (high-row targets whose pair partner is another
    strip). The optional 4th cbf/rbf/cmix element
    ``ctrl = (("r"|"c", bit), ...)`` masks the butterfly on those
    absolute row/col iota bits (controlled form); consumers must handle
    len(step) > 3.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = xr.shape[0]
    h = len(seg_sizes) - 1
    ns = 1 << h
    srows = rows // ns
    # Adapt the block to the trailing segment (both powers of two): a
    # strided window whose finest chunk is smaller than the policy block
    # still qualifies, at the chunk size.
    br = min(window_block_rows(h, steps), seg_sizes[-1])
    nblk = srows // br
    grid = (nblk,)
    sl = seg_sizes[-1] // br  # blocks per finest strip chunk

    if not interpret:
        # Real-TPU path: inner emit_pipeline with strided OUTPUT index
        # maps — the result lands directly in canonical layout, no
        # post-kernel concatenation (measured at n=28: 19.0 ms vs 24.6 ms
        # with assembly for the 30-gate alternating window, and the
        # assembly concat alone cost ~55 s of XLA compile). Interpret mode
        # keeps the BlockSpec+assemble path below (emit_pipeline needs
        # real TPU device info).
        return _window_sweep_pipelined(
            n, xr, xi, tuple(seg_sizes), tuple(steps), br
        )

    # Interpret mode honors the same strip-activity subsets as the
    # pipelined path (skipped strips are re-extracted from the input at
    # assembly), so CPU parity tests cover the skip machinery.
    in_ids, out_ids, _ = _strip_skip_plan(n, seg_sizes, steps, ns)
    if not out_ids:
        return xr, xi  # whole window is the identity

    def strip_spec(i):
        return pl.BlockSpec(
            (br, _C),
            _strip_index_map(seg_sizes, sl, i),
            memory_space=pltpu.VMEM,
        )

    mat_spec = pl.BlockSpec(
        (_C, _C), lambda r: (0, 0), memory_space=pltpu.VMEM
    )

    in_specs = []
    operands = []
    for i in in_ids:
        in_specs += [strip_spec(i), strip_spec(i)]
        operands += [xr, xi]
    n_low = _n_matmul_steps(steps)
    body_steps, mats = _window_matrix_operands(steps)
    for m in mats:
        operands.append(jnp.asarray(m))
        in_specs.append(mat_spec)

    # Outputs: one (srows, C) buffer per WRITTEN strip plane; the final
    # concat restores the contiguous layout.
    out_strip_spec = pl.BlockSpec(
        (br, _C), lambda r: (r, 0), memory_space=pltpu.VMEM
    )
    out_specs = []
    out_shape = []
    for _ in out_ids:
        out_specs += [out_strip_spec, out_strip_spec]
        out_shape += [
            jax.ShapeDtypeStruct((srows, _C), jnp.float32),
            jax.ShapeDtypeStruct((srows, _C), jnp.float32),
        ]

    import functools as _ft

    flops_per_low = 8 * rows * _C * _C
    outs = pl.pallas_call(
        _ft.partial(
            _window_kernel_body,
            n,
            tuple(seg_sizes),
            tuple(body_steps),
            br,
            in_ids,
            out_ids,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_low * flops_per_low,
            bytes_accessed=(len(in_ids) + len(out_ids))
            * srows
            * _C
            * 4
            * 2,
            transcendentals=0,
        ),
    )(*operands)

    if not _assemble:  # debug/bench: raw strip outputs (WRITTEN strips)
        return outs
    # Reassemble the (possibly strided) strips by pairwise concatenation
    # along the window bit axes; skipped strips re-extract from the input.
    strip_shape = []
    for s in seg_sizes[:-1]:
        strip_shape += [s, 1]
    strip_shape += [seg_sizes[-1], _C]
    full_shape = []
    for s in seg_sizes[:-1]:
        full_shape += [s, 2]
    full_shape += [seg_sizes[-1], _C]
    out_pos = {sid: k for k, sid in enumerate(out_ids)}

    def orig_strip(plane_idx, i):
        arr = (xr if plane_idx == 0 else xi).reshape(full_shape)
        idx = []
        for j in range(h):
            b = (i >> (h - 1 - j)) & 1
            idx += [slice(None), slice(b, b + 1)]
        return arr[tuple(idx)]

    def assemble(plane_idx):
        parts = [
            outs[2 * out_pos[i] + plane_idx].reshape(strip_shape)
            if i in out_pos
            else orig_strip(plane_idx, i)
            for i in range(ns)
        ]
        for j in reversed(range(h)):
            ax = 2 * j + 1
            parts = [
                jnp.concatenate((parts[2 * t], parts[2 * t + 1]), axis=ax)
                for t in range(len(parts) // 2)
            ]
        return parts[0].reshape(rows, _C)

    return assemble(0), assemble(1)


def c64_low_matmul(xr: jnp.ndarray, xi: jnp.ndarray, B: np.ndarray):
    """(xr + i xi) @ B.T for a C x C complex block matrix B.

    Inputs are (R, C) float32 planes; returns the output planes. Falls back
    to plain jnp matmuls when the shape doesn't tile or off-TPU.
    """
    rows = xr.shape[0]
    bt = np.ascontiguousarray(B.T)
    br = np.ascontiguousarray(np.real(bt))
    bi = np.ascontiguousarray(np.imag(bt))
    if (
        available()
        # Redundant with available() in production, but tests monkeypatch
        # available() to exercise the kernel-path PLANNING on CPU; the
        # pipelined sweep itself has no interpret mode, so it must stay
        # gated on a real TPU backend.
        and jax.default_backend() == "tpu"
        and xr.dtype == jnp.float32
        and rows % _BLOCK_ROWS == 0
        and xr.shape[1] == _C
    ):
        # One h=0 window: the pipelined sweep handles real-B (2 dots) and
        # Karatsuba (3 dots) selection plus direct strided IO.
        n = (rows * _C).bit_length() - 1
        return _window_sweep_pipelined(
            n, xr, xi, (rows,), (("low", B),), _BLOCK_ROWS
        )
    brj = jnp.asarray(br, dtype=xr.dtype)
    bij = jnp.asarray(bi, dtype=xr.dtype)
    out_r = jnp.dot(xr, brj, precision=_PREC) - jnp.dot(
        xi, bij, precision=_PREC
    )
    out_i = jnp.dot(xr, bij, precision=_PREC) + jnp.dot(
        xi, brj, precision=_PREC
    )
    return out_r, out_i
