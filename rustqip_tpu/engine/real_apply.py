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

import jax
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
    FnOp,
    MatrixOp,
    PhaseProductOp,
    ReflectionOp,
    SparseOp,
    SwapOp,
    op_to_dense,
)

Pair = Tuple[jnp.ndarray, jnp.ndarray]

#: Largest op support materialized dense (mirrors apply.DENSE_CAP).
from rustqip_tpu.engine.apply import DENSE_CAP  # noqa: E402


def _real_block_matmul(xr, xi, B: np.ndarray):
    """x @ B.T on plane pairs, skipping all-zero imaginary parts."""
    from rustqip_tpu.engine.apply import MATMUL_PRECISION as _P

    bt = np.ascontiguousarray(B.T)
    br = np.real(bt)
    bi = np.imag(bt)
    brj = jnp.asarray(br, dtype=xr.dtype)
    if not np.any(bi):
        return jnp.dot(xr, brj, precision=_P), jnp.dot(xi, brj, precision=_P)
    bij = jnp.asarray(bi, dtype=xr.dtype)
    return (
        jnp.dot(xr, brj, precision=_P) - jnp.dot(xi, bij, precision=_P),
        jnp.dot(xr, bij, precision=_P) + jnp.dot(xi, brj, precision=_P),
    )


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
        from rustqip_tpu.engine.apply import (
            _col_swap_planes,
            _cross_swap_planes,
            _row_swap_planes,
            _swap_schedule,
        )

        cross, rowp, colp, mixed = _swap_schedule(n, op)
        _, R, C = _geometry(n)
        if cross:
            re2, im2 = _cross_swap_planes(
                n, cross, [re.reshape(R, C), im.reshape(R, C)]
            )
            re, im = re2.reshape(-1), im2.reshape(-1)
        if rowp:
            re2, im2 = _row_swap_planes(n, rowp, [re, im])
            re, im = re2.reshape(-1), im2.reshape(-1)
        if colp:
            re2, im2 = _col_swap_planes(n, colp, [re, im])
            re, im = re2.reshape(-1), im2.reshape(-1)
        for a, b in mixed:
            re, im = _dense_ri(n, (a, b), _SWAP2, re, im)
        return re, im
    if isinstance(op, ControlOp):
        return _control_ri(n, op, re, im)
    if isinstance(op, FnOp):
        from rustqip_tpu.engine.apply import _fn_apply_planes

        _, R, C = _geometry(n)
        out_r, out_i = _fn_apply_planes(
            n, op, re.reshape(R, C), im.reshape(R, C)
        )
        return out_r.reshape(-1), out_i.reshape(-1)
    if isinstance(op, ReflectionOp):
        # Real operator: the same reduction + elementwise pass per plane.
        from rustqip_tpu.engine.apply import _apply_reflection_2d

        _, R, C = _geometry(n)
        out_r = _apply_reflection_2d(n, op, re.reshape(R, C))
        out_i = _apply_reflection_2d(n, op, im.reshape(R, C))
        return out_r.reshape(-1), out_i.reshape(-1)
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
    # Scalar blocks occur exactly when the op's support is entirely on row
    # qubits (l == 0 in _dense_plan).
    return (
        plan is not None
        and plan[0] == "blocks"
        and all(b[0] == "scalar" for b in plan[1].values())
    )


#: Largest strip-window width (2^h strips kept live per sweep).
WINDOW_MAX_BITS = 3

#: Longest op run collected into one window (bounds trace size and the
#: Pallas kernel's VMEM-resident matrix count).
WINDOW_MAX_OPS = 64

#: Largest matmul-step count handed to the Pallas kernel (each step's
#: (C, C) matrix pair lives in VMEM: 24 steps ~ 3 MiB of a ~16 MiB budget).
WINDOW_KERNEL_MAX_LOW = 24


#: Largest mixed-monomial count for a diagonal absorbed into (or merged
#: inside) a kernel window. Small counts pay a masked complex multiply
#: per monomial; above ``pallas_kernels._DIAG_MASK_MAX`` the kernel
#: flips to row-grouped angle accumulation + ONE block cos/sin (~2 ops
#: per monomial per element), so the old cap of 8 — which split QFT-28's
#: 63 free-row x lane CP monomials into 10 separate diag passes (40% of
#: the wall clock, profiled 2026-08-20) — no longer buys anything. The
#: cap now only bounds trace size.
WINDOW_DIAG_MIXED_CAP = 96

#: Largest ROW-bit support of a dense op admitted to a window as an
#: "rmix" step (non-scalar row blocks: per-strip-pair C x C matmuls).
#: 2 row bits = up to 16 blocks; the block matrices count toward
#: WINDOW_KERNEL_MAX_LOW, bounding VMEM.
RMIX_MAX_ROW_BITS = 2

#: Largest row-bit position executed as an in-block sublane butterfly
#: ("rbf"): the pair partner at stride 2^p must live inside the same
#: kernel block, so 2^(p+1) <= block rows (checked against the final
#: block size in ``_window_kernel_applicable``; 8 covers 512-row blocks).
WINDOW_RBF_MAX_BIT = 8


def _butterfly_ctrl_spec(n: int, n_m: int, op) -> "tuple | None":
    """A ControlOp whose inner is a single-qubit dense gate becomes a
    CONTROLLED in-block butterfly when its target sits on a lane bit or
    a low row bit: the partner amplitude comes from the usual roll, and
    the control mask reads ABSOLUTE row/col iotas, so the controls may
    sit on ANY qubit. This is what lets CCX/CNOT chains — the bulk of
    the arithmetic library, whose targets hug the row/col seam where
    strip windows cannot form (trailing segment < one block) — ride the
    kernel and chain many gates per HBM sweep.

    Targets on HIGH row bits (above the rbf in-block range) become
    "cmix" steps instead: the target joins the WINDOW bit set and the
    butterfly runs BETWEEN strip pairs (same control-mask machinery).
    Those ops — the arithmetic library's multi-controlled carry/
    overflow gates, e.g. 3-4 controls onto a high target — previously
    cost one whole-state dense pass each (they exceed the mix window
    bit budget when every control joins H; as cmix only the TARGET
    consumes a window bit). For cmix, ``bit`` is the target QUBIT index
    (it must join H); for cbf/rbf it is the lane/row BIT position.
    Returns (kind, bit, inner_1q, ctrl) or None."""
    if not (
        isinstance(op, ControlOp)
        and isinstance(op.inner, DenseOp)
        and len(op.target_indices) == 1
        and op.inner.num_indices == 1
    ):
        return None
    tq = op.target_indices[0]
    if tq >= n_m:
        kind, bit = "cbf", n - 1 - tq
    elif n_m - 1 - tq <= WINDOW_RBF_MAX_BIT:
        kind, bit = "rbf", n_m - 1 - tq
    else:
        kind, bit = "cmix", tq
    ctrl = tuple(
        ("r", n_m - 1 - q) if q < n_m else ("c", n - 1 - q)
        for q in sorted(op.control_indices)
    )
    return kind, bit, op.inner, ctrl


def butterfly_eligible(n: int, op) -> bool:
    """Whether ``op`` will plan as a controlled in-block butterfly.
    ``engine/compile`` exempts such ops from dense fusion when the Pallas
    kernel path is active — a chain of them retires in ONE kernel sweep,
    beating the fused-dense alternative (which usually cannot window at
    all near the row/col seam).

    "cmix"-eligible ops (high-row targets) are exempted too: their
    fused-dense alternative exceeds every window bit budget (all
    controls would join H) and runs as a whole-state dense pass, while
    the cmix form consumes ONE window bit and chains.

    Small states are excluded: the kernel needs >= 64-row DMA blocks
    (``_window_kernel_applicable``), so below R = 64 rows (n < 13) an
    exempted op would just fall to a one-pass-per-op XLA plan — WORSE
    than letting dense fusion merge it. Likewise an rbf target whose
    pair partner cannot sit inside a block is not exempted. Nor is an
    op whose ENTIRE support (controls + target) sits on lane qubits:
    its fused-dense alternative is an all-lane C x C "low" matmul that
    COMPOSES with neighboring lane ops (~5.1 ms once per chain at
    HIGHEST precision) — cheaper than one ~2.5 ms roll butterfly per
    gate — and never straddles the seam, so the keep rationale does not
    apply."""
    m, R, _ = _geometry(n)
    if R < 64:
        return False
    n_m = n - m
    spec = _butterfly_ctrl_spec(n, n_m, op)
    if spec is None:
        return False
    if all(q >= n_m for q in op.indices):
        return False
    kind, bit = spec[0], spec[1]
    if kind == "rbf" and (1 << (bit + 1)) > min(512, R):
        return False
    return True


def window_joint_ok(n: int):
    """The fusion joint predicate used when the kernel path is active:
    greedy dense joints are capped to KERNEL-window-plannable shapes —
    <= ladder-max row bits pure-row (one mix window), <= RMIX_MAX_ROW_BITS
    row bits when lane bits join (an rmix step), and no seam-adjacent
    row bit (< 6: a window whose trailing segment is under 64 rows
    cannot form kernel DMA blocks). Returns None below R = 64 rows,
    where windows cannot form at all. ONE definition shared by
    engine/compile and the benches so their A/B arms cannot drift."""
    m, R, _ = _geometry(n)
    if R < 64:
        return None
    n_m = n - m
    hcap = max(_window_maxh_ladder())  # env-read once per compile

    def joint_ok(indices):
        row_bits = [n_m - 1 - q for q in indices if q < n_m]
        cap = hcap if len(row_bits) == len(indices) else RMIX_MAX_ROW_BITS
        return len(row_bits) <= cap and (
            not row_bits or min(row_bits) >= 6
        )

    return joint_ok


def _window_diag_plan(n: int, op) -> "tuple | None":
    """The angle group set of a PhaseProductOp eligible for in-window
    (kernel) evaluation: unit modulus, few mixed monomials."""
    from rustqip_tpu.engine.apply import _phase_plan

    angle_g, mag_g = _phase_plan(n, op.terms)
    if mag_g is not None or len(angle_g[3]) > WINDOW_DIAG_MIXED_CAP:
        return None
    return angle_g


def _merge_steps_enabled() -> bool:
    """RUSTQIP_TPU_MERGE_STEPS=0 disables the commute-aware window-step
    merge (A/B hatch; the flag joins ``_env_plan_flags`` so flipping it
    invalidates compile caches)."""
    import os

    return os.environ.get("RUSTQIP_TPU_MERGE_STEPS", "1") != "0"


def _step_support(n: int, step) -> frozenset:
    """Qubit-index support of a collected window step — the set of qubits
    the step can act non-trivially on. Two steps with DISJOINT supports
    act on different tensor factors and therefore commute as linear
    operators; ``merge_window_steps`` uses this to move composable steps
    past intervening ones. Conservative where exact support is awkward
    ("low" steps are composed C x C matmuls over the whole lane space, so
    they claim every column qubit)."""
    m, _, _ = _geometry(n)
    n_m = n - m
    kind = step[0]
    if kind in ("mix", "rmix"):
        return frozenset(step[1].indices)
    if kind == "low":
        return frozenset(range(n_m, n))
    if kind == "diag":
        const, row_monos, col_monos, mixed = step[1]
        qs = set()
        for rq, _c in row_monos:
            qs.update(rq)
        for cq, _c in col_monos:
            qs.update(cq)
        for rq, cq, _c in mixed:
            qs.update(rq)
            qs.update(cq)
        return frozenset(qs)
    if kind == "cbf":
        qs = {n - 1 - step[1]}
    elif kind == "rbf":
        qs = {n_m - 1 - step[1]}
    else:  # cmix carries the target QUBIT index directly
        qs = {step[1]}
    for ck, pc in step[3] if len(step) > 3 else ():
        qs.add(n_m - 1 - pc if ck == "r" else n - 1 - pc)
    return frozenset(qs)


#: Sentinel: composition applies and yields the identity (drop the step).
_IDENTITY = object()


def _try_compose_steps(n: int, new, old):
    """Compose window step ``new`` into the earlier step ``old`` (``old``
    applies first). Returns the merged step, ``_IDENTITY`` when the
    product is the identity (both steps drop), or None when the pair is
    not composable. Pure trace-time numpy — each merge removes one VPU/
    MXU step from every kernel block (and every XLA strip pass)."""
    k_new, k_old = new[0], old[0]
    if k_new in ("cbf", "rbf", "cmix") and k_new == k_old:
        # same bit AND same control spec: C(U) C(V) = C(UV)
        if new[1] != old[1] or (new[3:] or ()) != (old[3:] or ()):
            return None
        mat = np.array(new[2], dtype=np.complex128).reshape(2, 2) @ np.array(
            old[2], dtype=np.complex128
        ).reshape(2, 2)
        if np.allclose(mat, np.eye(2), atol=1e-12):
            return _IDENTITY
        coeffs = tuple(complex(v) for v in mat.reshape(-1))
        return (k_new, new[1], coeffs) + tuple(new[3:])
    if k_new == "low" and k_old == "low":
        B = np.asarray(new[1]) @ np.asarray(old[1])
        if np.allclose(B, np.eye(B.shape[0]), atol=1e-12):
            return _IDENTITY
        return ("low", B)
    if k_new == "mix" and k_old == "mix":
        from rustqip_tpu.ops.matrix_ops import expand_op_matrix

        op_old, op_new = old[1], new[1]
        joint = tuple(sorted(set(op_old.indices) | set(op_new.indices)))

        def embed(op):
            pos = tuple(joint.index(q) for q in op.indices)
            return expand_op_matrix(op_to_dense(op), pos, len(joint))

        mat = embed(op_new) @ embed(op_old)
        if np.allclose(mat, np.eye(mat.shape[0]), atol=1e-12):
            return _IDENTITY
        op = DenseOp(joint, mat)
        p = _plan_of(n, op)
        # The product of two scalar-block ops over row qubits is scalar-
        # block again; a col-support mix whose product stops being v*I
        # per block is NOT mix-plannable — leave the pair unmerged.
        if not _is_scalar_high(p):
            return None
        return ("mix", op, p)
    if k_new == "diag" and k_old == "diag":
        c1, rm1, cm1, mx1 = old[1]
        c2, rm2, cm2, mx2 = new[1]

        def combine(a, b, keyfn):
            acc = {}
            for ent in tuple(a) + tuple(b):
                key, c = keyfn(ent)
                acc[key] = acc.get(key, 0.0) + c
            return {k: v for k, v in acc.items() if abs(v) > 1e-14}

        rm = combine(rm1, rm2, lambda e: (e[0], e[1]))
        cm = combine(cm1, cm2, lambda e: (e[0], e[1]))
        mx = combine(mx1, mx2, lambda e: ((e[0], e[1]), e[2]))
        if len(mx) > WINDOW_DIAG_MIXED_CAP:
            return None
        const = float(c1) + float(c2)
        if not rm and not cm and not mx and abs(const) < 1e-14:
            return _IDENTITY
        groups = (
            const,
            tuple(rm.items()),
            tuple(cm.items()),
            tuple((rq, cq, c) for (rq, cq), c in mx.items()),
        )
        return ("diag", groups)
    return None


def merge_window_steps(n: int, steps):
    """Commute-aware peephole over a collected window's steps: each step
    composes into the NEAREST earlier composable step it can legally
    reach — i.e. every intervening step acts on a disjoint qubit set (or
    both are diagonal: diagonals always commute). Same-bit butterfly
    chains multiply into one 2x2 (an H...H run cancels outright), mix
    runs compose as strip matrices, "low" matmul runs compose across
    row-bit butterflies, and diagonal steps sum their angle groups.
    Identity products drop entirely.

    This is the window-level analog of classic gate-merging simulators
    (qsim's fused gates); the reference applies every gate it is handed
    one iterator pass at a time (matrix_ops.rs:98-152) with no algebraic
    simplification. Steps are never mutated in place — composition
    rebinds list slots — so snapshot copies taken during collection stay
    valid."""
    merged: List = []
    supports: List[frozenset] = []
    for step in steps:
        sup = _step_support(n, step)
        placed = False
        k = len(merged) - 1
        while k >= 0:
            out = _try_compose_steps(n, step, merged[k])
            if out is not None:
                if out is _IDENTITY:
                    del merged[k]
                    del supports[k]
                else:
                    merged[k] = out
                    supports[k] = _step_support(n, out)
                placed = True
                break
            prev = merged[k]
            commutes = not (sup & supports[k]) or (
                step[0] == "diag" and prev[0] == "diag"
            )
            if not commutes:
                break
            k -= 1
        if not placed:
            merged.append(step)
            supports.append(sup)
    return merged


def _collect_window(
    n: int,
    ops,
    start: int,
    max_h: int = WINDOW_MAX_BITS,
    allow_diag: bool = False,
    snapshot=None,
):
    """Greedy maximal run of dense ops executable as ONE strip sweep.

    A window holds the 2^h row strips for a set of row-qubit bits H; while
    they are live, any op whose support is either entirely on column
    qubits (a per-strip C x C matmul, consecutive ones composed) or a
    scalar-block mix over bits within H (a VPU linear combination of
    strips) chains without touching HBM again. The alternating
    H(0)/H(27) benchmark becomes a single sweep this way (one state
    read+write for the whole run). With ``allow_diag`` (the Pallas kernel
    path — it evaluates phase factors in-body from iotas), unitary
    diagonals join windows too, so QFT's H+controlled-phase ladder
    chains per window.

    With ``snapshot`` (a callable ``(hq, steps, next_index) -> None``),
    the flushed window state is reported after EVERY consumed op —
    ``plan_sweeps`` uses it to recover the longest kernel-applicable
    PREFIX of a run whose maximal collection is inapplicable
    (applicability is not monotone in run length: hq and block sizes
    change as ops join). One collection pass replaces re-collecting
    each candidate prefix from scratch.

    Returns ``((H_sorted, steps), next_index)`` or ``(None, start)``;
    steps: ("low", composed numpy C x C) | ("mix", op, plan) |
    ("rmix", op, plan) | ("diag", angle_groups) |
    ("cbf", lane_bit, 2x2 coeffs[, ctrl]) |
    ("rbf", row_bit, 2x2 coeffs[, ctrl]) |
    ("cmix", target_qubit, 2x2 coeffs[, ctrl]) — the optional 4th
    element is a control spec ``(("r"|"c", bit), ...)`` making the
    butterfly CONTROLLED (mask from absolute row/col iotas). "cmix" is
    the high-row-target form: the target qubit joins the window bit set
    and the 2x2 runs between strip PAIRS, so wide multi-controlled ops
    (3-4 controls onto a high row bit — the arithmetic library's
    carry/overflow gates) consume ONE window bit instead of one whole-
    state dense pass each. cbf/rbf/cmix are kernel-only
    (``allow_diag``): single-qubit gates on column (lane) bits and on
    LOW row (sublane) bits become in-block roll butterflies, adjacent
    same-bit ones composed. rbf needs no strips at all (the pair partner
    lives inside the block), so e.g. QFT-28's middle qubits 15-20 —
    whose trailing segments are too small for strip windows — chain in
    one sweep instead of one pass per gate.
    """
    m, _, _ = _geometry(n)
    n_m = n - m
    H: set = set()
    steps: List = []
    consumed = 0
    pending_B = None
    j = start

    def flush():
        nonlocal pending_B
        if pending_B is not None:
            steps.append(("low", pending_B))
            pending_B = None

    def push_butterfly(kind: str, bit: int, op, ctrl: tuple = ()) -> None:
        """Append a ("cbf"/"rbf", bit, 2x2 coeffs[, ctrl]) step, composing
        into an adjacent same-kind same-bit same-ctrl butterfly (for
        controlled ones, C(U)C(V) = C(UV) — masks must match exactly)."""
        mat = np.asarray(op.data, dtype=np.complex128).reshape(2, 2)
        if (
            steps
            and steps[-1][0] == kind
            and steps[-1][1] == bit
            and (steps[-1][3] if len(steps[-1]) > 3 else ()) == ctrl
        ):
            prev = np.array(steps[-1][2], dtype=np.complex128)
            mat = mat @ prev.reshape(2, 2)
            steps.pop()
        coeffs = tuple(complex(v) for v in mat.reshape(-1))
        steps.append(
            (kind, bit, coeffs, ctrl) if ctrl else (kind, bit, coeffs)
        )

    def butterfly_ctrl_spec(op) -> "tuple | None":
        return _butterfly_ctrl_spec(n, n_m, op)

    def note() -> None:
        """Report the current (flushed) prefix state to ``snapshot``.
        Steps tuples and operand arrays are never mutated after append
        (composition rebinds), so a shallow list copy is a valid
        snapshot."""
        if snapshot is None:
            return
        snap_steps = list(steps)
        if pending_B is not None:
            snap_steps.append(("low", pending_B))
        snapshot(tuple(sorted(H)), snap_steps, j)

    while j < len(ops) and consumed < WINDOW_MAX_OPS:
        op = ops[j]
        if allow_diag and isinstance(op, ControlOp):
            spec = butterfly_ctrl_spec(op)
            if spec is not None:
                kind, bit, inner1q, ctrl = spec
                if kind == "cmix":
                    # the TARGET qubit must be a window bit (strips pair
                    # across it); controls stay masks, consuming nothing
                    new_h = H | {bit}
                    if len(new_h) > max_h:
                        break
                    H = new_h
                # A pending composed C x C run must emit first: a lane
                # butterfly with row controls cannot fold into a plain
                # matmul, and emission order preserves semantics.
                flush()
                push_butterfly(kind, bit, inner1q, ctrl)
                j += 1
                consumed += 1
                note()
                continue
        if (
            isinstance(op, (ControlOp, SparseOp))
            and op.num_indices <= DENSE_CAP
        ):
            # Controlled / small sparse gates already execute via their
            # dense equivalent per-op (_control_ri / apply_op_ri); the
            # same equivalence admits them to windows, so CNOT/CCX
            # chains — the bulk of arithmetic circuits — fuse instead of
            # breaking the run. Identity sub-blocks demote to scalar
            # mixes in _dense_plan, so a seam-straddling CNOT costs one
            # C x C matmul on half its strips, not a full rmix.
            # Memoized on the (frozen) op: plan_sweeps retries the
            # collection down the max_h ladder and the profilers re-plan
            # the same ops — without the cache each attempt rebuilds the
            # dense matrix (16 MB for a DENSE_CAP-wide control) and
            # re-hashes its bytes for the _dense_plan lru key.
            dense = getattr(op, "_window_dense", None)
            if dense is None:
                dense = DenseOp(tuple(op.indices), op_to_dense(op))
                object.__setattr__(op, "_window_dense", dense)
            op = dense
        p = _plan_of(n, op)
        if p is None:
            if allow_diag and isinstance(op, PhaseProductOp):
                dplan = _window_diag_plan(n, op)
                if dplan is not None:
                    flush()
                    steps.append(("diag", dplan))
                    j += 1
                    consumed += 1
                    note()
                    continue
            break
        if p[0] == "low":
            if (
                allow_diag
                and isinstance(op, DenseOp)
                and op.num_indices == 1
                and pending_B is None
            ):
                # Kernel path: a single-column-qubit 2x2 becomes a
                # lane-roll butterfly. Measured on v5e (n=28, 15 such
                # gates): ~2.5 ms/gate vs ~5.1 ms for a 128-wide MXU
                # matmul at HIGHEST precision (exact f32 dots cost 6
                # bf16 passes; the butterfly is exact by construction).
                # Only beats the matmul when dots run exact — at bf16
                # "default" precision the matmul was faster, but that
                # precision is wrong for amplitude simulation.
                push_butterfly("cbf", n - 1 - op.indices[0], op)
                j += 1
                consumed += 1
                note()
                continue
            B = p[1]
            pending_B = B if pending_B is None else B @ pending_B
            j += 1
            consumed += 1
            note()
            continue
        if (
            allow_diag
            and isinstance(op, DenseOp)
            and op.num_indices == 1
            and op.indices[0] < n_m
            and n_m - 1 - op.indices[0] <= WINDOW_RBF_MAX_BIT
        ):
            # Kernel path: single-qubit gate on a low row bit as a
            # sublane-roll butterfly (no strips; partner rows live in the
            # same block). Applicability later checks 2^(p+1) <= block.
            flush()
            push_butterfly("rbf", n_m - 1 - op.indices[0], op)
            j += 1
            consumed += 1
            note()
            continue
        if not _is_scalar_high(p):
            # Non-scalar row blocks ("rmix"): a dense op straddling the
            # row/col seam decomposes as out_strip[j] = sum_i strip[i] @
            # B[j,i]^T — per-strip-pair C x C matmuls, so arbitrary
            # DISJOINT dense op runs retire in one state sweep (the
            # reference's apply_ops/MultiOpIterator one-pass semantics,
            # qip-iterators/src/matrix_ops.rs:158-219).
            rbits = {q for q in op.indices if q < n_m}
            new_h = H | rbits
            if (
                isinstance(op, DenseOp)
                and p[0] == "blocks"
                and len(rbits) <= RMIX_MAX_ROW_BITS
                and len(new_h) <= max_h
            ):
                H = new_h
                flush()
                steps.append(("rmix", op, p))
                j += 1
                consumed += 1
                note()
                continue
            break
        # Only ROW bits join the window bit set: a seam-straddling op can
        # be scalar-high when every sub-block is v*I (the col part acts
        # as identity — _dense_plan's demotion), and its col indices must
        # not leak into H (_row_segment_shape only accepts row bits; the
        # expansion already filters op_bits to row bits).
        new_h = H | {q for q in op.indices if q < n_m}
        if len(new_h) > max_h:
            break
        H = new_h
        flush()
        steps.append(("mix", op, p))
        j += 1
        consumed += 1
        note()
    flush()
    if consumed == 0:
        return None, start
    return (tuple(sorted(H)), steps), j


def _expand_blocks(n: int, hq, op, plan) -> dict:
    """Expand an op's (j_op, i_op) blocks into window strip index space:
    {(j_window, i_window): ("scalar", v) | ("mat", C x C ndarray)}.

    The op's block indices run over its ROW bits only (col support, if
    any, lives inside the expanded "mat" blocks)."""
    m, _, _ = _geometry(n)
    blocks = plan[1]
    op_bits = [q for q in sorted(op.indices) if q < n - m]
    h = len(hq)
    h_op = len(op_bits)
    wpos = [hq.index(q) for q in op_bits]
    out = {}
    for jw in range(1 << h):
        j_op = 0
        for t in range(h_op):
            j_op |= ((jw >> (h - 1 - wpos[t])) & 1) << (h_op - 1 - t)
        for i_op in range(1 << h_op):
            blk = blocks.get((j_op, i_op))
            if blk is None:
                continue
            iw = jw
            for t in range(h_op):
                bit = (i_op >> (h_op - 1 - t)) & 1
                pos = h - 1 - wpos[t]
                iw = (iw & ~(1 << pos)) | (bit << pos)
            out[(jw, iw)] = blk
    return out


def _expand_mix(n: int, hq, op, plan) -> dict:
    """Scalar-block expansion: {(j_window, i_window): scalar}."""
    return {
        k: blk[1] for k, blk in _expand_blocks(n, hq, op, plan).items()
    }


def _window_seg_sizes(n: int, hq):
    """Row-space segment sizes around the window bits:
    (s_0, ..., s_h) with rows = s_0 * 2 * s_1 * 2 * ... * s_h."""
    from rustqip_tpu.engine.apply import _row_segment_shape

    m, _, _ = _geometry(n)
    seg_shape = _row_segment_shape(n, m, list(hq))
    return seg_shape[0::2]


def _window_kernel_applicable(n: int, hq, steps) -> bool:
    """The Pallas window kernel handles h <= 4 windows whose strips are
    unions of block-aligned row chunks (the trailing segment below the
    lowest window bit must cover whole blocks; h=3 halves the block so 8
    strips fit VMEM; h=4 — 16 strips, ladder-gated behind
    RUSTQIP_TPU_WINDOW_MAXH=4,... — leans on the per-window VMEM request
    for admission). rbf steps additionally need their pair partner
    inside the block: 2^(p+1) <= block rows. Worth invoking when the
    window chains a matmul or butterfly behind strips, contains
    diagonal steps, or chains >= 2 butterfly/matmul steps (XLA fuses
    none of these across its materialization points). PURE-MIX windows
    ride the kernel too: the XLA slice/concat fallback measured ~2.5
    physical passes per sweep on a one-sweep CCX (13.2 ms/gate at n=28
    vs the 5.2 ms HBM floor, BENCH_r03 validation run) — the kernel
    reads and writes each block exactly once, and mix-only windows keep
    the large (512/256-row) block schedule."""
    h = len(hq)
    m, R, C = _geometry(n)
    if h > 4 or C != 128:
        return False
    segs = _window_seg_sizes(n, hq)
    # block rows adapt down to the trailing segment; require at least a
    # full (8, 128) tile per DMA block
    br = min(pallas_kernels.window_block_rows(h, steps), segs[-1])
    if br < 64:
        return False
    rbf_bits = [s[1] for s in steps if s[0] == "rbf"]
    if rbf_bits and (1 << (max(rbf_bits) + 1)) > br:
        return False
    n_low = sum(1 for s in steps if s[0] == "low")
    n_diag = sum(1 for s in steps if s[0] == "diag")
    # cmix (inter-strip controlled butterflies) count with cbf/rbf:
    # same worth-it math — the dense alternative cannot window at all
    n_cbf = sum(1 for s in steps if s[0] in ("cbf", "cmix"))
    n_rbf = len(rbf_bits)
    n_rmix = sum(1 for s in steps if s[0] == "rmix")
    # rmix block matrices are VMEM residents like low operands (upper
    # bound pre-dedup; _window_matrix_operands dedups identical blocks)
    n_rmix_mats = sum(
        sum(1 for b in s[2][1].values() if b[0] == "mat")
        for s in steps
        if s[0] == "rmix"
    )
    if n_low + n_rmix_mats > WINDOW_KERNEL_MAX_LOW:
        return False
    # Scoped-VMEM admission: Mosaic's kernel stack grows ~one block per
    # step, so very long chains (e.g. 65 butterflies in one window from
    # an adder's carry ladder) outgrow even a raised vmem_limit_bytes.
    # Rejecting here makes prefix salvage split the chain into multiple
    # sweeps instead of failing at compile time with a VMEM OOM.
    # 3 operand arrays per matmul step (Karatsuba re/im/re+im for complex
    # matrices — the worst case; _window_matrix_operands dedups), so the
    # admission estimate upper-bounds the kernel's actual request.
    if (
        pallas_kernels.window_vmem_request(
            h, steps, br, n_mats=3 * (n_low + n_rmix_mats)
        )
        > pallas_kernels.WINDOW_VMEM_CEIL
    ):
        return False
    n_mix = sum(1 for s in steps if s[0] == "mix")
    return (
        n_diag >= 1
        or n_low + n_cbf + n_rbf + n_rmix >= 2
        # Any butterfly-bearing window pays at RUNTIME: a lane/sublane
        # roll pass (~2.5 ms at n=28) beats both the HIGHEST-precision
        # matmul (5.1 ms) and the XLA slice/concat window (~2.5
        # physical passes) even for a single step — including a lone
        # CONTROLLED butterfly (one CCX), whose dense alternative can't
        # window. A LONE butterfly (no mixes to amortize the window) is
        # hatch-gated like pure-mix windows: each distinct gate/ctrl
        # combination bakes its coefficients into a separate Mosaic
        # structure (~4 s relay compile each), so circuits with many
        # distinct isolated butterflies can revert them to the XLA path
        # with RUSTQIP_TPU_KERNEL_PURE_MIX=0.
        or (n_cbf + n_rbf >= 1
            and (n_mix >= 1 or _pure_mix_kernel_enabled()))
        or (h >= 1 and n_low + n_rmix >= 1)
        or (h >= 1 and n_mix >= 1 and _pure_mix_kernel_enabled())
    )


def _pure_mix_kernel_enabled() -> bool:
    """RUSTQIP_TPU_KERNEL_PURE_MIX=0 reverts mix-only windows AND lone
    butterfly windows (single cbf/rbf step, no mixes) to the XLA
    slice/concat path — escape hatch for circuits with very many DISTINCT
    single-structure windows, where each costs a separate Mosaic kernel
    compile over the relay (~4 s each measured; the XLA path compiles
    faster but executes ~2.5 physical passes per sweep)."""
    import os

    return os.environ.get("RUSTQIP_TPU_KERNEL_PURE_MIX", "1") != "0"


def window_ksteps(n: int, hq, steps) -> list:
    """Translate COLLECTION steps into the kernel's step format: mix and
    rmix expand their op blocks into window strip-index space; cmix maps
    its target QUBIT to the strip-index bit position (the same ordering
    ``_expand_blocks`` uses: hq.index -> h-1-pos); everything else passes
    through. Shared by ``_window_kernel_run`` and the interpret-mode
    kernel tests, so both exercise the same translation."""
    ksteps = []
    for s in steps:
        if s[0] == "mix":
            ksteps.append(("mix", _expand_mix(n, hq, s[1], s[2])))
        elif s[0] == "rmix":
            ksteps.append(("rmix", _expand_blocks(n, hq, s[1], s[2])))
        elif s[0] == "cmix":
            bp = len(hq) - 1 - hq.index(s[1])
            ksteps.append(("cmix", bp) + tuple(s[2:]))
        else:
            ksteps.append(s)
    return ksteps


def _window_kernel_run(n: int, window, re, im) -> Pair:
    """Convert a (possibly diag-bearing) window into kernel steps and run
    it as one VMEM-resident Pallas sweep."""
    hq, steps = window
    _, R, C = _geometry(n)
    ksteps = window_ksteps(n, hq, steps)
    out_r, out_i = pallas_kernels.window_sweep(
        n,
        re.reshape(R, C),
        im.reshape(R, C),
        _window_seg_sizes(n, hq),
        ksteps,
        # Off-TPU the Mosaic path cannot compile; interpret mode runs the
        # same kernel body semantics. Production (available() requires a
        # TPU backend) always compiles — this branch exists for tests
        # that monkeypatch available() to exercise the FULL kernel-path
        # pipeline (fusion -> planning -> kernel body) on CPU.
        interpret=jax.default_backend() != "tpu",
    )
    return out_r.reshape(-1), out_i.reshape(-1)


def _window_sweep_ri(n: int, window, re, im) -> Pair:
    """Execute a collected window as one sweep over the state."""
    from rustqip_tpu.engine.apply import _row_segment_shape

    hq, steps = window
    h = len(hq)
    m, R, C = _geometry(n)
    if h == 0:
        # pure composed low run: one C x C matmul
        (_, B), = steps
        out_r, out_i = pallas_kernels.c64_low_matmul(
            re.reshape(R, C), im.reshape(R, C), B
        )
        return out_r.reshape(-1), out_i.reshape(-1)

    seg_shape = _row_segment_shape(n, m, list(hq))
    two_axes = tuple(range(1, 2 * h, 2))
    strip_shape = tuple(
        1 if ax in two_axes else d for ax, d in enumerate(seg_shape)
    ) + (C,)
    xr = re.reshape(seg_shape + (C,))
    xi = im.reshape(seg_shape + (C,))

    strips: List = []
    for i in range(1 << h):
        idx = [slice(None)] * len(seg_shape) + [slice(None)]
        for pos, ax in enumerate(two_axes):
            idx[ax] = (i >> (h - 1 - pos)) & 1
        strips.append(
            (xr[tuple(idx)].reshape(-1, C), xi[tuple(idx)].reshape(-1, C))
        )

    for step in steps:
        if step[0] == "low":
            B = step[1]
            strips = [
                _real_block_matmul(sr, si, B) for sr, si in strips
            ]
            continue
        # "mix" (scalar blocks) / "rmix" (C x C matrix blocks): linear
        # combinations of strips, expanded into window index space.
        _, op, plan = step
        wblocks = _expand_blocks(n, hq, op, plan)
        new_strips: List = []
        for jw in range(1 << h):
            acc_r = acc_i = None
            for iw in range(1 << h):
                blk = wblocks.get((jw, iw))
                if blk is None:
                    continue
                sr, si = strips[iw]
                if blk[0] == "scalar":
                    tr, ti = _scalar_mul(sr, si, blk[1])
                else:
                    tr, ti = _real_block_matmul(sr, si, blk[1])
                if acc_r is None:
                    acc_r, acc_i = tr, ti
                else:
                    acc_r, acc_i = acc_r + tr, acc_i + ti
            if acc_r is None:
                z = jnp.zeros_like(strips[0][0])
                acc_r, acc_i = z, z
            new_strips.append((acc_r, acc_i))
        strips = new_strips

    def assemble(plane_idx: int):
        outs = [s[plane_idx].reshape(strip_shape) for s in strips]
        for j in reversed(range(h)):
            ax = two_axes[j]
            outs = [
                jnp.concatenate((outs[2 * t], outs[2 * t + 1]), axis=ax)
                for t in range(len(outs) // 2)
            ]
        return outs[0].reshape(-1)

    return assemble(0), assemble(1)


def _window_maxh_ladder() -> tuple:
    """Kernel-window width ladder (RUSTQIP_TPU_WINDOW_MAXH, default
    "4,3,2,1"): widths tried in order per run start. Wider windows
    retire more ops per HBM sweep but force smaller VMEM blocks when
    diagonals are present (h>=3 -> 64 rows); "1" trades sweeps for big
    blocks. h=4 became the default after same-session v5e A/Bs (2026-08-20,
    BENCH_NOTES round 5): QFT-28 254.5 -> 227.7 ms (6 -> 5 sweeps),
    Grover-28 iteration 170.5 -> 145.6 ms (20 -> 16 sweeps). The cost is
    compile time over the relay (Grover-28: 293 -> 685 s — 16-strip
    Mosaic bodies are pricier); set "3,2,1" to get the old ladder where
    compile latency matters more than steady-state throughput."""
    import os

    raw = os.environ.get("RUSTQIP_TPU_WINDOW_MAXH", "4,3,2,1")
    try:
        ladder = tuple(
            v for v in (int(x) for x in raw.split(",")) if 1 <= v <= 4
        )
    except ValueError:
        return (4, 3, 2, 1)
    return ladder or (4, 3, 2, 1)


def plan_sweeps(n: int, ops: Sequence[MatrixOp], kernel_ok: bool):
    """The sweep decomposition ``apply_ops_ri`` will execute, as a list of
    ``(kind, payload, run_ops)`` entries — kind "kwindow" (Pallas window
    kernel), "window" (XLA strip-window sweep) or "op" (single-op pass).
    The SINGLE source of truth for sweep boundaries: execution,
    ``pass_breakdown`` and both profilers all consume it, so the reported
    boundaries/kernel flags always match what actually runs (they differ
    by ``kernel_ok``: Pallas available + f32 planes)."""
    ops = list(ops)
    plan = []
    ladder = _window_maxh_ladder()  # read once: one atomic plan per call
    do_merge = _merge_steps_enabled()  # read once, same atomicity

    def finalize(hq, steps):
        """Merged (hq, steps) of a collected window — or None when every
        step cancelled (the run is the identity; the sweep vanishes)."""
        if do_merge:
            steps = merge_window_steps(n, steps)
        if not steps:
            return None
        return (hq, steps)

    i = 0
    while i < len(ops):
        if kernel_ok:
            # The kernel takes h <= 3 windows; a greedy max-width window
            # can be inapplicable for reasons a NARROWER one avoids —
            # e.g. h=3 forces 64-row blocks, rejecting any rbf bit >= 6,
            # while the same run collected at h<=1 keeps 512-row blocks
            # (QFT-28's middle ladder). Retry down the h ladder before
            # surrendering the run to the XLA fallback.
            # Prefix fallback: the maximal collection can be inapplicable
            # ONLY because of later ops — e.g. the add carry chain's seam
            # rbf bits force tiny blocks onto a perfectly good mix+cbf
            # window collected just before them. ``snapshot`` reports the
            # flushed state after every consumed op during the SAME
            # collection pass, so the longest kernel-applicable prefix
            # falls out for free (applicability is not monotone in prefix
            # length — hq and block sizes change as ops join — hence
            # every length is checked, not just the maximal one).
            placed = False
            # next_index -> (hq, steps); collection is deterministic and
            # max_h only changes BREAK points, so snapshots at the same
            # index coincide across ladder widths — first seen wins.
            cands = {}

            def snap(hq, steps, jj):
                if jj not in cands:
                    cands[jj] = (hq, steps)

            for mh in ladder:
                window, j = _collect_window(
                    n, ops, i, max_h=mh, allow_diag=True, snapshot=snap
                )
                if window is None:
                    continue
                window = finalize(*window)
                if window is None:  # whole run cancelled to the identity
                    i = j
                    placed = True
                    break
                if _window_kernel_applicable(n, window[0], window[1]):
                    plan.append(("kwindow", window, ops[i:j]))
                    i = j
                    placed = True
                    break
            if not placed:
                # Applicability checks are deferred to here (failed runs
                # only) and stop at the first hit, longest prefix first.
                for jj in sorted(cands, reverse=True):
                    window = finalize(*cands[jj])
                    if window is None:
                        i = jj
                        placed = True
                        break
                    if _window_kernel_applicable(n, window[0], window[1]):
                        plan.append(("kwindow", window, ops[i:jj]))
                        i = jj
                        placed = True
                        break
            if placed:
                continue
        window, j = _collect_window(n, ops, i)
        if window is not None:
            window = finalize(*window)
            if window is not None:
                plan.append(("window", window, ops[i:j]))
            i = j
            continue
        plan.append(("op", ops[i], [ops[i]]))
        i += 1
    return plan


def apply_ops_ri(
    n: int,
    ops: Sequence[MatrixOp],
    re: jnp.ndarray,
    im: jnp.ndarray,
    kernel_ok: "bool | None" = None,
) -> Pair:
    """Apply ops in sequence with strip-window sweeps: maximal runs of
    dense ops whose supports stay within (column qubits) + (<= 3 row-qubit
    bits with scalar blocks) execute as ONE read+write of the state —
    strips mix on the VPU, composed C x C gates matmul on the MXU,
    unitary diagonals evaluate in-body, reassembly happens once per
    window. Measured at n=28 (v5e): the alternating H(0)/H(27) pattern
    collapses from 30 passes to 1 (905 applies/s via the Pallas window
    kernel; the XLA fallback uses the same windows without diagonals)."""
    if kernel_ok is None:
        # Standalone calls: follow backend availability. Compiled
        # circuits pass their fixed policy instead (sharded circuits
        # force False — the kernel cannot run on a GSPMD-partitioned
        # state; see CompiledCircuit._kernel_policy).
        kernel_ok = pallas_kernels.available()
    kernel_ok = kernel_ok and re.dtype == jnp.float32
    for kind, payload, _run in plan_sweeps(n, ops, kernel_ok):
        if kind == "kwindow":
            re, im = _window_kernel_run(n, payload, re, im)
        elif kind == "window":
            re, im = _window_sweep_ri(n, payload, re, im)
        else:
            re, im = apply_op_ri(n, payload, re, im)
    return re, im
