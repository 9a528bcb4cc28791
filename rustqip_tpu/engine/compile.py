"""Circuit compilation: pipeline -> one jitted XLA program.

The reference interprets its pipeline gate-by-gate on the host
(``qip/src/builder.rs:423-517``), dispatching one rayon sweep per gate. Here
the whole pipeline — gate applies *and* mid-circuit measurements — is traced
once into a single ``jax.jit`` program: XLA fuses passes, keeps buffers on
device (the reference's state/arena double-buffering, builder.rs:406-407,
becomes XLA buffer aliasing), and mid-circuit measurement outcomes stay
traced (no host sync until results are read).

TPU boundary rule: complex dtypes are computed *inside* the program (XLA
lowers them to real pairs on the VPU/MXU) but never cross the host<->device
boundary — this backend cannot transfer complex buffers. The jitted function
therefore takes a basis-state index (traced, so a vmap over all 2^n initial
states compiles once — the truth-table harness) and returns (real, imag)
float arrays.

Compiled programs are cached by a structural fingerprint of the pipeline, so
re-running the same circuit never re-traces.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from rustqip_tpu.engine.apply import _geometry, apply_ops
from rustqip_tpu.engine.fusion import DEFAULT_MAX_FUSED_QUBITS, fuse_ops
from rustqip_tpu.errors import CircuitError
from rustqip_tpu.ops.matrix_ops import MatrixOp, op_fingerprint
from rustqip_tpu.ops.measurement_ops import measure_probs
from rustqip_tpu.types import real_dtype_of


@dataclass(frozen=True)
class UnitaryEntry:
    """A lowered gate op in the executable pipeline."""

    op: MatrixOp

    def fingerprint(self):
        # Structural (exact-bytes) fingerprint — a 64-bit hash() could
        # collide and silently return a cached circuit for the wrong
        # pipeline.
        return ("u", op_fingerprint(self.op))


@dataclass(frozen=True)
class MeasureEntry:
    """A measurement in the executable pipeline.

    ``stochastic=True`` returns the full outcome distribution without
    collapsing (ref ``MeasurementObject::StochasticMeasurement``,
    builder.rs:284-290); otherwise sample-and-collapse.
    """

    indices: Tuple[int, ...]
    stochastic: bool = False

    def fingerprint(self):
        return ("m", self.indices, self.stochastic)


@dataclass(frozen=True)
class RepeatEntry:
    """A unitary block applied ``times`` times.

    Compiles as one traced body under ``lax.fori_loop`` — the XLA-native
    answer to long repeated structures (Grover rounds, Trotter steps):
    compile time is O(body), not O(times * body). No measurements inside.
    """

    times: int
    entries: Tuple["PipelineEntry", ...]

    def fingerprint(self):
        return ("rep", self.times, tuple(e.fingerprint() for e in self.entries))


PipelineEntry = Union[UnitaryEntry, MeasureEntry, RepeatEntry]

#: Measurement results: (outcome, prob) for collapsing, probs array otherwise.
MeasResult = Union[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]


#: Norm-drift violations observed by the opt-in runtime checks (tests and
#: debugging read this; it is never consulted on the hot path).
NORM_VIOLATIONS: List[tuple] = []


def _norm_check_cb(total, seg_index, tol):
    import warnings

    total = float(total)
    if abs(total - 1.0) > tol:
        NORM_VIOLATIONS.append((int(seg_index), total))
        warnings.warn(
            f"norm drift after segment {int(seg_index)}: |psi|^2 = {total!r}",
            RuntimeWarning,
            stacklevel=2,
        )


def _check_norm_enabled() -> bool:
    import os

    return os.environ.get("RUSTQIP_TPU_CHECK_NORM") == "1"


class CompiledCircuit:
    """An executable circuit: one jitted function over (init index, key)."""

    def __init__(
        self,
        n: int,
        entries: Sequence[PipelineEntry],
        dtype,
        fuse: bool = True,
        max_fused_qubits: int = DEFAULT_MAX_FUSED_QUBITS,
        check_norm: Optional[bool] = None,
    ):
        #: Opt-in per-segment |psi|^2 runtime asserts (host callback — adds
        #: a sync per segment; debug only). None = follow the
        #: RUSTQIP_TPU_CHECK_NORM env var. Meaningful for unitary pipelines
        #: (projector-like non-unitary ops legitimately change the norm).
        self._check_norm = (
            _check_norm_enabled() if check_norm is None else bool(check_norm)
        )
        self._norm_tol = 1e-3 if np.dtype(dtype).itemsize == 8 else 1e-9
        self.n = n
        self.dtype = np.dtype(dtype)
        self.rdtype = real_dtype_of(self.dtype)
        self.entries = list(entries)
        self.num_measurements = sum(
            1 for e in self.entries if isinstance(e, MeasureEntry)
        )
        #: Whether execution takes the Pallas window-kernel path — fixed
        #: at compile so fusion shape, sweep planning and the profilers
        #: all agree (sharded circuits override the policy to False).
        self._kernel_ok = (
            self._kernel_policy() and np.dtype(self.rdtype) == np.float32
        )
        self.segments = self._plan(fuse, max_fused_qubits)
        self._fn = jax.jit(self._trace_from_index)
        self._fn_state = jax.jit(self._trace_from_state)
        self._fn_forced = None  # lazily jitted: MeasuredCondition forcing
        self._fn_forced_state = None  # forcing + explicit initial state

    def _kernel_policy(self) -> bool:
        """Whether this circuit's execution may take the Pallas
        window-kernel path. Single-chip: the backend's availability.
        SHARDED circuits override to False — the kernel operates on one
        chip's full canonical (rows, 128) HBM view; under GSPMD the
        state is partitioned across devices and a ``pallas_call`` cannot
        be auto-sharded, and the explicit executor lowers ops itself.
        Window-aware fusion (keep/joint_ok) keys off the same policy:
        exempting butterfly-eligible ops from dense fusion only pays
        when kernel sweeps actually retire them."""
        from rustqip_tpu.engine import pallas_kernels

        return pallas_kernels.available()

    def _fusion_keep(self):
        """The butterfly keep-predicate window-aware fusion uses when the
        kernel path is active. Sharded executors override: eligibility is
        judged in the SHARD-LOCAL qubit space the kernel actually sees."""
        from rustqip_tpu.engine.real_apply import butterfly_eligible

        n = self.n
        return lambda op: butterfly_eligible(n, op)

    def _fusion_joint_ok(self):
        """The greedy-joint cap predicate (see ``_fusion_keep``)."""
        from rustqip_tpu.engine.real_apply import window_joint_ok

        return window_joint_ok(self.n)

    # -- planning ----------------------------------------------------------
    def _plan(self, fuse: bool, max_fused_qubits: int):
        """Split the pipeline into unitary runs (fused) and measurements.

        Swap deferral (``engine/relabel.py``): SwapOps never execute
        mid-circuit — they update a logical->physical position map that
        rewrites every later gate's and measurement's indices; the
        residual permutation materializes as <= 2 physical SwapOps at
        the end (QFT + inverse-QFT pairs cancel to zero). Disable with
        ``RUSTQIP_TPU_DEFER_SWAPS=0``."""
        from rustqip_tpu.engine import relabel

        defer = relabel.enabled()
        pos = list(range(self.n))
        segments: List = []
        run: List[MatrixOp] = []

        # When execution will take the Pallas kernel path, fusion turns
        # window-aware:
        # - controlled-butterfly-eligible ops (CCX/CNOT/multi-controlled
        #   1q gates with seam-adjacent targets) are exempted from dense
        #   fusion entirely (``keep``): the window collector chains them
        #   — many per HBM sweep — while a fused joint dense op near the
        #   seam cannot kernel-window at all. Hatch:
        #   RUSTQIP_TPU_KEEP_BUTTERFLY=0.
        # - greedy joints are capped to KERNEL-window-plannable shapes
        #   (``joint_ok``): > 3 row bits (or > RMIX_MAX_ROW_BITS when
        #   lane bits join) can only run as a whole-state dense pass —
        #   the pathological gather/MXU path — so e.g. an H-broadcast
        #   must fuse into 3-row-bit mixes (kernel sweeps at ~HBM
        #   speed), not 5-qubit joints. Joints are also barred from
        #   absorbing SEAM-ADJACENT row qubits (row bit < 6): a window
        #   whose trailing segment is under 64 rows cannot form kernel
        #   DMA blocks, while the 1q gates such a joint would swallow
        #   ride the kernel individually as in-block rbf butterflies.
        #   Hatch: RUSTQIP_TPU_WINDOW_FUSION=0.
        keep = None
        joint_ok = None
        kernel_fusion = self._kernel_ok
        if (
            kernel_fusion
            and os.environ.get("RUSTQIP_TPU_KEEP_BUTTERFLY", "1") != "0"
        ):
            keep = self._fusion_keep()
        if (
            kernel_fusion
            and os.environ.get("RUSTQIP_TPU_WINDOW_FUSION", "1") != "0"
        ):
            # None below R = 64 rows (kernel windows cannot form)
            joint_ok = self._fusion_joint_ok()

        def flush():
            nonlocal run
            if run:
                segments.append(
                    fuse_ops(run, max_fused_qubits, keep=keep,
                             joint_ok=joint_ok)
                    if fuse
                    else run
                )
                run = []

        def flush_perm():
            """Materialize the pending relabeling as physical swaps."""
            nonlocal pos
            for sw in relabel.materialize(pos):
                run.append(sw)
            pos = list(range(self.n))

        for e in self.entries:
            if isinstance(e, UnitaryEntry):
                if defer:
                    run.extend(relabel.defer_swaps_ops(self.n, [e.op], pos))
                else:
                    run.append(e.op)
            elif isinstance(e, RepeatEntry):
                if defer:
                    flush_perm()
                flush()
                body_ops = []
                for be in e.entries:
                    if not isinstance(be, UnitaryEntry):
                        raise TypeError(
                            "RepeatEntry bodies must be purely unitary"
                        )
                    body_ops.append(be.op)
                if defer:
                    # Body-local deferral: the body repeats, so its own
                    # residual must materialize inside the body.
                    bpos = list(range(self.n))
                    body_ops = relabel.defer_swaps_ops(self.n, body_ops, bpos)
                    body_ops.extend(relabel.materialize(bpos))
                body = (
                    fuse_ops(body_ops, max_fused_qubits, keep=keep,
                             joint_ok=joint_ok)
                    if fuse
                    else body_ops
                )
                segments.append(("repeat", e.times, body))
            else:
                if defer and pos != list(range(self.n)):
                    e = MeasureEntry(
                        tuple(pos[q] for q in e.indices), e.stochastic
                    )
                flush()
                segments.append(e)
        if defer:
            flush_perm()
        flush()
        return segments

    @property
    def num_passes(self) -> int:
        """Number of executed gate passes after fusion (circuit stats)."""
        total = 0
        for s in self.segments:
            if isinstance(s, MeasureEntry):
                continue
            if isinstance(s, tuple) and s[0] == "repeat":
                total += s[1] * len(s[2])
            else:
                total += len(s)
        return total

    @property
    def num_sweeps(self) -> int:
        """Estimated HBM sweeps after runtime strip-window batching: the
        engine merges runs of dense ops into single read+write sweeps
        (real_apply._collect_window), so this is the bandwidth-accounting
        figure; ``num_passes`` counts retired (fused) gate ops."""
        from rustqip_tpu.engine.real_apply import _collect_window

        def count(ops) -> int:
            c = i = 0
            while i < len(ops):
                _, j = _collect_window(self.n, ops, i)
                c += 1
                i = j if j > i else i + 1
            return c

        total = 0
        for s in self.segments:
            if isinstance(s, MeasureEntry):
                continue
            if isinstance(s, tuple) and s[0] == "repeat":
                total += s[1] * count(s[2])
            else:
                total += count(s)
        return total

    # -- tracing -----------------------------------------------------------
    @staticmethod
    def _use_real_pairs() -> bool:
        # On TPU the whole program runs on (re, im) float planes: no complex
        # arrays on device at all (boundary transfers are unimplemented and
        # XLA's complex-dot lowering reads operands twice); the hot fused
        # pass goes through the Pallas MXU kernel.
        return jax.default_backend() == "tpu"

    def _run_segments_ri(
        self,
        re: jnp.ndarray,
        im: jnp.ndarray,
        key: jax.Array,
        forced_mask=None,
        forced_vals=None,
        forced_pmask=None,
        forced_probs=None,
    ):
        from rustqip_tpu.engine.real_apply import apply_ops_ri
        from rustqip_tpu.ops.measurement_ops import (
            measure_probs_ri,
            measure_state_ri,
        )

        results: List[MeasResult] = []
        m_i = 0
        for s_i, seg in enumerate(self.segments):
            if isinstance(seg, MeasureEntry):
                if seg.stochastic:
                    results.append(measure_probs_ri(self.n, seg.indices, re, im))
                    m_i += 1
                else:
                    key, sub = jax.random.split(key)
                    probs = measure_probs_ri(self.n, seg.indices, re, im)
                    outcome = jax.random.categorical(sub, jnp.log(probs))
                    if forced_mask is not None:
                        # MeasuredCondition forcing (ref measurement_ops.rs:181)
                        outcome = jnp.where(
                            forced_mask[m_i], forced_vals[m_i], outcome
                        )
                    prob = probs[outcome]
                    if forced_pmask is not None:
                        # MeasuredCondition.prob override: the collapse
                        # rescale uses the supplied probability instead of
                        # the computed one (ref measurement_ops.rs:181-218).
                        prob = jnp.where(
                            forced_pmask[m_i],
                            forced_probs[m_i].astype(prob.dtype),
                            prob,
                        )
                    re, im = measure_state_ri(
                        self.n, seg.indices, (outcome, prob), re, im
                    )
                    results.append((outcome, prob))
                    m_i += 1
            elif isinstance(seg, tuple) and seg[0] == "repeat":
                _, times, body = seg
                re, im = jax.lax.fori_loop(
                    0,
                    times,
                    lambda _, s: apply_ops_ri(
                        self.n, body, s[0], s[1], kernel_ok=self._kernel_ok
                    ),
                    (re, im),
                )
            else:
                re, im = apply_ops_ri(
                    self.n, seg, re, im, kernel_ok=self._kernel_ok
                )
            if self._check_norm:
                jax.debug.callback(
                    _norm_check_cb,
                    jnp.sum(re * re + im * im),
                    s_i,
                    self._norm_tol,
                )
        return re, im, tuple(results)

    def _run_segments(
        self,
        state: jnp.ndarray,
        key: jax.Array,
        forced_mask=None,
        forced_vals=None,
        forced_pmask=None,
        forced_probs=None,
    ):
        from rustqip_tpu.ops.measurement_ops import measure_state

        results: List[MeasResult] = []
        m_i = 0
        for s_i, seg in enumerate(self.segments):
            if isinstance(seg, MeasureEntry):
                if seg.stochastic:
                    results.append(measure_probs(self.n, seg.indices, state))
                    m_i += 1
                else:
                    key, sub = jax.random.split(key)
                    probs = measure_probs(self.n, seg.indices, state)
                    outcome = jax.random.categorical(sub, jnp.log(probs))
                    if forced_mask is not None:
                        outcome = jnp.where(
                            forced_mask[m_i], forced_vals[m_i], outcome
                        )
                    prob = probs[outcome]
                    if forced_pmask is not None:
                        prob = jnp.where(
                            forced_pmask[m_i],
                            forced_probs[m_i].astype(prob.dtype),
                            prob,
                        )
                    state = measure_state(
                        self.n, seg.indices, (outcome, prob), state
                    )
                    results.append((outcome, prob))
                    m_i += 1
            elif isinstance(seg, tuple) and seg[0] == "repeat":
                _, times, body = seg
                state = jax.lax.fori_loop(
                    0,
                    times,
                    lambda _, s: apply_ops(self.n, body, s),
                    state,
                )
            else:
                state = apply_ops(self.n, seg, state)
            if self._check_norm:
                jax.debug.callback(
                    _norm_check_cb,
                    jnp.sum(jnp.real(state) ** 2 + jnp.imag(state) ** 2),
                    s_i,
                    self._norm_tol,
                )
        return jnp.real(state), jnp.imag(state), tuple(results)

    def _one_hot(self, initial_row, initial_col):
        # One-hot basis state built on device via a scatter (an arange
        # comparison would materialize a 2^n int vector); complex never
        # crosses the jit boundary. The index arrives as a (row, col) pair
        # of the (R, C) canonical view so each component fits int32 at any
        # supported qubit count (a flat index overflows int32 at n >= 32 —
        # exactly the sharded 33q target).
        _, R, C = _geometry(self.n)
        re = (
            jnp.zeros((R, C), dtype=self.rdtype)
            .at[initial_row, initial_col]
            .set(1.0)
            .reshape(-1)
        )
        return re, jnp.zeros_like(re)

    def _trace_from_index(self, initial_row, initial_col, key: jax.Array):
        re, im = self._one_hot(initial_row, initial_col)
        if self._use_real_pairs():
            return self._run_segments_ri(re, im, key)
        state = jax.lax.complex(re, im).astype(self.dtype)
        return self._run_segments(state, key)

    def _trace_from_state(
        self, state_re: jnp.ndarray, state_im: jnp.ndarray, key: jax.Array
    ):
        re = state_re.astype(self.rdtype)
        im = state_im.astype(self.rdtype)
        if self._use_real_pairs():
            return self._run_segments_ri(re, im, key)
        state = jax.lax.complex(re, im).astype(self.dtype)
        return self._run_segments(state, key)

    # -- execution ---------------------------------------------------------
    def _make_forced_fn(self):
        return jax.jit(self._trace_forced)

    def _make_forced_state_fn(self):
        return jax.jit(self._trace_forced_state)

    def _trace_forced(
        self, initial_row, initial_col, key, fmask, fvals, fpmask, fprobs
    ):
        re, im = self._one_hot(initial_row, initial_col)
        if self._use_real_pairs():
            return self._run_segments_ri(
                re, im, key, fmask, fvals, fpmask, fprobs
            )
        state = jax.lax.complex(re, im).astype(self.dtype)
        return self._run_segments(state, key, fmask, fvals, fpmask, fprobs)

    def _trace_forced_state(
        self, state_re, state_im, key, fmask, fvals, fpmask, fprobs
    ):
        re = state_re.astype(self.rdtype)
        im = state_im.astype(self.rdtype)
        if self._use_real_pairs():
            return self._run_segments_ri(
                re, im, key, fmask, fvals, fpmask, fprobs
            )
        state = jax.lax.complex(re, im).astype(self.dtype)
        return self._run_segments(state, key, fmask, fvals, fpmask, fprobs)

    def _split_index(self, initial_index: int) -> Tuple[np.int32, np.int32]:
        initial_index = int(initial_index)
        if not 0 <= initial_index < (1 << self.n):
            raise CircuitError(
                f"initial_index {initial_index} out of range for "
                f"{self.n} qubits"
            )
        _, _, C = _geometry(self.n)
        row, col = divmod(initial_index, C)
        return np.int32(row), np.int32(col)

    @staticmethod
    def _forced_arrays(forced: dict, num_measurements: int):
        """Normalize {ordinal: outcome | (outcome, prob|None)} into the four
        traced forcing arrays."""
        size = max(num_measurements, 1)
        mask = np.zeros(size, dtype=bool)
        vals = np.zeros(size, dtype=np.int32)
        pmask = np.zeros(size, dtype=bool)
        probs = np.zeros(size, dtype=np.float64)
        for ordinal, spec in forced.items():
            prob = None
            if isinstance(spec, tuple):
                outcome, prob = spec
            else:
                outcome = spec
            mask[ordinal] = True
            vals[ordinal] = int(outcome)
            if prob is not None:
                pmask[ordinal] = True
                probs[ordinal] = float(prob)
        return tuple(jnp.asarray(a) for a in (mask, vals, pmask, probs))

    def run(
        self,
        initial_index: int = 0,
        key: Optional[jax.Array] = None,
        initial_state: Optional[np.ndarray] = None,
        forced: Optional[dict] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[MeasResult, ...]]:
        """Execute; returns (state_re, state_im, measurement results).

        ``forced`` maps measurement ordinal -> forced outcome, either an
        int or an ``(outcome, prob)`` tuple overriding the collapse
        probability (the MeasuredCondition path, ref
        measurement_ops.rs:181-218). Results stay on device; callers (the
        builder) decide when to sync.
        """
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        if forced:
            fargs = self._forced_arrays(forced, self.num_measurements)
            if initial_state is not None:
                if self._fn_forced_state is None:
                    self._fn_forced_state = self._make_forced_state_fn()
                arr = np.asarray(initial_state)
                re = jnp.asarray(np.real(arr), dtype=self.rdtype)
                im = jnp.asarray(np.imag(arr), dtype=self.rdtype)
                return self._fn_forced_state(re, im, key, *fargs)
            if self._fn_forced is None:
                self._fn_forced = self._make_forced_fn()
            row, col = self._split_index(initial_index)
            return self._fn_forced(row, col, key, *fargs)
        if initial_state is not None:
            arr = np.asarray(initial_state)
            re = jnp.asarray(np.real(arr), dtype=self.rdtype)
            im = jnp.asarray(np.imag(arr), dtype=self.rdtype)
            return self._fn_state(re, im, key)
        row, col = self._split_index(initial_index)
        return self._fn(row, col, key)

    def run_complex(
        self,
        initial_index: int = 0,
        key: Optional[jax.Array] = None,
        initial_state: Optional[np.ndarray] = None,
        forced: Optional[dict] = None,
    ) -> Tuple[np.ndarray, Tuple[MeasResult, ...]]:
        """Execute and fetch the final state as a host complex array."""
        re, im, results = self.run(initial_index, key, initial_state, forced)
        state = np.asarray(re).astype(np.complex128) + 1j * np.asarray(im)
        if self.dtype == np.dtype(np.complex64):
            state = state.astype(np.complex64)
        return state, results


_CACHE: Dict[tuple, CompiledCircuit] = {}


def _env_plan_flags() -> tuple:
    """Trace-time env knobs that change the compiled plan: they must join
    the cache fingerprint, or flipping one (e.g. the documented
    RUSTQIP_TPU_DEFER_SWAPS=0 kill switch) would be silently ignored on a
    cache hit and return a CompiledCircuit built under the old setting."""
    from rustqip_tpu.engine import pallas_kernels

    return (
        os.environ.get("RUSTQIP_TPU_DEFER_SWAPS", "1"),
        os.environ.get("RUSTQIP_TPU_KERNEL_PURE_MIX", "1"),
        os.environ.get("RUSTQIP_TPU_KERNEL_SKIP_STRIPS", "1"),
        os.environ.get("RUSTQIP_TPU_KERNEL_INPLACE", "auto"),
        os.environ.get("RUSTQIP_TPU_BLOCK_ROWS", "512"),
        os.environ.get("RUSTQIP_TPU_DIAG_BLOCK_ROWS", "0"),
        os.environ.get("RUSTQIP_TPU_KEEP_BUTTERFLY", "1"),
        os.environ.get("RUSTQIP_TPU_MERGE_STEPS", "1"),
        os.environ.get("RUSTQIP_TPU_WINDOW_FUSION", "1"),
        os.environ.get("RUSTQIP_TPU_WINDOW_MAXH", "4,3,2,1"),
        # gex recombination layout (flip vs gather) — traced into the
        # sharded executors' shard_map bodies (parallel/shard_ops.py
        # _gex_flip_max); both their fingerprints route through here.
        os.environ.get("RUSTQIP_TPU_GEX_FLIP", "4"),
        # Diag-step evaluation strategy inside the window kernel
        # (masked multiplies vs angle accumulation, pallas_kernels
        # _diag_mask_max).
        os.environ.get("RUSTQIP_TPU_DIAG_MASK_MAX", "4"),
        # The RESOLVED kernel availability, not just the env var that
        # feeds it: available() also reads PALLAS_AXON_TPU_GEN and the
        # backend, and tests monkeypatch it — a cache hit must never
        # return a circuit whose _kernel_ok (and fusion shape) was built
        # under a different policy.
        pallas_kernels.available(),
    )


def compile_pipeline(
    n: int,
    entries: Sequence[PipelineEntry],
    dtype,
    fuse: bool = True,
    max_fused_qubits: int = DEFAULT_MAX_FUSED_QUBITS,
    check_norm: Optional[bool] = None,
) -> CompiledCircuit:
    """Compile (with caching) a lowered pipeline into a CompiledCircuit."""
    dtype = np.dtype(dtype)
    norm_flag = _check_norm_enabled() if check_norm is None else bool(check_norm)
    fp = (
        n,
        dtype.str,
        fuse,
        max_fused_qubits,
        norm_flag,
        _env_plan_flags(),
        tuple(e.fingerprint() for e in entries),
    )
    cached = _CACHE.get(fp)
    if cached is None:
        cached = CompiledCircuit(
            n, entries, dtype, fuse, max_fused_qubits, check_norm=norm_flag
        )
        _CACHE[fp] = cached
    return cached
