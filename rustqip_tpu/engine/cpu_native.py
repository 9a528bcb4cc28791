"""ctypes bindings to the native C++ CPU engine (csrc/qip_engine.cpp).

The native engine serves as (a) an independent correctness oracle for the
device engine and (b) the same-machine CPU baseline that bench.py's
``vs_baseline`` ratio is measured against (the algorithmic stand-in for the
reference's Rust engine; no Rust toolchain ships in this image).

Builds the shared library on first use; returns None if no toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from rustqip_tpu.ops.matrix_ops import (
    ControlOp,
    DenseOp,
    MatrixOp,
    ReflectionOp,
    SparseOp,
    SwapOp,
    op_to_dense,
)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libqip_engine.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native engine; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(os.path.join(_CSRC, "qip_engine.cpp")):
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError):
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    for suffix, fp in (("f64", ctypes.c_double), ("f32", ctypes.c_float)):
        fpp = ctypes.POINTER(fp)
        getattr(lib, f"qip_apply_dense_{suffix}").argtypes = [
            ctypes.c_int, i32p, ctypes.c_int, fpp, fpp, fpp,
        ]
        getattr(lib, f"qip_apply_control_dense_{suffix}").argtypes = [
            ctypes.c_int, i32p, ctypes.c_int, i32p, ctypes.c_int, fpp, fpp, fpp,
        ]
        getattr(lib, f"qip_apply_swap_{suffix}").argtypes = [
            ctypes.c_int, i32p, i32p, ctypes.c_int, fpp, fpp,
        ]
        getattr(lib, f"qip_prob_magnitude_{suffix}").argtypes = [ctypes.c_int, fpp]
        getattr(lib, f"qip_prob_magnitude_{suffix}").restype = ctypes.c_double
        getattr(lib, f"qip_measure_prob_{suffix}").argtypes = [
            ctypes.c_int, ctypes.c_uint64, i32p, ctypes.c_int, fpp,
        ]
        getattr(lib, f"qip_measure_prob_{suffix}").restype = ctypes.c_double
        getattr(lib, f"qip_measure_state_{suffix}").argtypes = [
            ctypes.c_int, ctypes.c_uint64, ctypes.c_double, i32p, ctypes.c_int,
            fpp, fpp,
        ]
    lib.qip_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def _suffix_and_real(dtype) -> tuple:
    dtype = np.dtype(dtype)
    if dtype == np.complex64:
        return "f32", np.float32
    if dtype == np.complex128:
        return "f64", np.float64
    raise ValueError(f"Unsupported dtype {dtype}")


def _as_pairs(arr: np.ndarray, real_dtype) -> np.ndarray:
    """Complex array viewed as interleaved (re, im) pairs."""
    return np.ascontiguousarray(arr).view(real_dtype)


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _i32(seq: Sequence[int]) -> np.ndarray:
    return np.asarray(seq, dtype=np.int32)


def native_apply_op(n: int, op: MatrixOp, state: np.ndarray) -> np.ndarray:
    """Apply one gate op via the native engine; returns a new state array."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    suffix, real = _suffix_and_real(state.dtype)
    ctype = ctypes.c_float if real == np.float32 else ctypes.c_double
    out = np.empty_like(state)
    in_pairs = _as_pairs(state, real)
    out_pairs = out.view(real)
    # ReflectionOp: the oracle has no reduction kernel — densify
    # (2/N J - I), exact at any small test width.
    if isinstance(op, (DenseOp, SparseOp, ReflectionOp)):
        mat = np.ascontiguousarray(op_to_dense(op).astype(state.dtype))
        idx = _i32(op.indices)
        getattr(lib, f"qip_apply_dense_{suffix}")(
            n, _ptr(idx, ctypes.c_int32), len(op.indices),
            _ptr(_as_pairs(mat, real), ctype),
            _ptr(in_pairs, ctype), _ptr(out_pairs, ctype),
        )
    elif isinstance(op, SwapOp):
        h = op.half
        a, b = _i32(op.indices[:h]), _i32(op.indices[h:])
        getattr(lib, f"qip_apply_swap_{suffix}")(
            n, _ptr(a, ctypes.c_int32), _ptr(b, ctypes.c_int32), h,
            _ptr(in_pairs, ctype), _ptr(out_pairs, ctype),
        )
    elif isinstance(op, ControlOp):
        inner = op.inner
        mat = np.ascontiguousarray(op_to_dense(inner).astype(state.dtype))
        cidx = _i32(op.control_indices)
        tidx = _i32(inner.indices)
        getattr(lib, f"qip_apply_control_dense_{suffix}")(
            n, _ptr(cidx, ctypes.c_int32), op.n_ctrl,
            _ptr(tidx, ctypes.c_int32), inner.num_indices,
            _ptr(_as_pairs(mat, real), ctype),
            _ptr(in_pairs, ctype), _ptr(out_pairs, ctype),
        )
    else:
        raise TypeError(f"Unknown op {op!r}")
    return out


def native_measure_prob(
    n: int, measured: int, indices: Sequence[int], state: np.ndarray
) -> float:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    suffix, real = _suffix_and_real(state.dtype)
    ctype = ctypes.c_float if real == np.float32 else ctypes.c_double
    idx = _i32(indices)
    return getattr(lib, f"qip_measure_prob_{suffix}")(
        n, measured, _ptr(idx, ctypes.c_int32), len(idx),
        _ptr(_as_pairs(state, real), ctype),
    )


def native_prob_magnitude(n: int, state: np.ndarray) -> float:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    suffix, real = _suffix_and_real(state.dtype)
    ctype = ctypes.c_float if real == np.float32 else ctypes.c_double
    return getattr(lib, f"qip_prob_magnitude_{suffix}")(
        n, _ptr(_as_pairs(state, real), ctype)
    )


def native_measure_state(
    n: int,
    measured: int,
    prob: float,
    indices: Sequence[int],
    state: np.ndarray,
) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    suffix, real = _suffix_and_real(state.dtype)
    ctype = ctypes.c_float if real == np.float32 else ctypes.c_double
    out = np.empty_like(state)
    idx = _i32(indices)
    getattr(lib, f"qip_measure_state_{suffix}")(
        n, measured, prob, _ptr(idx, ctypes.c_int32), len(idx),
        _ptr(_as_pairs(state, real), ctype), _ptr(out.view(real), ctype),
    )
    return out
