"""Precision / dtype handling and bit-order representation.

The reference parameterizes everything over a ``Precision`` trait covering
f32/f64 (``qip/src/types.rs:6-13``). On TPU the analog is a dtype choice:

* ``complex64``  — the TPU fast path (f32 pairs; matmuls hit the MXU).
* ``complex128`` — the correctness path (requires ``jax_enable_x64``; used
  for the 1e-10 amplitude-match target against the reference).

``Representation`` mirrors ``qip/src/types.rs:17-22``.
"""

from __future__ import annotations

import enum
from fractions import Fraction
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np


#: TPU layout: low-qubit column block = 2^7 = 128 lanes (one tile).
#: Shared by the engine's 2D state view and the measurement reductions.
MINOR_QUBITS = 7


class Representation(enum.Enum):
    """Bit order for sparse-matrix input data (``qip/src/types.rs:17-22``).

    ``BigEndian`` matches the engine's native convention (qubit 0 is the most
    significant bit of a sub-matrix row/column index). ``LittleEndian`` input
    is re-indexed on construction.
    """

    LittleEndian = "little"
    BigEndian = "big"


#: Things accepted as a dtype selector.
DTypeLike = Union[str, type, np.dtype, "jnp.dtype"]


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def default_complex_dtype() -> np.dtype:
    """complex128 when x64 is on (correctness path), else complex64."""
    return np.dtype(np.complex128) if x64_enabled() else np.dtype(np.complex64)


def canonical_complex_dtype(dtype: DTypeLike | None) -> np.dtype:
    """Normalize a user-provided precision selector to a complex dtype.

    Accepts 'f32'/'f64'/'complex64'/'complex128'/np dtypes. This is the
    stand-in for the reference's ``LocalBuilder<f32|f64>`` type parameter.
    """
    if dtype is None:
        return default_complex_dtype()
    if isinstance(dtype, str):
        key = dtype.lower()
        if key in ("f32", "float32", "complex64", "c64", "single"):
            return np.dtype(np.complex64)
        if key in ("f64", "float64", "complex128", "c128", "double"):
            return np.dtype(np.complex128)
        raise ValueError(f"Unknown precision {dtype!r}")
    d = np.dtype(dtype)
    if d == np.dtype(np.float32):
        return np.dtype(np.complex64)
    if d == np.dtype(np.float64):
        return np.dtype(np.complex128)
    if d in (np.dtype(np.complex64), np.dtype(np.complex128)):
        return d
    raise ValueError(f"Unsupported precision dtype {dtype!r}")


def real_dtype_of(cdtype: DTypeLike) -> np.dtype:
    d = np.dtype(cdtype)
    if d == np.dtype(np.complex64):
        return np.dtype(np.float32)
    if d == np.dtype(np.complex128):
        return np.dtype(np.float64)
    raise ValueError(f"Not a complex dtype: {cdtype!r}")


class PiRational:
    """An exact rational multiple of pi: ``(num/den) * pi``.

    Mirrors ``RotationObject::PiRational`` (``qip/src/builder.rs:160-165``),
    which carries angles like pi/2^k symbolically so QFT ladders and QASM
    export stay exact.
    """

    __slots__ = ("frac",)

    def __init__(self, num: int | Fraction, den: int = 1):
        if isinstance(num, Fraction):
            self.frac = num / den
        else:
            self.frac = Fraction(num, den)

    @property
    def numerator(self) -> int:
        return self.frac.numerator

    @property
    def denominator(self) -> int:
        return self.frac.denominator

    def to_float(self) -> float:
        return float(self.frac) * float(np.pi)

    def __neg__(self) -> "PiRational":
        return PiRational(-self.frac)

    def __truediv__(self, other: int) -> "PiRational":
        return PiRational(self.frac / other)

    def __eq__(self, other) -> bool:
        return isinstance(other, PiRational) and self.frac == other.frac

    def __hash__(self) -> int:
        return hash(("PiRational", self.frac))

    def __repr__(self) -> str:
        return f"PiRational({self.frac.numerator}/{self.frac.denominator} * pi)"


#: A rotation angle: either a float (radians) or an exact pi-rational.
Angle = Union[float, PiRational]


def angle_to_float(theta: Angle) -> float:
    if isinstance(theta, PiRational):
        return theta.to_float()
    return float(theta)
