"""Convenience prelude (ref ``qip::prelude``, qip/src/lib.rs:271-279)."""

from rustqip_tpu.builder import (
    Conditioned,
    LocalBuilder,
    MeasurementHandle,
    Measurements,
    Register,
    SplitManyResult,
    SplitResult,
    StochasticMeasurementHandle,
    inverter,
    inverter_args,
    make_circuit_matrix,
)
from rustqip_tpu.errors import CircuitError
from rustqip_tpu.types import PiRational, Representation

__all__ = [
    "LocalBuilder",
    "Conditioned",
    "Register",
    "SplitResult",
    "SplitManyResult",
    "Measurements",
    "MeasurementHandle",
    "StochasticMeasurementHandle",
    "inverter",
    "inverter_args",
    "make_circuit_matrix",
    "CircuitError",
    "PiRational",
    "Representation",
]
