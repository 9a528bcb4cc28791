"""Circuit-builder layer (L2): the user-facing circuit construction API.

Re-design of the reference trait tower (``qip/src/builder_traits.rs``) and
``LocalBuilder`` (``qip/src/builder.rs``): linear-typed registers (consumed
handles enforce no-cloning, the Python stand-in for Rust move semantics),
a pure pipeline recorder, and execution via the engine's whole-circuit jit.
"""

from rustqip_tpu.builder.registers import (
    Register,
    SplitResult,
    SplitManyResult,
)
from rustqip_tpu.builder.circuit_objects import (
    CircuitObject,
    UnitaryObject,
    NamedGate,
    RzGate,
    MatGate,
    ControlledMatGate,
    GlobalPhaseGate,
    MeasurementObject,
    invert_circuit_object,
)
from rustqip_tpu.builder.builder import (
    LocalBuilder,
    Measurements,
    MeasurementHandle,
    StochasticMeasurementHandle,
)
from rustqip_tpu.builder.conditioning import Conditioned
from rustqip_tpu.builder.inverter import inverter, inverter_args
from rustqip_tpu.builder.traits import make_circuit_matrix

__all__ = [
    "Register",
    "SplitResult",
    "SplitManyResult",
    "CircuitObject",
    "UnitaryObject",
    "NamedGate",
    "RzGate",
    "MatGate",
    "ControlledMatGate",
    "GlobalPhaseGate",
    "MeasurementObject",
    "invert_circuit_object",
    "LocalBuilder",
    "Measurements",
    "MeasurementHandle",
    "StochasticMeasurementHandle",
    "Conditioned",
    "inverter",
    "inverter_args",
    "make_circuit_matrix",
]
