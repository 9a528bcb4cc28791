"""Execution engine (L0): applies gate ops to the amplitude tensor.

TPU-native replacement for the reference's ``qip-iterators`` crate. Where the
reference walks every output row with nonzero-column iterators under a rayon
fan-out (``qip-iterators/src/matrix_ops.rs:98-219``), this engine expresses a
gate apply as an axis contraction on the ``(2,)*n`` amplitude tensor and lets
XLA tile it onto the MXU/VPU; fusion of adjacent gates (the ``apply_ops``
analog) happens in ``fusion.py`` before compilation.
"""

from rustqip_tpu.engine.apply import (
    apply_op,
    apply_ops,
    as_tensor,
    as_vector,
)
from rustqip_tpu.engine.fusion import fuse_ops
from rustqip_tpu.engine.compile import CompiledCircuit, compile_pipeline

__all__ = [
    "apply_op",
    "apply_ops",
    "as_tensor",
    "as_vector",
    "fuse_ops",
    "CompiledCircuit",
    "compile_pipeline",
]
