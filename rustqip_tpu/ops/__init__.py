"""Op-level layer (L1): gate-op IR, constructors, and measurement math.

TPU-native re-design of the reference's ``qip/src/state_ops/`` and the op IR
from ``qip-iterators/src/iterators/ops.rs``.
"""

from rustqip_tpu.ops.matrix_ops import (
    MatrixOp,
    DenseOp,
    SparseOp,
    SwapOp,
    ControlOp,
    FnOp,
    ReflectionOp,
    make_matrix_op,
    make_sparse_matrix_op,
    make_sparse_matrix_from_function,
    make_fn_op,
    make_function_op,
    make_reflection_op,
    make_swap_op,
    make_control_op,
    invert_op,
    conj_op,
    transpose_op,
    from_reals,
    from_tuples,
    make_op_matrix,
)
from rustqip_tpu.ops import gates
from rustqip_tpu.ops.measurement_ops import (
    MeasuredCondition,
    prob_magnitude,
    measure_prob,
    measure_probs,
    soft_measure,
    measure,
    measure_state,
)

__all__ = [
    "MatrixOp",
    "DenseOp",
    "SparseOp",
    "SwapOp",
    "ControlOp",
    "FnOp",
    "ReflectionOp",
    "make_matrix_op",
    "make_sparse_matrix_op",
    "make_sparse_matrix_from_function",
    "make_fn_op",
    "make_function_op",
    "make_reflection_op",
    "make_swap_op",
    "make_control_op",
    "invert_op",
    "conj_op",
    "transpose_op",
    "from_reals",
    "from_tuples",
    "make_op_matrix",
    "gates",
    "MeasuredCondition",
    "prob_magnitude",
    "measure_prob",
    "measure_probs",
    "soft_measure",
    "measure",
    "measure_state",
]
