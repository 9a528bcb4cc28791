"""Algorithm library (L4): QFT, reversible arithmetic, Grover search.

Re-design of the reference's ``qip/src/qfft.rs`` and
``qip/src/boolean_circuits/arithmetic.rs`` on top of the ``program``/
``invertible`` DSL, plus a Grover search (the reference ships it as an
example pattern; here it's a library routine and the benchmark flagship).
"""

from rustqip_tpu.algos.qfft import qfft, qfft_inverse
from rustqip_tpu.algos.arithmetic import (
    add,
    add_mod,
    carry,
    copy,
    exp_mod,
    lshift,
    rshift,
    square_mod,
    sum_,
    times_mod,
)
from rustqip_tpu.algos.grover import grover_search, grover_iteration

__all__ = [
    "qfft",
    "qfft_inverse",
    "add",
    "add_mod",
    "carry",
    "copy",
    "exp_mod",
    "lshift",
    "rshift",
    "square_mod",
    "sum_",
    "times_mod",
    "grover_search",
    "grover_iteration",
]
