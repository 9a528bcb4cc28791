"""Model/algorithm families built on the framework.

The quantum-simulator analog of a "models" package: complete circuit
families ready to instantiate — QFT, the reversible-arithmetic suite
(the Shor building blocks), Grover search, and Shor period finding.
(Thin façade over :mod:`rustqip_tpu.algos`.)
"""

from rustqip_tpu.algos import (
    add,
    add_mod,
    carry,
    copy,
    exp_mod,
    grover_iteration,
    grover_search,
    lshift,
    qfft,
    qfft_inverse,
    rshift,
    square_mod,
    sum_,
    times_mod,
)
from rustqip_tpu.algos.shor import shor_period_circuit, find_period, factor

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
    "shor_period_circuit",
    "find_period",
    "factor",
]
