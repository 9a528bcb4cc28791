"""Utility subpackage: bit math, serialization, observability.

``bits`` covers the reference's util modules (``qip-iterators/src/utils.rs``
and ``qip/src/utils.rs``); ``serialize`` and ``observe`` are the
checkpoint/metrics subsystems (SURVEY.md §5).
"""

from rustqip_tpu.utils.bits import (
    entwine_bits,
    extract_bits,
    flip_bits,
    full_to_sub,
    get_bit,
    get_flat_index,
    set_bit,
    sub_to_full,
    transpose_sparse,
)

__all__ = [
    "entwine_bits",
    "extract_bits",
    "flip_bits",
    "full_to_sub",
    "get_bit",
    "get_flat_index",
    "set_bit",
    "sub_to_full",
    "transpose_sparse",
]
