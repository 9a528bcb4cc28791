"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from rustqip_tpu.errors import CircuitError


def make_shard_mesh(
    n_devices: Optional[int] = None,
    axis: str = "shard",
    devices: Optional[Sequence] = None,
) -> jax.sharding.Mesh:
    """A 1-D device mesh for amplitude sharding.

    The amplitude index's top ``log2(n_devices)`` bits map onto this axis, so
    neighboring shards hold contiguous halves of the state — gates on sharded
    qubits become pairwise amplitude exchanges that ride ICI neighbor links.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
        # Largest power of two available.
        n_devices = 1 << (n_devices.bit_length() - 1)
    if n_devices & (n_devices - 1):
        raise CircuitError(
            f"Amplitude sharding needs a power-of-two device count, got "
            f"{n_devices}"
        )
    if n_devices > len(devices):
        raise CircuitError(
            f"Requested {n_devices} devices but only {len(devices)} available"
        )
    return jax.sharding.Mesh(np.array(devices[:n_devices]), (axis,))
