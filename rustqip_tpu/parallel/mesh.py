"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

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


def make_multislice_mesh(
    n_slices: int,
    per_slice: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axes: Tuple[str, str] = ("dcn", "shard"),
) -> jax.sharding.Mesh:
    """A 2-D (DCN x ICI) mesh for multi-slice pods.

    The amplitude index shards over the axis product with the MOST
    significant qubits on the outer (DCN) axis — gates on those qubits are
    the rarest exchanges, so the slow inter-slice links carry the least
    traffic. Runs through the GSPMD executor (the explicit shard_map path
    is 1-D).
    """
    if devices is None:
        devices = jax.devices()
    if per_slice is None:
        per_slice = len(devices) // n_slices
    total = n_slices * per_slice
    for dim, name in ((n_slices, "n_slices"), (per_slice, "per_slice")):
        if dim < 1 or dim & (dim - 1):
            raise CircuitError(
                f"Amplitude sharding needs power-of-two mesh dims; "
                f"{name}={dim}"
            )
    if total > len(devices):
        raise CircuitError(
            f"Requested {total} devices but only {len(devices)} available"
        )
    arr = np.array(devices[:total]).reshape(n_slices, per_slice)
    return jax.sharding.Mesh(arr, tuple(axes))
