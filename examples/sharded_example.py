"""Distributed execution: the same circuit on a sharded amplitude vector.

Runs on whatever devices are available; to simulate a pod on one host:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_example.py      # (CPU platform forced below
                                                #  when >1 virtual device)

On a real TPU pod, drop the flag — the mesh spans the chips and the
amplitude exchanges ride ICI.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
_want_virtual = "host_platform_device_count" in _flags

import jax  # noqa: E402

if _want_virtual:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rustqip_tpu.algos import qfft  # noqa: E402
from rustqip_tpu.parallel import make_shard_mesh  # noqa: E402
from rustqip_tpu.parallel.sharded import sharded_calculate_state  # noqa: E402
from rustqip_tpu.prelude import LocalBuilder  # noqa: E402


def build(b, n):
    r = b.register(n)
    qs = b.split_all_register(r)
    qs[0] = b.h(qs[0])                     # a distributed ("global") qubit
    qs[0], qs[-1] = b.cnot(qs[0], qs[-1])  # entangle across the seam
    r = qfft(b, b.merge_registers(qs))
    return b.measure_stochastic(r)


def main():
    n_dev = len(jax.devices())
    mesh = make_shard_mesh()  # largest power-of-two device count
    n = max(6, mesh.devices.size.bit_length() + 3)
    print(f"devices: {n_dev}, mesh: {mesh.devices.size}, qubits: {n}")

    for strategy in ("gspmd", "explicit"):
        b = LocalBuilder(dtype="f32")
        _, handle = build(b, n)
        re, im, measured = sharded_calculate_state(
            b, mesh=mesh, seed=0, strategy=strategy
        )
        probs = measured.get_stochastic_measurement(handle)
        print(
            f"{strategy:>8}: state sharded over "
            f"{len(re.sharding.device_set)} device(s); "
            f"norm = {float(np.sum(probs)):.6f}; "
            f"top outcome p = {float(probs.max()):.4f}"
        )


if __name__ == "__main__":
    main()
