"""Capacity proof: an n-qubit (CAPACITY_N, default 26) sharded state
executes end-to-end on an 8-virtual-device CPU mesh through BOTH sharded
executors. Proven to n=28 (180 s explicit with
RUSTQIP_TPU_EXCHANGE_CHUNKS=4, 107 s gspmd; 2026-08-18). n=30
(2 x 4 GiB planes) aborts on this 1-core host: XLA's in-process CPU
collectives hit their rendezvous deadline moving 512 MiB shards — an
environment limit, not a schedule one; the same program on a v5e-8 pod
shards 2^33 amplitudes at 4 GiB/chip over real ICI."""

import json
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from rustqip_tpu.parallel import make_shard_mesh
    from rustqip_tpu.parallel.sharded import sharded_calculate_state
    from rustqip_tpu.prelude import LocalBuilder

    n = int(os.environ.get("CAPACITY_N", "26"))
    mesh = make_shard_mesh(8)
    results = {}
    for strategy in ("explicit", "gspmd"):
        b = LocalBuilder(dtype="f32")
        r = b.register(n)
        qs = b.split_all_register(r)
        qs[0] = b.h(qs[0])                      # global qubit
        qs[0], qs[-1] = b.cnot(qs[0], qs[-1])   # cross-seam entanglement
        qs[-2] = b.h(qs[-2])                    # local qubit
        b.merge_registers(qs)
        t0 = time.time()
        re, im, _ = sharded_calculate_state(b, mesh=mesh, seed=0,
                                            strategy=strategy)
        import jax.numpy as jnp

        norm = float(jnp.sum(re * re + im * im))
        dt = time.time() - t0
        assert len(re.sharding.device_set) == 8
        assert abs(norm - 1.0) < 1e-5, norm
        log(f"{strategy}: n={n} ran in {dt:.1f}s INCL. COMPILE "
            f"(explicit builds one shard_map per schedule entry), "
            f"norm={norm:.6f}, sharded over 8 devices")
        results[strategy + "_s"] = round(dt, 1)
        del re, im
    print(json.dumps({"n": n, "devices": 8, **results}))


if __name__ == "__main__":
    main()
