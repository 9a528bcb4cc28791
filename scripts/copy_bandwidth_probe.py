"""Pure-copy Pallas pipeline probe: the achievable HBM bandwidth of the
window kernel's block structure, with ZERO compute in the body.

Measures, per block size (rows per grid step), the wall-clock of one
read+write of a 2^n f32 plane pair through the same emit_pipeline shape
``_window_sweep_pipelined`` uses (h=0: one strip, strided trivially).
This pins the speed-of-light the real window sweeps should be compared
against — v5e HBM peak is 819 GB/s; whatever this probe reaches is the
PIPELINE's ceiling (ramp, DMA granularity, buffer count included).

Usage: python scripts/copy_bandwidth_probe.py [n] [br,br,...]
Prints one JSON line per arm.
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    brs = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [512, 1024, 2048]
    )
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = 128
    rows = (1 << n) // C
    print(f"device: {jax.devices()[0]} n={n} rows={rows}", file=sys.stderr)

    def make_step(br, in_place):
        def outer(xr_h, xi_h, or_h, oi_h):
            def body(xr, xi, outr, outi):
                outr[...] = xr[...]
                outi[...] = xi[...]

            bs = pl.BlockSpec((br, C), lambda r: (r, 0))
            pipe = pltpu.emit_pipeline(
                body,
                grid=(rows // br,),
                in_specs=[bs, bs],
                out_specs=[bs, bs],
            )
            pipe(xr_h, xi_h, or_h, oi_h)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(re, im):
            return pl.pallas_call(
                outer,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_shape=[
                    jax.ShapeDtypeStruct((rows, C), jnp.float32),
                    jax.ShapeDtypeStruct((rows, C), jnp.float32),
                ],
                input_output_aliases={0: 0, 1: 1} if in_place else {},
            )(re, im)

        return step

    for br in brs:
        for in_place in (False, True):
            re = jnp.zeros((rows, C), jnp.float32)
            im = jnp.zeros((rows, C), jnp.float32)
            step = make_step(br, in_place)
            t0 = time.time()
            re, im = step(re, im)
            float(re[0, 0])  # scalar fetch: the relay-safe sync
            compile_s = time.time() - t0
            t0 = time.time()
            reps = 10
            for _ in range(reps):
                re, im = step(re, im)
            float(re[0, 0])
            dt = (time.time() - t0) / reps
            gbps = rows * C * 4 * 2 * 2 / dt / 1e9  # 2 planes x (r+w)
            print(
                json.dumps(
                    {
                        "br": br,
                        "in_place": in_place,
                        "ms_per_sweep": round(dt * 1e3, 3),
                        "gbps": round(gbps, 1),
                        "compile_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
