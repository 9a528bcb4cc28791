"""Copy-bandwidth probe v2: WHICH pipeline structure reaches HBM peak?

Arms (all one read+write of a 2^n f32 plane pair, n=28 -> 4 GiB total):

- xla:        out = x * c under jit (XLA's own streaming pass — the
              practical HBM ceiling on this chip)
- outer:      standard pallas_call grid + BlockSpecs (Mosaic's built-in
              double-buffered pipeline)
- emit_1s:    inner emit_pipeline, 1 strip (the h=0 window shape)
- emit_1s_par: same with dimension_semantics=(PARALLEL,)
- emit_4s:    inner emit_pipeline, 4 quarter-row strips = 8 input + 8
              output DMA streams per grid step (an h=2 window's shape;
              the unfused CCX sweep at h=3 measured ~640 GB/s while the
              h<=1 fused sweep sits at ~290 — stream-count hypothesis)

Each pallas arm x {aliased, fresh} outputs. One JSON line each.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128


def copy_body(*refs):
    k = len(refs) // 2
    for i in range(k):
        refs[k + i][...] = refs[i][...]


def make_emit(rows, br, in_place, ns=1, parallel=False):
    """emit_pipeline copy with ``ns`` row strips (each 1/ns of the rows),
    every strip a separate in/out spec pair against the same refs — the
    window kernel's exact plumbing (_window_sweep_pipelined)."""
    srows = rows // ns
    blks = srows // br

    def outer(xr_h, xi_h, or_h, oi_h):
        def spec(strip):
            return pl.BlockSpec(
                (br, C), lambda r, strip=strip: (strip * blks + r, 0)
            )

        specs = []
        for s in range(ns):
            specs += [spec(s), spec(s)]
        pipe = pltpu.emit_pipeline(
            copy_body,
            grid=(blks,),
            in_specs=specs,
            out_specs=specs,
            dimension_semantics=((pltpu.PARALLEL,) if parallel else None),
        )
        args, outs = [], []
        for _ in range(ns):
            args += [xr_h, xi_h]
            outs += [or_h, oi_h]
        pipe(*args, *outs)

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


def make_outer_grid(rows, br, in_place):
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(re, im):
        return pl.pallas_call(
            copy_body,
            grid=(rows // br,),
            in_specs=[pl.BlockSpec((br, C), lambda r: (r, 0))] * 2,
            out_specs=[pl.BlockSpec((br, C), lambda r: (r, 0))] * 2,
            out_shape=[
                jax.ShapeDtypeStruct((rows, C), jnp.float32),
                jax.ShapeDtypeStruct((rows, C), jnp.float32),
            ],
            input_output_aliases={0: 0, 1: 1} if in_place else {},
        )(re, im)

    return step


def make_xla(rows):
    c = np.float32(1.0000001)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(re, im):
        return re * c, im * c

    return step


def run(tag, step, rows, reps=10):
    re = jnp.zeros((rows, C), jnp.float32)
    im = jnp.zeros((rows, C), jnp.float32)
    t0 = time.time()
    re, im = step(re, im)
    float(re[0, 0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        re, im = step(re, im)
    float(re[0, 0])
    dt = (time.time() - t0) / reps
    gbps = rows * C * 4 * 2 * 2 / dt / 1e9
    print(
        json.dumps(
            {
                "tag": tag,
                "ms": round(dt * 1e3, 3),
                "gbps": round(gbps, 1),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    rows = (1 << n) // C
    br = 512
    print(f"device: {jax.devices()[0]} n={n}", file=sys.stderr)
    run("xla_mul", make_xla(rows), rows)
    for ip in (True, False):
        sfx = "_inplace" if ip else "_fresh"
        run("outer_grid" + sfx, make_outer_grid(rows, br, ip), rows)
        run("emit_1s" + sfx, make_emit(rows, br, ip), rows)
        run(
            "emit_1s_par" + sfx,
            make_emit(rows, br, ip, parallel=True),
            rows,
        )
        run("emit_4s" + sfx, make_emit(rows, br, ip, ns=4), rows)


if __name__ == "__main__":
    main()
