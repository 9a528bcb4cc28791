"""TPU micro-probe: row-bit field reversal primitives at n=28.

QFT-28's bit reversal spends 37.8 ms (19% of the circuit) in ONE XLA
rank-16 bit-axis-reversed transpose (engine/apply._row_swap_planes) —
512-byte scattered row moves, ~2.3x over the measured ~16.5 ms
fresh-output copy floor. The only single-HBM-pass alternative is a
Pallas SLAB kernel: contiguous DMA of whole field slabs (8 MiB/plane at
span 14) + an in-VMEM row shuffle. This probes the shuffle primitives
on the real chip, same-session vs the XLA baseline:

  A. XLA fused transpose (production path today)      [baseline]
  B. Pallas slab + static jnp.take(perm, axis=0)      [vgather?]
  C. Pallas slab + 7 masked roll-pair bit swaps       [proven VPU ops]
  D. Pallas slab + 2 Rev-permutation matmuls + swap   [MXU + relayout]

Shape: (2^21, 128) f32 x 2 planes, reversal of row bits 0..13 (the
field QFT-28's row pairs leave after the staged cross transpose, i.e.
qubits 7..20 -> row bits 0..13 reversed). Each variant checks
correctness on a small slab off the timed path first.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CPU = "--cpu" in sys.argv  # small-shape interpret-mode self-check
N = 18 if CPU else 28
M = 7
C = 128
SPAN = 8 if CPU else 14
R = 1 << (N - M)  # rows
PRE = R >> SPAN  # slabs
SLAB = 1 << SPAN  # rows per slab


def revbits(x, k):
    r = 0
    for t in range(k):
        r |= ((x >> t) & 1) << (k - 1 - t)
    return r


PERM = np.array([revbits(i, SPAN) for i in range(SLAB)], dtype=np.int32)


def sync(x):
    return float(x[0, 0])


def timeit(tag, fn, xr, xi, trials=5):
    t0 = time.time()
    r, i = fn(xr, xi)
    sync(r)
    print(f"{tag} compile+first: {time.time() - t0:.1f} s", file=sys.stderr)
    ts = []
    for _ in range(trials):
        t0 = time.time()
        r, i = fn(xr, xi)
        sync(r)
        ts.append(time.time() - t0)
    ts.sort()
    print(f"{tag}: {ts[len(ts) // 2] * 1e3:.2f} ms median "
          f"{[round(t * 1e3, 2) for t in ts]}")
    return r, i


# --- A: XLA fused transpose (mirrors _row_swap_planes' fused path) ----
@jax.jit
def xla_rev(xr, xi):
    outs = []
    for x in (xr, xi):
        shape = (PRE,) + (2,) * SPAN + (C,)
        perm = (0,) + tuple(range(SPAN, 0, -1)) + (SPAN + 1,)
        outs.append(x.reshape(shape).transpose(perm).reshape(R, C))
    return outs[0], outs[1]


# --- Pallas slab kernels ---------------------------------------------
def _slab_call(body, extra=(), extra_specs=()):
    spec = pl.BlockSpec((SLAB, C), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)

    def kernel(*refs):
        body(*refs)

    def run(xr, xi):
        def one(x):
            kw = (
                {"interpret": True}
                if CPU
                else {
                    "compiler_params": pltpu.CompilerParams(
                        vmem_limit_bytes=96 * 1024 * 1024,
                    )
                }
            )
            return pl.pallas_call(
                kernel,
                grid=(PRE,),
                in_specs=[spec] + list(extra_specs),
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
                **kw,
            )(x, *extra)

        return one(xr), one(xi)

    return jax.jit(run)


# B: take with the permutation resident as an (SLAB, 1) int32 operand
def body_take(in_ref, perm_ref, out_ref):
    out_ref[:] = jnp.take(in_ref[:], perm_ref[:].reshape(-1), axis=0)


# C: masked roll bit swaps
def body_rolls(in_ref, out_ref):
    x = in_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (SLAB, 1), 0)
    for t in range(SPAN // 2):
        i, j = t, SPAN - 1 - t
        d = (1 << j) - (1 << i)
        bi = ((rows >> i) & 1) == 1
        bj = ((rows >> j) & 1) == 1
        up = pltpu.roll(x, SLAB - d, 0)   # out row r reads x[r + d]
        dn = pltpu.roll(x, d, 0)          # out row r reads x[r - d]
        # (bi=1, bj=0): partner = r - 2^i + 2^j = r + d -> up;
        # (bi=0, bj=1): partner = r - d -> dn; equal bits: unchanged.
        x = jnp.where(bi & jnp.logical_not(bj), up,
                      jnp.where(bj & jnp.logical_not(bi), dn, x))
    out_ref[:] = x


# D: two Rev matmuls + leading-axes swap
A_B = SPAN // 2  # 7
NA = 1 << A_B
REV7 = np.zeros((NA, NA), np.float32)
for v in range(NA):
    REV7[revbits(v, A_B), v] = 1.0


def body_mm(in_ref, rev_ref, out_ref):
    rv = rev_ref[:]
    x = in_ref[:].reshape(NA, NA * C)
    y = jnp.dot(rv, x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    y = jnp.swapaxes(y.reshape(NA, NA, C), 0, 1).reshape(NA, NA * C)
    z = jnp.dot(rv, y, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = z.reshape(SLAB, C)


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(R, C)).astype(np.float32))

    ra, ia = timeit("A_xla_transpose", xla_rev, xr, xi)
    want = np.asarray(ra)

    mat_spec = pl.BlockSpec((NA, NA), lambda g: (0, 0),
                            memory_space=pltpu.VMEM)
    perm_spec = pl.BlockSpec((SLAB, 1), lambda g: (0, 0),
                             memory_space=pltpu.VMEM)
    variants = [
        ("B_take", _slab_call(body_take,
                              extra=(jnp.asarray(PERM).reshape(SLAB, 1),),
                              extra_specs=(perm_spec,))),
        ("C_rolls", _slab_call(body_rolls)),
        ("D_matmul", _slab_call(body_mm, extra=(jnp.asarray(REV7),),
                                extra_specs=(mat_spec,))),
    ]
    for tag, fn in variants:
        try:
            r, i = timeit(tag, fn, xr, xi)
            diff = float(jnp.max(jnp.abs(r - ra)))
            print(f"{tag} max|diff| vs XLA: {diff:.2e}")
        except Exception as e:
            print(f"{tag} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
