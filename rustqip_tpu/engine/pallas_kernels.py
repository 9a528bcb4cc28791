"""Pallas TPU kernels for the hot gate-apply path.

The single hottest operation in state-vector simulation is "apply a fused
k-qubit unitary to every 2^m-amplitude group": with the low-qubit block
expanded to C x C (C = 128 = one MXU tile), it is exactly

    out[R, C] = state[R, C] @ B^T

over complex amplitudes stored as separate float32 planes (complex never
materializes on TPU here). The kernel streams row blocks HBM -> VMEM,
issues the four real matmuls of the complex product on the MXU, and writes
back — one read + one write of the state per gate pass, the speed-of-light
minimum. (XLA's complex dot lowering reads each operand plane twice; doing
it in one kernel halves traffic.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rustqip_tpu.types import MINOR_QUBITS

_C = 1 << MINOR_QUBITS  # 128

#: Rows per grid step. 8 * 128 sublane tiles; 512 rows x 128 lanes x 4B x 2
#: planes x (in + out) = 1 MiB of VMEM per step — far under the 16 MiB
#: budget while long enough to hide DMA latency.
_BLOCK_ROWS = 512


def _c64_matmul_kernel(xr_ref, xi_ref, br_ref, bi_ref, or_ref, oi_ref):
    xr = xr_ref[:]
    xi = xi_ref[:]
    br = br_ref[:]
    bi = bi_ref[:]
    # (xr + i xi) @ (br + i bi): four real MXU matmuls.
    or_ref[:] = jnp.dot(xr, br, preferred_element_type=jnp.float32) - jnp.dot(
        xi, bi, preferred_element_type=jnp.float32
    )
    oi_ref[:] = jnp.dot(xr, bi, preferred_element_type=jnp.float32) + jnp.dot(
        xi, br, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("rows",))
def _invoke(xr, xi, br, bi, rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (rows // _BLOCK_ROWS,)
    row_spec = pl.BlockSpec(
        (_BLOCK_ROWS, _C), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    mat_spec = pl.BlockSpec((_C, _C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _c64_matmul_kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, mat_spec, mat_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _C), jnp.float32),
            jax.ShapeDtypeStruct((rows, _C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * _C * _C,
            bytes_accessed=2 * rows * _C * 4 * 2,
            transcendentals=0,
        ),
    )(xr, xi, br, bi)


def available() -> bool:
    """Use the Pallas kernel?

    On TPU this is the fast path (one read+write per gate pass). Exception:
    under the axon remote-compile relay each Mosaic kernel costs ~10-20
    minutes of AOT compile (it runs fine afterwards), so it defaults off
    there; set RUSTQIP_TPU_PALLAS=1/0 to override either way.
    """
    import os

    if jax.default_backend() != "tpu":
        return False
    env = os.environ.get("RUSTQIP_TPU_PALLAS")
    if env is not None:
        return env == "1"
    return "PALLAS_AXON_TPU_GEN" not in os.environ


def c64_low_matmul(xr: jnp.ndarray, xi: jnp.ndarray, B: np.ndarray):
    """(xr + i xi) @ B.T for a C x C complex block matrix B.

    Inputs are (R, C) float32 planes; returns the output planes. Falls back
    to plain jnp matmuls when the shape doesn't tile or off-TPU.
    """
    rows = xr.shape[0]
    bt = np.ascontiguousarray(B.T)
    br = np.ascontiguousarray(np.real(bt))
    bi = np.ascontiguousarray(np.imag(bt))
    if (
        available()
        and xr.dtype == jnp.float32
        and rows % _BLOCK_ROWS == 0
        and xr.shape[1] == _C
    ):
        out_r, out_i = _invoke(
            xr,
            xi,
            jnp.asarray(br.astype(np.float32)),
            jnp.asarray(bi.astype(np.float32)),
            rows=rows,
        )
        return out_r, out_i
    brj = jnp.asarray(br, dtype=xr.dtype)
    bij = jnp.asarray(bi, dtype=xr.dtype)
    out_r = xr @ brj - xi @ bij
    out_i = xr @ bij + xi @ brj
    return out_r, out_i
