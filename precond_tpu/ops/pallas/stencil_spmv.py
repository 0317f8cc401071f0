"""Fused stencil-form block SpMV for structured grids (Pallas).

The XLA stencil SpMV (ops/gridstencil.py) is one einsum per direction —
13+ separate passes over the output at 65k-1M vertices. This kernel fuses
the whole y = H x into ONE pass: per lane-tile it reads the diagonal tile,
the D direction tiles, and D+1 shifted windows of a VMEM-resident padded
x, and accumulates 3x3 block matvecs on the VPU. Traffic is exactly the
plane bytes + x + y (the roofline), instead of D+1 output passes.

Design source: the reference's apply/SpMV kernels are banked AVX2 loops
(SeSchwarzPreconditioner.cpp:1600-1696); the host SpMV contract itself is
SURVEY §1 (the caller owns SpMV). Shifted-window indexing works because a
grid offset (di, dj) is a constant flat shift di*ny + dj in row-major
order, and every flat position that would wrap a row edge corresponds to
an off-grid neighbor whose direction block is already zero
(gridstencil.StencilSystem builds the masks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nd: int, tile: int, pad: int, shifts: tuple,
            x_ref, diag_ref, dirs_ref, y_ref):
    # x_ref: [3, N + 2*pad] full VMEM-resident padded vector
    # diag_ref: [9, T]; dirs_ref: [D*9, T]; y_ref: [3, T]
    t = pl.program_id(0)
    base = t * tile + pad
    xc = x_ref[:, pl.ds(base, tile)]                    # [3, T]
    acc = [jnp.zeros((tile,), jnp.float32) for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc[i] += diag_ref[3 * i + j, :] * xc[j, :]
    for d in range(nd):
        xd = x_ref[:, pl.ds(base + shifts[d], tile)]    # [3, T]
        for i in range(3):
            for j in range(3):
                acc[i] += dirs_ref[d * 9 + 3 * i + j, :] * xd[j, :]
    y_ref[:, :] = jnp.stack(acc)


@functools.partial(jax.jit, static_argnames=("offsets", "grid", "tile", "interpret"))
def spmv_pallas(diag_t: jnp.ndarray, dirs_t: jnp.ndarray, x: jnp.ndarray,
                offsets: tuple, grid: tuple, tile: int = 2048,
                interpret: bool = False) -> jnp.ndarray:
    """y = H x, fused one-pass stencil SpMV. x f32[N,3] grid order.

    diag_t f32[3,3,N], dirs_t f32[D,3,3,N] vertex-minor (the
    gridstencil.StencilSystem layout), offsets the static (di, dj) tuple.
    N must be a multiple of `tile` (power-of-two grids are).
    """
    nx, ny = grid
    n = diag_t.shape[-1]
    tile = min(tile, n)  # powers of two divide
    assert n % tile == 0, (n, tile)
    shifts = tuple(di * ny + dj for di, dj in offsets)
    pad = max((abs(s) for s in shifts), default=0)
    pad = -(-pad // 128) * 128  # lane-aligned windows
    nd = len(offsets)

    xt = jnp.transpose(x).astype(jnp.float32)           # [3, N]
    x_pad = jnp.pad(xt, ((0, 0), (pad, pad)))
    diag9 = diag_t.reshape(9, n)
    dirs9 = dirs_t.reshape(nd * 9, n)

    yt = pl.pallas_call(
        functools.partial(_kernel, nd, tile, pad, shifts),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident across tiles
            pl.BlockSpec((9, tile), lambda t: (0, t)),
            pl.BlockSpec((nd * 9, tile), lambda t: (0, t)),
        ],
        out_specs=pl.BlockSpec((3, tile), lambda t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
        interpret=interpret,
    )(x_pad, diag9, dirs9)
    return jnp.transpose(yt)


def spmv_system(sys, x: jnp.ndarray, tile: int = 2048,
                interpret: bool = False) -> jnp.ndarray:
    """Drop-in for gridstencil.spmv (full two-plane systems, sym=False)."""
    assert not sys.sym, "pallas stencil spmv implements the full-plane form"
    return spmv_pallas(sys.diag_t, sys.dirs_t, x, sys.offsets, sys.grid,
                       tile=tile, interpret=interpret)
