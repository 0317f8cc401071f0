"""Stencil-form block SpMV for structured 3-D boxes (tet-lattice fast path).

3-D sibling of ops/gridstencil.py: on a structured tet box every nonzero
block sits at one of ~26 constant (di, dj, dk) offsets, so H x needs no
gathers — one padded copy of x and a static window slice per direction.
The planes are extracted from an assembled block-ELL in one streaming
pass (ELL column ids differ from the row id by a CONSTANT row-major
stride per direction), so any ELL producer gets the fast SpMV for free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .blockcsr import BlockEll


class BoxStencilSystem:
    """y^T = diag_t . x^T + sum_d dirs_t[d] . shifted(x)^T, vertex-minor."""

    def __init__(self, diag_t: jnp.ndarray, dirs_t: jnp.ndarray,
                 offsets: Tuple[Tuple[int, int, int], ...],
                 dims: Tuple[int, int, int]):
        self.diag_t = diag_t    # f32[3,3,N]
        self.dirs_t = dirs_t    # f32[D,3,3,N]
        self.offsets = tuple(map(tuple, offsets))
        self.dims = tuple(dims)

    @property
    def num_verts(self) -> int:
        return self.diag_t.shape[-1]

    @property
    def diag(self) -> jnp.ndarray:
        return jnp.transpose(self.diag_t, (2, 0, 1))

    def tree_flatten(self):
        return (self.diag_t, self.dirs_t), (self.offsets, self.dims)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


jax.tree_util.register_pytree_node(
    BoxStencilSystem, BoxStencilSystem.tree_flatten, BoxStencilSystem.tree_unflatten
)


BOX_OFFSETS: Tuple[Tuple[int, int, int], ...] = tuple(
    (di, dj, dk)
    for di in (-1, 0, 1) for dj in (-1, 0, 1) for dk in (-1, 0, 1)
    if (di, dj, dk) != (0, 0, 0)
)


def planes_from_ell(ell: BlockEll, dims: Tuple[int, int, int],
                    offsets: Tuple[Tuple[int, int, int], ...] = BOX_OFFSETS):
    """Extract row-major direction planes from a block-ELL on a box.

    plane_d[v] = sum_k blocks[v,k] where idx[v,k] - v equals the constant
    row-major stride of offset d — one masked reduce per direction (zero
    where the neighbor is absent or off-box; clamped ids can alias a
    stride across a j/k wrap, so validity is re-checked against true
    coordinates). Returns (diag f32[N,3,3], dirs f32[D,N,3,3]).
    """
    nx, ny, nz = dims
    n = nx * ny * nz
    assert ell.num_verts == n
    vid = jnp.arange(n, dtype=jnp.int32)
    vi, vj, vk = vid // (ny * nz), (vid // nz) % ny, vid % nz
    delta = ell.idx.astype(jnp.int32) - vid[:, None]       # [N,K]
    planes = []
    for di, dj, dk in offsets:
        stride = di * ny * nz + dj * nz + dk
        inb = (
            (vi + di >= 0) & (vi + di < nx)
            & (vj + dj >= 0) & (vj + dj < ny)
            & (vk + dk >= 0) & (vk + dk < nz)
        )
        sel = ell.mask & (delta == stride) & inb[:, None]
        planes.append(
            jnp.sum(ell.blocks * sel[:, :, None, None].astype(ell.blocks.dtype), axis=1)
        )
    return ell.diag, jnp.stack(planes)                      # [N,3,3], [D,N,3,3]


def from_ell(ell: BlockEll, dims: Tuple[int, int, int],
             offsets: Tuple[Tuple[int, int, int], ...] = BOX_OFFSETS) -> BoxStencilSystem:
    """Stencil system (vertex-minor layout for the SpMV) from a block-ELL."""
    nx, ny, nz = dims
    n = nx * ny * nz
    diag, dirs = planes_from_ell(ell, dims, offsets)
    diag_t = diag.reshape(n, 9).T.reshape(3, 3, n)
    dirs_t = dirs.reshape(-1, n, 9).transpose(0, 2, 1).reshape(-1, 3, 3, n)
    return BoxStencilSystem(diag_t, dirs_t, offsets, dims)


def spmv(sys: BoxStencilSystem, x: jnp.ndarray) -> jnp.ndarray:
    """y = H x for x f32[N,3] in row-major box vertex order."""
    nx, ny, nz = sys.dims
    pad = 1
    xt = jnp.transpose(x)                                   # [3,N]
    xg = xt.reshape(3, nx, ny, nz)
    xp = jnp.pad(xg, ((0, 0), (pad, pad), (pad, pad), (pad, pad)))
    yt = jnp.einsum("ijn,jn->in", sys.diag_t, xt, preferred_element_type=jnp.float32)
    for d, (di, dj, dk) in enumerate(sys.offsets):
        w = xp[
            :, pad + di : pad + di + nx, pad + dj : pad + dj + ny,
            pad + dk : pad + dk + nz,
        ].reshape(3, -1)
        yt = yt + jnp.einsum(
            "ijn,jn->in", sys.dirs_t[d], w, preferred_element_type=jnp.float32
        )
    return jnp.transpose(yt)
