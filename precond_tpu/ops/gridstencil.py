"""Stencil-form block SpMV for structured grids (the cloth fast path).

The reference's host simulator owns SpMV (SURVEY §1: the caller passes an
assembled CSR; SeSchwarzPreconditioner.h:44-51 only consumes it). The
general TPU path here is the block-ELL gather SpMV (ops/blockcsr.py) — but
on a structured cloth grid every nonzero block lies at one of a dozen
constant (di, dj) grid offsets, so H x can be computed with NO gathers at
all: one padded copy of x and, per direction, a static window slice plus a
batched 3x3 matvec. Measured on v5e at 65k verts: 0.64 ms vs 3.27 ms for
the gather ELL — the 113 MB of block traffic is the whole cost.

Blocks are stored VERTEX-MINOR ([3,3,N] / [D,3,3,N]): the matvec
vectorizes over N lanes, and with [N,3,3] storage XLA re-lays-out the
whole block array INSIDE the PCG while-loop every iteration (a
[12,65536,3,3] copy-start/copy-done pair, ~110 us/iter in the op trace).
Vertex-minor storage is already the layout the contraction wants.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


class StencilSystem:
    """Block system matrix of a structured (nx, ny) grid in stencil form.

    y^T = diag_t . x^T + sum_d dirs_t[d] . shifted(x)^T, everything
    vertex-minor. ``offsets`` (static) are grid displacements (di, dj);
    ``dirs_t[d,:,:,v]`` is zero where v + offset_d falls off the grid.
    Registered as a pytree with the offsets/shape as static aux data.

    ``sym=True`` stores only the CANONICAL half of the directions (one
    plane per spring class): each block is symmetric (k d̂ d̂ᵀ) and
    H[u,v] = H[v,u], so the SpMV can apply a plane to both endpoints —
    halving the dominant block traffic and the system's memory.
    """

    def __init__(self, diag_t: jnp.ndarray, dirs_t: jnp.ndarray,
                 offsets: Tuple[Tuple[int, int], ...], grid: Tuple[int, int],
                 sym: bool = False):
        self.diag_t = diag_t    # f32[3,3,N]
        self.dirs_t = dirs_t    # f32[D,3,3,N]
        self.offsets = tuple(map(tuple, offsets))
        self.grid = tuple(grid)
        self.sym = bool(sym)

    @property
    def num_verts(self) -> int:
        return self.diag_t.shape[-1]

    @property
    def diag(self) -> jnp.ndarray:
        """[N,3,3] view (compat accessor for tests/tools)."""
        return jnp.transpose(self.diag_t, (2, 0, 1))

    def tree_flatten(self):
        return (self.diag_t, self.dirs_t), (self.offsets, self.grid, self.sym)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


jax.tree_util.register_pytree_node(
    StencilSystem, StencilSystem.tree_flatten, StencilSystem.tree_unflatten
)


def spmv(sys: StencilSystem, x: jnp.ndarray) -> jnp.ndarray:
    """y = H x for x f32[N,3] in grid (row-major) vertex order."""
    return jnp.transpose(spmv_t(sys, jnp.transpose(x)))


def spmv_t(sys: StencilSystem, xt: jnp.ndarray) -> jnp.ndarray:
    """y^T = H x for x^T f32[3,N]: the component-major core of spmv.

    The contraction is vertex-minor throughout, so a solve that carries
    its vectors component-major ([3,N]) skips the two [N,3] transposes
    per SpMV entirely (the comp-major solve path, ops/gridapply).
    """
    nx, ny = sys.grid
    pad = max(max(abs(di), abs(dj)) for di, dj in sys.offsets) if sys.offsets else 0
    xg = xt.reshape(3, nx, ny)
    xp = jnp.pad(xg, ((0, 0), (pad, pad), (pad, pad)))
    yt = jnp.einsum("ijn,jn->in", sys.diag_t, xt, preferred_element_type=jnp.float32)
    if not sys.sym:
        for d, (di, dj) in enumerate(sys.offsets):
            w = xp[:, pad + di : pad + di + nx, pad + dj : pad + dj + ny].reshape(3, -1)
            yt = yt + jnp.einsum(
                "ijn,jn->in", sys.dirs_t[d], w, preferred_element_type=jnp.float32
            )
        return yt
    # Symmetric half-storage: per canonical plane S_d (the block of the
    # spring leaving v toward v+d), apply BOTH couplings from one read:
    #   y[v]   += S_d[v] . x[v+d]
    #   y[v+d] += S_d[v] . x[v]   (blocks are symmetric, H[u,v] = H[v,u])
    # One stacked einsum keeps S_d to a single pass; the second output is
    # shifted by +d before accumulating (a pad/slice, fused by XLA).
    for d, (di, dj) in enumerate(sys.offsets):
        w = xp[:, pad + di : pad + di + nx, pad + dj : pad + dj + ny].reshape(3, -1)
        both = jnp.einsum(
            "ijn,sjn->sin", sys.dirs_t[d], jnp.stack([w, xt]),
            preferred_element_type=jnp.float32,
        )
        yt = yt + both[0]
        tp = jnp.pad(both[1].reshape(3, nx, ny), ((0, 0), (pad, pad), (pad, pad)))
        yt = yt + tp[:, pad - di : pad - di + nx, pad - dj : pad - dj + ny].reshape(3, -1)
    return yt


def pin_vertices(sys: StencilSystem, pinned: jnp.ndarray, big_diag: float) -> StencilSystem:
    """Decouple pinned rows/columns, exactly like the ELL path's pinning:
    zero every direction block with a pinned endpoint, set a big SPD mass
    diagonal on pinned vertices."""
    nx, ny = sys.grid
    pad = max(max(abs(di), abs(dj)) for di, dj in sys.offsets) if sys.offsets else 0
    pg = jnp.pad(pinned.reshape(nx, ny), ((pad, pad), (pad, pad)))
    masks = []
    for di, dj in sys.offsets:
        src = pg[pad + di : pad + di + nx, pad + dj : pad + dj + ny].reshape(-1)
        masks.append(~(pinned | src))
    dirs_t = sys.dirs_t * jnp.stack(masks).astype(sys.dirs_t.dtype)[:, None, None, :]
    eye = jnp.eye(3, dtype=sys.diag_t.dtype)
    diag_t = jnp.where(pinned[None, None, :], big_diag * eye[:, :, None], sys.diag_t)
    return StencilSystem(diag_t, dirs_t, sys.offsets, sys.grid, sym=sys.sym)
