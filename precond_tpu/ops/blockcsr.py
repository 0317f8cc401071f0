"""3x3-block sparse system matrix in ELL (padded fixed-degree) layout.

The reference consumes a 3x3-block CSR split into `diagonal` +
`csrOffDiagonals` + `csrRanges` raw pointers plus a vertex-adjacency CSR
(/root/reference/SeSchwarzPreconditioner.h:51,59; .cpp:67-72). On TPU,
ragged rows defeat static shapes and MXU tiling, so the canonical in-device
form is ELL: every row padded to the max degree K.

    idx    i32[N, K]   column (vertex) index per slot; padded slots -> own row
    blocks f32[N, K, 3, 3]  off-diagonal 3x3 blocks; padded slots -> 0
    diag   f32[N, 3, 3]     diagonal blocks
    mask   bool[N, K]       valid-slot mask

SpMV y = H x is then a gather + einsum. Measured on v5e the gather prices
per offset (~4.2 ns x N*K), not per byte — so the production hot path for
structured meshes eliminates gathers entirely (ops/gridstencil.py, ~5x),
and this general ELL form is the fallback for unstructured topology plus
the oracle for both.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BlockEll(NamedTuple):
    """Block-sparse symmetric system matrix H (3N x 3N), ELL layout."""

    diag: jnp.ndarray    # f32[N, 3, 3]
    idx: jnp.ndarray     # i32[N, K]
    blocks: jnp.ndarray  # f32[N, K, 3, 3]
    mask: jnp.ndarray    # bool[N, K]

    @property
    def num_verts(self) -> int:
        return self.diag.shape[0]

    @property
    def max_degree(self) -> int:
        return self.idx.shape[1]

    @property
    def nnz_blocks(self) -> jnp.ndarray:
        """Number of stored 3x3 blocks (diagonal + valid off-diagonals)."""
        return self.num_verts + jnp.sum(self.mask)


def from_coo(
    num_verts: int,
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    diag: np.ndarray,
    max_degree: Optional[int] = None,
) -> BlockEll:
    """Host-side packer: COO off-diagonal 3x3 blocks -> BlockEll.

    Duplicate (row, col) entries are summed. Rows/cols are the block (vertex)
    indices; `vals` is [M,3,3]; `diag` is [N,3,3].
    """
    from .. import native

    idx, blocks, mask = native.coo_to_ell(
        num_verts, np.asarray(rows), np.asarray(cols),
        np.asarray(vals, np.float32), max_degree
    )
    return BlockEll(
        diag=jnp.asarray(diag, jnp.float32),
        idx=jnp.asarray(idx),
        blocks=jnp.asarray(blocks),
        mask=jnp.asarray(mask),
    )


def scatter_accumulate(size: int, tgt: jnp.ndarray, vals: jnp.ndarray,
                       unique: bool = False) -> jnp.ndarray:
    """out[tgt[e]] += vals[e] with OOB targets dropped. The workhorse scatter.

    The optimization barrier is load-bearing: without it XLA fuses the
    index/value computation INTO the scatter and the TPU executes it
    serially per element — measured ~900x slower on a v5e. With the
    barrier the operands materialize first and the scatter runs at
    HBM-bandwidth speed.
    """
    tgt, vals = jax.lax.optimization_barrier((tgt.reshape(-1), vals.reshape((-1,) + vals.shape[tgt.ndim:])))
    out = jnp.zeros((size,) + vals.shape[1:], vals.dtype)
    return out.at[tgt].add(vals, mode="drop", unique_indices=unique)


def spmv(h: BlockEll, x: jnp.ndarray) -> jnp.ndarray:
    """y = H x with x, y of shape [N, 3].

    One row gather over the ELL table plus two batched contractions.
    (A reciprocal-slot scatter variant was benchmarked head-to-head inside
    jit chains on the v5e and lost ~10x to the gather for this access
    pattern — docs/DESIGN.md §3 — so the gather stays.)
    """
    xg = jnp.take(x, h.idx, axis=0)                      # [N, K, 3]
    off = jnp.einsum("nkij,nkj->ni", h.blocks, xg)       # [N, 3]
    dia = jnp.einsum("nij,nj->ni", h.diag, x)            # [N, 3]
    return dia + off


def to_dense(h: BlockEll) -> jnp.ndarray:
    """Dense 3N x 3N matrix (test oracle only)."""
    n = h.num_verts
    dense = jnp.zeros((n, 3, n, 3), h.diag.dtype)
    dense = dense.at[jnp.arange(n), :, jnp.arange(n), :].add(h.diag)
    rows = jnp.repeat(jnp.arange(n), h.max_degree)
    cols = h.idx.reshape(-1)
    vals = jnp.where(h.mask.reshape(-1, 1, 1), h.blocks.reshape(-1, 3, 3), 0.0)
    dense = dense.at[rows, :, cols, :].add(vals)
    return dense.reshape(3 * n, 3 * n)


def permute(h: BlockEll, sorted_to_orig: jnp.ndarray, orig_to_sorted: jnp.ndarray) -> BlockEll:
    """Symmetric permutation P H P^T into Morton-sorted vertex order.

    Mirrors MapHessianTable (cpp:258-285): row r of the result is original
    row sorted_to_orig[r] with column ids remapped through orig_to_sorted.
    """
    diag = jnp.take(h.diag, sorted_to_orig, axis=0)
    idx = jnp.take(orig_to_sorted, jnp.take(h.idx, sorted_to_orig, axis=0))
    blocks = jnp.take(h.blocks, sorted_to_orig, axis=0)
    mask = jnp.take(h.mask, sorted_to_orig, axis=0)
    # Padded slots must keep pointing at their own (new) row.
    own = jnp.broadcast_to(jnp.arange(idx.shape[0], dtype=idx.dtype)[:, None], idx.shape)
    idx = jnp.where(mask, idx, own)
    return BlockEll(diag=diag, idx=idx, blocks=blocks, mask=mask)
