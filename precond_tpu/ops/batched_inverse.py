"""Batched dense inversion of the 96x96 domain Hessians.

The reference runs a hand-written AVX2 in-place LDL^T Gauss elimination per
block and emits a 4704-float packed symmetric inverse
(LDLtInverse512, cpp:1347-1546). On TPU the same factorization is a batched
Cholesky: blocks are SPD by construction (assembly identity-fills padded
diagonals, cpp:1365-1367), XLA batches `cholesky`/`triangular_solve` over
the leading axis, and the apply becomes a single MXU batched matvec against
the explicit inverse — memory is cheap relative to the reference's
shared-memory budget (SURVEY.md §7.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def invert_spd_blocks(h96: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverses of a batch of SPD matrices. [B,96,96] -> [B,96,96].

    Batch-vectorized Gauss-Jordan on the augmented system [A | I]: 96
    pivot steps of pure elementwise/outer-product work over the whole
    batch on the VPU. XLA's batched cholesky/triangular_solve serializes
    per matrix (measured 2.5s for 2187 blocks on a v5e; this runs the lot
    in tens of ms). No pivoting — pivots of an SPD matrix are positive
    (the reference's LDL^T elimination makes the same assumption,
    cpp:1394-1415; padded diagonals are identity-filled).
    """
    b, m, _ = h96.shape
    aug = jnp.concatenate(
        [h96, jnp.broadcast_to(jnp.eye(m, dtype=h96.dtype), (b, m, m))], axis=2
    )

    def pivot_step(j, a):
        piv_row = a[:, j, :] / a[:, j, j][:, None]          # [B,2m]
        col = a[:, :, j]                                     # [B,m]
        a = a - col[:, :, None] * piv_row[:, None, :]
        return jax.lax.dynamic_update_slice_in_dim(
            a, piv_row[:, None, :], j, axis=1
        )

    aug = jax.lax.fori_loop(0, m, pivot_step, aug)
    inv = aug[:, :, m:]
    return 0.5 * (inv + jnp.swapaxes(inv, 1, 2))


def apply_block_inverse(inv96: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """z_b = inv_b @ r_b for every block. ([B,96,96], [B,96]) -> [B,96].

    This is the SchwarzLocalXSym hot kernel (cpp:1600-1696) minus the packed
    banded layout: one batched matvec that XLA maps onto the MXU.
    """
    return jnp.einsum("bij,bj->bi", inv96, rhs, preferred_element_type=jnp.float32)
