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

    Cholesky + two batched triangular solves, symmetrized. A batched
    Gauss-Jordan variant (git history / ops/pallas/gj_inverse.py) is much
    friendlier to the TPU's batching but loses too much accuracy in f32 on
    the stiff cloth blocks (condition ~1e7): the resulting M⁻¹ stops being
    PSD enough and CG stalls at max-iters. Cholesky keeps the SPD
    structure and converges; a mixed-precision blocked Pallas factorizer
    is the round-2 replacement (docs/ROADMAP.md).
    """
    b, m, _ = h96.shape

    def _invert(h):
        chol = jnp.linalg.cholesky(h)
        eye = jnp.broadcast_to(jnp.eye(m, dtype=h.dtype), h.shape)
        linv = jax.lax.linalg.triangular_solve(
            chol, eye, left_side=True, lower=True, transpose_a=False
        )
        inv = jax.lax.linalg.triangular_solve(
            chol, linv, left_side=True, lower=True, transpose_a=True
        )
        return 0.5 * (inv + jnp.swapaxes(inv, 1, 2))

    # chunk large batches: the factor/solve pipeline holds ~5 live copies
    # of the batch, which OOMs a 16GB chip at 1M-vertex block counts
    chunk = 4096
    if b <= chunk:
        return _invert(h96)
    pad = (-b) % chunk
    hp = jnp.concatenate(
        [h96, jnp.broadcast_to(jnp.eye(m, dtype=h96.dtype), (pad, m, m))]
    ) if pad else h96
    out = jax.lax.map(_invert, hp.reshape(-1, chunk, m, m))
    return out.reshape(-1, m, m)[:b]


def apply_block_inverse(inv96: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """z_b = inv_b @ r_b for every block. ([B,96,96], [B,96]) -> [B,96].

    This is the SchwarzLocalXSym hot kernel (cpp:1600-1696) minus the packed
    banded layout: one batched matvec that XLA maps onto the MXU. inv96 may
    be stored bf16 (config.inverse_dtype); accumulation is always f32.
    """
    return jnp.einsum(
        "bij,bj->bi", inv96, rhs.astype(inv96.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)
