"""Pallas TPU kernel: batched 96x96 SPD inversion, VMEM-resident.

The factorization phase's hot kernel (reference LDLtInverse512,
cpp:1347-1546, an AVX2 in-place elimination). An XLA-level Gauss-Jordan
loop re-reads the whole batch from HBM on every one of the 96 pivot steps
(~31 GB for 2187 blocks); this kernel keeps a group of augmented systems
in VMEM scratch for the entire elimination, so HBM traffic is exactly
read-A + write-inverse.

Pivot row/column extraction uses one-hot contractions instead of dynamic
slicing (Mosaic restricts dynamic indexing on minor dims). No pivoting:
SPD pivots are positive (padded diagonals are identity-filled,
cpp:1365-1367), matching the reference's unpivoted elimination.

PRECISION CAVEAT: in f32, Gauss-Jordan loses PSD-ness on severely
ill-conditioned blocks (cond ~1e7 stiff-cloth systems) and CG stalls;
the default path stays Cholesky-based (ops/batched_inverse.py). Use this
kernel for moderately conditioned systems or as the starting point for
the round-2 mixed-precision blocked factorizer (docs/ROADMAP.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DOF = 96


def _gj_kernel(a_ref, out_ref, aug_ref):
    g = a_ref.shape[0]
    # augmented [G, 96, 192] = [A | I]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (DOF, DOF), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (DOF, DOF), 1)
    ).astype(jnp.float32)
    aug_ref[:, :, :DOF] = a_ref[:]
    aug_ref[:, :, DOF:] = jnp.broadcast_to(eye, (g, DOF, DOF))

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (DOF, 1), 0)   # [96,1]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, DOF), 1)  # [1,96]

    def step(j, _):
        aug = aug_ref[:]
        ej_col = (col_ids == j).astype(jnp.float32)      # [96,1]
        ej_row = (lane_ids == j).astype(jnp.float32)     # [1,96]
        # pivot row and its diagonal entry via one-hot contractions
        prow = jnp.sum(aug * ej_col[None, :, :], axis=1)               # [G,192]
        piv = jnp.sum(prow[:, :DOF] * ej_row, axis=1)                  # [G]
        prow = prow / piv[:, None]
        col = jnp.sum(aug[:, :, :DOF] * ej_row[None, :, :], axis=2)    # [G,96]
        new = aug - col[:, :, None] * prow[:, None, :]
        # restore row j to the normalized pivot row
        mask = ej_col[None, :, :]                        # [1,96,1]
        aug_ref[:] = new * (1.0 - mask) + prow[:, None, :] * mask
        return 0

    jax.lax.fori_loop(0, DOF, step, 0)
    inv = aug_ref[:, :, DOF:]
    out_ref[:] = 0.5 * (inv + jnp.swapaxes(inv, 1, 2))


@functools.partial(jax.jit, static_argnames=("group",))
def invert_spd_blocks_pallas(h96: jnp.ndarray, group: int = 8) -> jnp.ndarray:
    """[B,96,96] SPD -> [B,96,96] inverses (B must divide by `group`)."""
    b = h96.shape[0]
    if b % group != 0:
        group = 1
    return pl.pallas_call(
        _gj_kernel,
        grid=(b // group,),
        in_specs=[pl.BlockSpec((group, DOF, DOF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group, DOF, DOF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, DOF, DOF), h96.dtype),
        scratch_shapes=[pltpu.VMEM((group, DOF, 2 * DOF), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * DOF * DOF * 2 * DOF,
            bytes_accessed=8 * b * DOF * DOF,
            transcendentals=0,
        ),
    )(h96)
