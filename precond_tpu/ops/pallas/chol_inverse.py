"""Pallas TPU kernel: batched 96x96 SPD inversion via in-VMEM LDL^T.

The factorization phase's dominant kernel (reference LDLtInverse512,
/root/reference/SeSchwarzPreconditioner.cpp:1347-1546 — a hand-written
AVX2 in-place elimination producing a packed symmetric inverse). The XLA
`cholesky` + two `triangular_solve` path serializes per matrix and was
measured 100-1000x off roofline (VERDICT round 1); this kernel keeps a
group of G blocks resident in VMEM for the whole factorization:

  1. LDL^T elimination, maintaining W = L^-1 as it goes: each pivot step
     applies the same rank-1 row update to A (trailing, symmetric) and to
     W (the eliminations applied to I). Two [G,96,96] VPU FMAs per step,
     no pivoting (SPD: padded diagonals are identity-filled,
     cpp:1365-1367).
  2. Wh = W / sqrt(d) row-scaled, then A^-1 = Wh^T Wh as ONE batched MXU
     matmul (Precision.HIGHEST — the default would truncate the factors
     to bf16, a measured 5e-3 relative error). The Gram form makes the
     result exactly symmetric (identical summands in identical order for
     (i,j) and (j,i)) and PSD by construction — which is what the round-1
     Gauss-Jordan variant lost at condition ~1e7 and why it was
     quarantined (ops/pallas/gj_inverse.py history).

HBM traffic is exactly read-A + write-inverse; everything else lives in
two [G,96,96] VMEM scratch buffers.

`extract` selects how the pivot row is read inside the loop:
  * "ds"     — dynamic sublane slice `ref[:, pl.ds(j,1), :]`; what Mosaic
               compiles on real TPU hardware.
  * "onehot" — one-hot contraction against the full buffer; 2 extra full
               reads per step, but the only form the interpret-mode
               (XLA-CPU) lowering can compile — the ds form hangs XLA-CPU
               compilation inside the fori_loop. Tests use this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DOF = 96


def _make_kernel(extract: str):
    def kernel(a_ref, out_ref, aw_ref, w_ref):
        g = a_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, DOF), 1)      # [1,96]
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (DOF, DOF), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (DOF, DOF), 1)
        ).astype(jnp.float32)

        aw_ref[:] = a_ref[:]
        w_ref[:] = jnp.broadcast_to(eye, (g, DOF, DOF))

        def step(j, _):
            if extract == "ds":
                arow = aw_ref[:, pl.ds(j, 1), :][:, 0, :]            # [G,96]
            else:
                ejc = (
                    jax.lax.broadcasted_iota(jnp.int32, (DOF, 1), 0) == j
                ).astype(jnp.float32)
                arow = jnp.sum(aw_ref[:] * ejc[None], axis=1)
            ej = (lane == j).astype(jnp.float32)
            d = jnp.sum(arow * ej, axis=-1)                          # [G]
            rinv = 1.0 / d
            lt = arow * (lane > j)                                   # strict trailing
            ltc = (lt * rinv[:, None])[:, :, None]                   # [G,96,1]
            # symmetric trailing update; rows/cols <= j left as junk (never read)
            aw_ref[:] = aw_ref[:] - ltc * lt[:, None, :]
            # same row operations applied to W = L^-1 in the making
            if extract == "ds":
                wrow = w_ref[:, pl.ds(j, 1), :]                      # [G,1,96]
            else:
                wrow = jnp.sum(w_ref[:] * ejc[None], axis=1)[:, None, :]
            w_ref[:] = w_ref[:] - ltc * wrow
            return 0

        jax.lax.fori_loop(0, DOF, step, 0)

        # D = diag of the eliminated A ((j,j) is final after step j)
        d_all = jnp.sum(aw_ref[:] * eye[None], axis=2)               # [G,96]
        wh = w_ref[:] * (1.0 / jnp.sqrt(d_all))[:, :, None]
        # A^-1 = Wh^T Wh: contract the row (sublane) axis on the MXU
        gram = jax.lax.dot_general(
            wh, wh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # HIGHEST runs a multi-pass bf16 decomposition whose hi*lo / lo*hi
        # passes accumulate in different orders for (i,j) vs (j,i) — a
        # ~1ulp asymmetry. One transpose+add restores exact symmetry.
        out_ref[:] = 0.5 * (gram + jnp.swapaxes(gram, 1, 2))

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "extract"))
def invert_spd_blocks_chol(
    h96: jnp.ndarray, group: int = 16, extract: str = "ds"
) -> jnp.ndarray:
    """[B,96,96] SPD -> [B,96,96] symmetric PSD inverses.

    B is padded to a multiple of `group` with identity blocks internally.
    """
    b = h96.shape[0]
    pad = (-b) % group
    if pad:
        h96 = jnp.concatenate(
            [h96, jnp.broadcast_to(jnp.eye(DOF, dtype=h96.dtype), (pad, DOF, DOF))]
        )
    bp = b + pad
    out = pl.pallas_call(
        _make_kernel(extract),
        grid=(bp // group,),
        in_specs=[
            pl.BlockSpec((group, DOF, DOF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (group, DOF, DOF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, DOF, DOF), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((group, DOF, DOF), jnp.float32),
            pltpu.VMEM((group, DOF, DOF), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * DOF * DOF * (2 * DOF + DOF),
            bytes_accessed=8 * bp * DOF * DOF,
            transcendentals=bp * DOF,
        ),
    )(h96)
    return out[:b]
