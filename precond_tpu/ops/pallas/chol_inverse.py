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


P = 32  # panel width


def _factor32(app):
    """LDL^T of a batch of 32x32 SPD panels, maintaining W = L^-1.

    app: [G,32,32]. Returns (w [G,32,32] = L^-1 unit-lower, d [G,32]).
    32 scalar-pivot steps on 32-wide rows — 1/9 the VPU work of the same
    loop on 96-wide rows; extraction is one-hot (interpret-mode friendly).
    """
    g = app.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)            # [1,32]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    ).astype(jnp.float32)
    w0 = jnp.broadcast_to(eye, (g, P, P))
    d0 = jnp.zeros((g, P), jnp.float32)

    def step(j, carry):
        m, w, d = carry
        e = (lane == j).astype(jnp.float32)                          # [1,32]
        row = jnp.sum(m * e[:, :, None], axis=1)                     # [G,32]
        dj = jnp.sum(row * e, axis=1)                                # [G]
        col = jnp.sum(m * e[:, None, :], axis=2)                     # [G,32]
        below = (lane > j).astype(jnp.float32)                       # [1,32]
        c = (col * below) * (1.0 / dj)[:, None]                      # [G,32]
        m = m - c[:, :, None] * row[:, None, :]
        wrow = jnp.sum(w * e[:, :, None], axis=1)                    # [G,32]
        w = w - c[:, :, None] * wrow[:, None, :]
        d = d + e * dj[:, None]
        return (m, w, d)

    _, w, d = jax.lax.fori_loop(0, P, step, (app, w0, d0))
    return w, d


def _mm(a, b, tb=False):
    """Batched matmul a @ b (or a @ b^T), f32-accurate, batch on axis 0."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (2 if tb else 1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _panel_kernel(a_ref, out_ref, aw_ref, wh_ref):
    """Blocked right-looking LDL^T inverse: panel-32 scalar loops + MXU
    rank-32 trailing updates + one 96x96 Gram (VERDICT round-1 item 1;
    reference kernel SeSchwarzPreconditioner.cpp:1347-1546)."""
    g = a_ref.shape[0]
    aw_ref[:] = a_ref[:]

    w1s, diss, lblk = [], [], {}
    for p in range(3):
        lo, hi = P * p, P * (p + 1)
        app = aw_ref[:, lo:hi, lo:hi]
        w1, d = _factor32(app)
        dinv = 1.0 / d
        w1s.append(w1)
        diss.append(jax.lax.rsqrt(d))
        if p < 2:
            r = aw_ref[:, hi:, lo:hi]                                # [G,T,32]
            y = _mm(r, w1, tb=True)                                  # R @ W1^T
            l21 = y * dinv[:, None, :]
            aw_ref[:, hi:, hi:] = aw_ref[:, hi:, hi:] - _mm(l21, y, tb=True)
            for q in range(p + 1, 3):
                lblk[(q, p)] = l21[:, P * (q - p - 1) : P * (q - p), :]

    # W = L^-1 blockwise (shared recurrence; MXU matmuls here)
    from ..batched_inverse import lower_inverse_blocks

    wb = lower_inverse_blocks(w1s, lblk, _mm)

    # Wh = D^-1/2 W written into the 96x96 scratch (zeros above diagonal)
    zero = jnp.zeros((g, P, P), jnp.float32)
    for q in range(3):
        for p in range(3):
            blk = diss[q][:, :, None] * wb[(q, p)] if (q, p) in wb else zero
            wh_ref[:, P * q : P * (q + 1), P * p : P * (p + 1)] = blk

    gram = jax.lax.dot_general(
        wh_ref[:], wh_ref[:],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = 0.5 * (gram + jnp.swapaxes(gram, 1, 2))


@functools.partial(jax.jit, static_argnames=("group",))
def invert_spd_blocks_chol_panel(h96: jnp.ndarray, group: int = 32) -> jnp.ndarray:
    """[B,96,96] SPD -> [B,96,96] symmetric PSD inverses (panel kernel)."""
    b = h96.shape[0]
    pad = (-b) % group
    if pad:
        h96 = jnp.concatenate(
            [h96, jnp.broadcast_to(jnp.eye(DOF, dtype=h96.dtype), (pad, DOF, DOF))]
        )
    bp = b + pad
    out = pl.pallas_call(
        _panel_kernel,
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
            flops=2 * bp * DOF * DOF * DOF,
            bytes_accessed=8 * bp * DOF * DOF,
            transcendentals=bp * DOF,
        ),
    )(h96)
    return out[:b]


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
