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


def _mm(a, b, tb=False):
    """Batched matmul a @ b (or a @ b^T) as a fused VPU broadcast-reduce.

    The panel algebra's contractions are at most 32 wide; as MXU
    dot_generals every operand pads to 128 and f32 accuracy costs a 6-pass
    bf16 decomposition — measured ~0.45 ms EACH at B=2185 regardless of
    size. The broadcast form fuses into one streaming pass, is exact f32,
    and costs ~0.1 ms.
    """
    if tb:
        return jnp.sum(a[:, :, None, :] * b[:, None, :, :], axis=3)
    return jnp.sum(a[:, :, :, None] * b[:, None, :, :], axis=2)


def _factor32(app: jnp.ndarray):
    """(W1 = L^-1 unit-lower, d) of a batch of SPD panels, in-place LDL^T.

    The elimination runs in BATCH-MINOR layout [P(row), 2P(col), B] with
    W = L^-1 maintained in the right half of an augmented carry (the same
    row operations applied to I). Batch-minor keeps the minor dimension
    lane-dense — a [B,P,P] layout pads the 32-wide minor to 128 lanes (4x
    traffic, 83 us/step measured) — and the whole carry (17.8 MB at
    B=2185) stays VMEM-resident across the fori_loop, so a step costs
    ~4-8 us. The whole batch advances together: the 32-step sequential
    chain is paid ONCE, not once per VMEM group (a Pallas in-VMEM variant
    is latency-bound at 96 steps x B/G grid steps — measured 6x slower),
    and maintaining W in-loop replaces ~10 padded batched 32x32 matmuls
    per panel (a blocked triangular inverse) that measured ~1 ms each
    panel. Pivot-row extraction is one contiguous leading-axis slice.
    """
    b, p, _ = app.shape
    sub = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)             # [P,1]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    ).astype(app.dtype)
    m0 = jnp.concatenate(
        [jnp.transpose(app, (1, 2, 0)), jnp.broadcast_to(eye[:, :, None], (p, p, b))],
        axis=1,
    )                                                                # [P,2P,B]

    def step(j, m):
        row = jax.lax.dynamic_slice_in_dim(m, j, 1, axis=0)[0]       # [2P,B]
        arow = row[:p]
        dj = jnp.sum(arow * (sub == j), axis=0, keepdims=True)       # [1,B]
        # The trailing block stays symmetric, so column j below the pivot
        # equals the pivot row right of it — no column extraction needed.
        c = (arow * (sub > j)) / dj                                  # [P,B]
        return m - c[:, None, :] * row[None, :, :]                   # rank-1

    mf = jnp.transpose(jax.lax.fori_loop(0, p, step, m0), (2, 0, 1))  # [B,P,2P]
    ii = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    d = jnp.sum(mf[:, :, :p] * (ii == jj)[None], axis=2)             # [B,P]
    return mf[:, :, p:], d


def lower_inverse_blocks(w1s, lblk, mm):
    """W = L^-1 blockwise: unit-block-lower forward substitution over the
    3x3 panel grid. Shared by the full-batch panel inverse below and the
    Pallas kernel (ops/pallas/chol_inverse._panel_kernel) — one place for
    the recurrence, parameterized over the matmul primitive."""
    wb = {(0, 0): w1s[0], (1, 1): w1s[1], (2, 2): w1s[2]}
    wb[(1, 0)] = -mm(w1s[1], mm(lblk[(1, 0)], wb[(0, 0)]))
    wb[(2, 0)] = -mm(
        w1s[2], mm(lblk[(2, 0)], wb[(0, 0)]) + mm(lblk[(2, 1)], wb[(1, 0)])
    )
    wb[(2, 1)] = -mm(w1s[2], mm(lblk[(2, 1)], wb[(1, 1)]))
    return wb


def invert_spd_blocks_panel(
    h96: jnp.ndarray, chunk_threshold: int = 4096, repair: bool = True
) -> jnp.ndarray:
    """[B,96,96] SPD -> symmetric PSD inverses, panel-32 blocked LDL^T.

    The TPU-native replacement for the reference's AVX2 in-place 96x96
    LDL^T inverse (LDLtInverse512, cpp:1347-1546): three 32-wide panel
    eliminations (full-batch fused VPU passes), MXU rank-32 trailing
    updates, a log-depth triangular-inverse, and one Gram matmul
    A^-1 = Wh^T Wh (Wh = D^-1/2 L^-1) that makes the result exactly
    symmetric and PSD by construction — the property that keeps CG valid
    on cond~1e7 stiff systems.
    """
    b = h96.shape[0]
    # Chunk so each chunk's [32,64,chunk] elimination carry stays
    # VMEM-resident (~4us/step; at 35k blocks the 287MB carry spills to
    # HBM and the 96-step chain streams it: 146ms vs ~20ms chunked at 1M).
    # The chunk size is balanced across the ceil(b/threshold) chunks instead
    # of fixed: b=2185 would otherwise pad to 4096 and invert nearly
    # 2x the blocks (measured 8.1 -> ~4.3 ms at the 65k config).
    # Threshold 4096: a 33MB carry is still VMEM-resident on v5e, and the
    # unchunked 65k config (2185 blocks) measures 3.51 ms vs 3.82 chunked;
    # at 35k blocks the 1024/2048/4096 thresholds are within session noise
    # (77/87/80 ms). chunk_threshold is an argument so unit tests can
    # exercise the chunked branch at small b (ADVICE r2).
    if b > chunk_threshold:
        nchunks = -(-b // chunk_threshold)
        chunk = -(-(-(-b // nchunks)) // 8) * 8
        # full chunks slice the input in place (a padded whole-batch copy
        # would hold an extra 1.3GB live at 1M block counts — OOM inside
        # the bench's two-prepare chain); only the remainder chunk pads.
        # The remainder is computed BEFORE the full-chunk loop: computed
        # after it (or folded into a padded uniform loop), XLA on v5e
        # miscompiled the fused assembly+invert program at 1M block
        # counts — exactly one well-conditioned block (the first of the
        # chunk processed last) came out NaN, deterministically, while
        # every pairwise composition and any program returning extra
        # slices was clean. Remainder-first sidesteps it; _repair below
        # makes any recurrence benign.
        nfull = b // chunk
        out = jnp.zeros((b, 96, 96), h96.dtype)
        rem = b - nfull * chunk
        if rem:
            tail = jnp.concatenate(
                [
                    h96[nfull * chunk :],
                    jnp.broadcast_to(
                        jnp.eye(96, dtype=h96.dtype), (chunk - rem, 96, 96)
                    ),
                ]
            )
            out = jax.lax.dynamic_update_slice_in_dim(
                out, _invert_panel_batch(tail)[:rem], nfull * chunk, axis=0
            )

        def step(i, acc):
            blk = jax.lax.dynamic_slice_in_dim(h96, i * chunk, chunk, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, _invert_panel_batch(blk), i * chunk, axis=0
            )

        out = jax.lax.fori_loop(0, nfull, step, out)
        return _repair_nonfinite(out) if repair else out
    out = _invert_panel_batch(h96)
    return _repair_nonfinite(out) if repair else out


def _repair_nonfinite(inv96: jnp.ndarray) -> jnp.ndarray:
    """Replace any non-finite block inverse with the identity.

    Defense in depth for the factorization output (same spirit as the
    reference's identity-fill of empty diagonals, cpp:1365-1367): a NaN
    block anywhere in M would silently poison the whole CG solve (the
    while_loop predicate goes False on the first NaN dot product and the
    solve "converges" instantly); an identity block merely weakens the
    preconditioner on those 32 nodes. One streaming pass over the batch.

    Observability (ADVICE r4): repair runs only on PRODUCTION prepares.
    Under debug_checks / PRECOND_DEBUG_CHECKS the solver passes
    repair=False to invert_spd_blocks_panel, so a genuine assembly or
    factorization bug reaches utils/guards.assert_healthy as non-finite
    inv96 and raises loudly instead of being silently identity-filled.
    (A device-side debug print was tried and rejected: the axon TPU
    backend does not support host callbacks at all.)
    """
    ok = jnp.all(jnp.isfinite(inv96), axis=(1, 2), keepdims=True)
    eye = jnp.eye(96, dtype=inv96.dtype)
    return jnp.where(ok, inv96, eye[None])


def _invert_panel_batch(h96: jnp.ndarray) -> jnp.ndarray:
    b = h96.shape[0]
    P, NP = 32, 3
    # Shrinking Schur complement: updating the full [B,96,96] in place
    # copies the whole (128-lane-padded) array per panel; the live
    # trailing block is all later panels need.
    s = h96
    w1s, diss, lblk = [], [], {}
    for p in range(NP):
        w1, d = _factor32(s[:, :P, :P])
        w1s.append(w1)
        diss.append(jax.lax.rsqrt(d))
        if p < NP - 1:
            r = s[:, P:, :P]                                 # [B,T,32]
            y = _mm(r, w1, tb=True)                          # R @ W1^T
            l21 = y * (1.0 / d)[:, None, :]
            s = s[:, P:, P:] - _mm(l21, y, tb=True)          # [B,T,T]
            for q in range(p + 1, NP):
                lblk[(q, p)] = l21[:, P * (q - p - 1) : P * (q - p), :]

    wb = lower_inverse_blocks(w1s, lblk, _mm)

    zero = jnp.zeros((b, P, P), jnp.float32)
    rows = []
    for q in range(NP):
        blks = [
            diss[q][:, :, None] * wb[(q, p)] if (q, p) in wb else zero
            for p in range(NP)
        ]
        rows.append(jnp.concatenate(blks, axis=2))
    wh = jnp.concatenate(rows, axis=1)                       # [B,96,96]
    gram = jax.lax.dot_general(
        wh, wh,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return 0.5 * (gram + jnp.swapaxes(gram, 1, 2))


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
