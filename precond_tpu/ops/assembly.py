"""Banked domain Hessian assembly.

Reference: PrepareHessian (cpp:1229-1345), PrepareCollisionHessian
(cpp:1201-1227), AdditionalSchwarzHessian2 (cpp:1164-1199). The banked
storage there is a 32 x totalSz table of 3x3 blocks; here it is a
[total, 288] row table — row = node, column = a*96 + lane*3 + b — chosen
so that (a) a row holds the node's three DOF-rows of its 96x96 domain
matrix and the final [B,96,96] tensor is a pure reshape, and (b) every
materialized array keeps a >=96-wide minor dimension. On this TPU any
scatter-adjacent array with a trailing (3,3) gets a (4,128)-tiled layout
that pads each block ~56x (docs/DESIGN.md §3) — the row-table layout is
what makes 1M-vertex assembly fit.

Semantics preserved exactly (see git history for the scatter-form
implementation that this replaces):
  * a pair contribution resolved at level λ lands symmetrically in that
    level's bank, and its diagonal compensation lands on the parent chain
    above λ (cpp:1184-1198, 1297-1343);
  * self diagonals (+ collision w² terms) land on the full ancestor chain;
  * pairs that never share a bank within the level budget drop
    (cpp:1288-1291);
  * empty padded diagonal blocks are identity-filled (cpp:1365-1367).

The reference's atomics / per-thread unordered_map diagonal tables become
one chunked dense row construction per level (bounded VMEM-friendly
transients); coarse-level rows are placed by anchored one-hot chain
reductions (_reduce_rows_to_level) — row scatters remain only for the
small collision-pair and coarse-additional sets.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchwarzConfig
from .blockcsr import BlockEll
from .hierarchy import BANK, Hierarchy

ROW = 3 * BANK * 3  # 288 columns per node row
# pair count above which collision placement switches to the scatter-free
# segment_place9 form (element-priced scatters dominate above this)
BIG_PAIR_THRESHOLD = 32768
_COLS = np.arange(ROW)
_YCOL = ((_COLS % 96) // 3).astype(np.int32)             # lane (other node % 32)
_CHUNK = 16384


def node_ancestor_table(going_next: jnp.ndarray, levels: int, total: int) -> jnp.ndarray:
    """ANC[x, l] = x climbed l levels (sentinel-saturating). i32[total+1, L]."""
    cols = [jnp.arange(total + 1, dtype=jnp.int32)]
    for _ in range(1, levels):
        cols.append(jnp.take(going_next, cols[-1]))
    return jnp.stack(cols, axis=1)


def common_bank_climb(
    my: jnp.ndarray,
    ot: jnp.ndarray,
    going_next: jnp.ndarray,
    levels: int,
    total: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Climb both node ids up the hierarchy until they share a bank.

    Returns (my', ot', merged); merged is False for pairs that never share
    a bank within `levels` climbs (reference skips those, cpp:1178-1179).
    """
    lam = jnp.zeros(my.shape, jnp.int32)
    for _ in range(levels):
        same = (my // BANK) == (ot // BANK)
        step = (~same) & (lam < levels)
        my = jnp.where(step, jnp.take(going_next, my), my)
        ot = jnp.where(step, jnp.take(going_next, ot), ot)
        lam = lam + step.astype(jnp.int32)
    merged = ((my // BANK) == (ot // BANK)) & (lam < levels) & (my < total)
    return my, ot, merged


def _tile288(mat9: jnp.ndarray) -> jnp.ndarray:
    """[..., 9] -> [..., 288] with component (a*3+b) at column a*96+y*3+b.

    Pure broadcast+reshape — the equivalent jnp.take along the minor axis
    lowers to a real gather (~4ns/element, measured 2s of the 65k
    assembly before this).
    """
    lead = mat9.shape[:-1]
    m33 = mat9.reshape(lead + (3, 1, 3))
    return jnp.broadcast_to(m33, lead + (3, BANK, 3)).reshape(lead + (ROW,))


def _diag_rows(mat9: jnp.ndarray, lane: jnp.ndarray) -> jnp.ndarray:
    """[M,9] blocks placed at their diagonal lane -> [M,288] row payloads."""
    ycol = jnp.asarray(_YCOL)
    return _tile288(mat9) * (lane[:, None] == ycol[None, :])


def _row_scatter(hb2: jnp.ndarray, rows: jnp.ndarray, vals: jnp.ndarray,
                 valid: jnp.ndarray, total: int) -> jnp.ndarray:
    """hb2[rows] += vals (row dumped when invalid). 288-wide payloads keep
    the scatter layout benign; the barrier stops operand fusion."""
    r = jnp.where(valid, rows, total)
    r, v = jax.lax.optimization_barrier((r.reshape(-1), vals))
    return hb2.at[r].add(v, mode="drop")


def _scalar_scatter9(flat: jnp.ndarray, ids: jnp.ndarray, mat9: jnp.ndarray,
                     valid: jnp.ndarray, size: int) -> jnp.ndarray:
    """flat[ids*9 + c] += mat9[:, c] (scalar form for small irregular sets)."""
    tgt = jnp.where(valid, ids, size)[:, None] * 9 + jnp.arange(9)[None, :]
    t, v = jax.lax.optimization_barrier((tgt.reshape(-1), mat9.reshape(-1)))
    return flat.at[t].add(v, mode="drop")


def segment_place9(ids: jnp.ndarray, mat9: jnp.ndarray, valid: jnp.ndarray,
                   size: int) -> jnp.ndarray:
    """Dense segment sum: out[m] = sum of mat9 rows with ids == m, f32[size,9].

    Scatter-free placement for large irregular sets: TPU scatter-add
    prices per ELEMENT (~11 ns — a [1M,9] row scatter costs 108 ms,
    scripts/probe_scatter_cost.py), so instead sort the rows by target
    (argsort ~1 ms/M), build per-target prefix bounds from a SCALAR
    histogram (a [P,1] scatter is 16x cheaper than [P,9]), run a
    SEGMENTED scan over the sorted payloads, and read each segment's
    total at its end position — everything else streams. ~3x cheaper
    than the direct row scatter at the collide-config's ~1M pair
    payloads, and the result is a dense array that ADDs into the banked
    table for free.

    fp note: the scan is SEGMENTED (associative_scan with a reset flag
    at each run start), NOT a global cumsum differenced at boundaries.
    The difference form's error is ABSOLUTE in the running-sum magnitude
    (~|prefix| * eps): at contact stiffness 1e4 the prefix reaches ~1e6
    and small entries (mass-scale diagonals ~3.6) absorbed +-26 of
    noise — the factorized M stalled CG at 6000+ iterations where the
    scatter build converged in 504 (measured r5). The segmented scan
    only ever adds values of the SAME segment, so per-segment accuracy
    matches the scatter form's up to association order.
    """
    p = ids.shape[0]
    tgt = jnp.where(valid, ids, size)
    order = jnp.argsort(tgt).astype(jnp.int32)
    tgt_s = jnp.take(tgt, order)
    m_s = jnp.take(mat9, order, axis=0)
    # run starts: first position of each equal-target run
    start = jnp.concatenate(
        [jnp.ones((1,), bool), tgt_s[1:] != tgt_s[:-1]]
    )

    def comb(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb[:, None], vb, va + vb), fa | fb

    seg, _ = jax.lax.associative_scan(comb, (m_s, start))
    counts = jnp.zeros((size + 1,), jnp.int32).at[tgt].add(1, mode="drop")
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[:size])]
    )
    # segment m's total sits at its END position bounds[m+1]-1; empty
    # segments would read a neighbor's total — mask them off
    segp = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), seg], axis=0)
    out = jnp.take(segp, bounds[1:], axis=0)              # [size, 9]
    return jnp.where((counts[:size] > 0)[:, None], out, 0.0)


class CollisionTerms(NamedTuple):
    """Pairwise collision contributions, fine sorted space (from stencils)."""

    pair_a: jnp.ndarray     # i32[P] first vertex (mapped)
    pair_b: jnp.ndarray     # i32[P] second vertex (mapped)
    pair_mat: jnp.ndarray   # f32[P,3,3] w_a*w_b*stiff*d d^T
    pair_valid: jnp.ndarray # bool[P]
    diag_ids: jnp.ndarray   # i32[Q] vertex (mapped) for w^2 diagonal terms
    diag_mat: jnp.ndarray   # f32[Q,3,3]
    diag_valid: jnp.ndarray # bool[Q]


def _level_rows(lane_ot, lam, ok, blk9, lane_my, dself9, level: int) -> jnp.ndarray:
    """Per-vertex 288-wide row contributions for one hierarchy level.

    Combines, for the vertex's level-`level` ancestor node:
      * off-diagonal blocks of pairs resolved exactly at `level`
        (lane_ot = climbed neighbor % 32 at its merge level);
      * chain diagonal compensation of pairs resolved below `level`
        (lane_my = own ancestor % 32), cpp:1297-1343;
      * the self diagonal (+ additional), every level, cpp:1270,1309-1321.
    Chunked by lax.map so the [C,K,288] transients stay bounded.
    """
    n, k = lam.shape
    chunk = min(_CHUNK, max(256, 1 << (n - 1).bit_length()))
    pad = (-n) % chunk
    def padded(a, fill=0):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1), constant_values=fill)

    args = (
        padded(lane_ot), padded(lam), padded(ok), padded(blk9),
        padded(lane_my), padded(dself9),
    )
    args = tuple(a.reshape((-1, chunk) + a.shape[1:]) for a in args)
    ycol = jnp.asarray(_YCOL)

    def one(chunk):
        lane_ot_c, lam_c, ok_c, blk9_c, lane_my_c, dself9_c = chunk
        # elementwise expand-then-reduce on the VPU (exact f32). An
        # einsum formulation measured equal within session noise but
        # regressed 1M-vertex memory; this form is proven at 1M.
        sel = ok_c & (lam_c == level)
        a = (lane_ot_c[..., None] == ycol) & sel[..., None]    # [C,K,288]
        if level > 0:
            sel_ch = ok_c & (lam_c < level)
            a = a | ((lane_my_c[:, None, None] == ycol) & sel_ch[..., None])
        bv = _tile288(blk9_c)                                  # [C,K,288]
        vals = jnp.sum(a.astype(jnp.float32) * bv, axis=1)     # [C,288]
        return vals + _diag_rows(dself9_c, lane_my_c)

    out = jax.lax.map(one, args)
    return out.reshape(-1, ROW)[:n]


def _reduce_rows_to_level(
    vals0: jnp.ndarray, hier: Hierarchy, cfg: SchwarzConfig, n: int, level: int
) -> jnp.ndarray:
    """Reduce fine-row payloads [n,288] to level-`level` rows [cap_l,288].

    Composes `level` anchored one-hot cluster reductions — each a per-bank
    broadcast-multiply-reduce (VPU streaming, fuses like the apply-phase
    restrict) plus a small compaction gather — reproducing the
    scatter-by-ancestor sum exactly: the one-hot chain IS repeated
    going_next. Replaces the N-row 288-wide scatter (40 ns/row issue
    pricing: ~1.9 ms/level at 65k on v5e). NOTE: an einsum/matmul form of
    the same reduction was measured 64 ms SLOWER (batched [32,32]x[32,288]
    matmuls at HIGHEST precision lower catastrophically); keep the
    broadcast form.
    """
    offs = cfg.level_offsets(n)
    cap0 = offs[1]
    part = jnp.pad(vals0, ((0, cap0 - n), (0, 0)))
    for l in range(level):
        rb = part.reshape(-1, BANK, ROW)
        oh = hier.onehot[offs[l] // BANK : offs[l + 1] // BANK]
        red = jnp.sum(oh[:, :, :, None] * rb[:, None, :, :], axis=2)  # [W,lc,ROW]
        pos_l = hier.pos[offs[l + 1] - cap0 : offs[l + 2] - cap0]
        part = jnp.take(
            red.reshape(-1, ROW), pos_l - offs[l], axis=0,
            mode="fill", fill_value=0.0,
        )
    return part


def assemble_banked_hessian(
    ell_sorted: BlockEll,
    hier: Hierarchy,
    cfg: SchwarzConfig,
    collisions: Optional[CollisionTerms] = None,
    merge_map=None,
) -> jnp.ndarray:
    """Assemble all domain Hessians -> f32[B, 96, 96] (B = total/32 blocks).

    `ell_sorted` is the system matrix permuted into Morton-sorted order.
    `merge_map` (hierarchy.NeighborMergeMap, optional): per-pair merge
    levels/lanes emitted by build_hierarchy — skips this function's
    [N,K,L] ancestor gather, the dominant general-path prepare cost at 1M.
    """
    n = ell_sorted.num_verts
    levels = cfg.num_levels(n)
    total = cfg.total_capacity(n)
    nblocks = total // BANK
    gn = hier.going_next

    # m_additionalHessian32 (cpp:168): per-node extra diagonal, flat [total*9].
    addl9 = jnp.zeros((total * 9,), jnp.float32)
    pair_rows = []  # (rows, vals[.,288], valid) from collisions

    pair_dense288 = None
    if collisions is not None:
        my_c, ot_c, merged = common_bank_climb(
            collisions.pair_a, collisions.pair_b, gn, levels, total
        )
        okc = merged & collisions.pair_valid
        pm9 = collisions.pair_mat.reshape(-1, 9)
        pmy = jnp.take(gn, jnp.minimum(my_c, total))
        pot = jnp.take(gn, jnp.minimum(ot_c, total))
        ok_up = okc & (pmy < total)
        big = int(collisions.pair_a.shape[0]) > BIG_PAIR_THRESHOLD
        if big:
            # scatter-free placement (segment_place9): at the collide
            # config's ~1M pairs the [P,288] row scatters + [9P] scalar
            # scatters below cost ~290 ms of prepare; the sorted-cumsum
            # dense form is ~3x cheaper and adds into hb2 as a stream.
            addl9 = addl9 + segment_place9(
                collisions.diag_ids, collisions.diag_mat.reshape(-1, 9),
                collisions.diag_valid, total,
            ).reshape(-1)
            # symmetric into the shared bank (cpp:1181-1182), slot space
            slots = jnp.concatenate(
                [my_c * BANK + ot_c % BANK, ot_c * BANK + my_c % BANK]
            )
            pm2 = jnp.concatenate([pm9, pm9])
            ok2 = jnp.concatenate([okc, okc])
            pair_dense = segment_place9(slots, pm2, ok2, total * BANK)
            pair_dense288 = (
                pair_dense.reshape(total, BANK, 3, 3)
                .transpose(0, 2, 1, 3)
                .reshape(total, ROW)
            )
            # parent diagonal compensation one level up (cpp:1184-1198);
            # coinciding parents receive the reference's 2x via both adds
            addl9 = addl9 + segment_place9(
                jnp.concatenate([pmy, pot]), pm2,
                jnp.concatenate([ok_up, ok_up]), total,
            ).reshape(-1)
        else:
            addl9 = _scalar_scatter9(
                addl9, collisions.diag_ids, collisions.diag_mat.reshape(-1, 9),
                collisions.diag_valid, total,
            )
            ycol = jnp.asarray(_YCOL)
            pv = _tile288(pm9)
            # symmetric into the shared bank (cpp:1181-1182)
            pair_rows.append((my_c, pv * ((ot_c % BANK)[:, None] == ycol), okc))
            pair_rows.append((ot_c, pv * ((my_c % BANK)[:, None] == ycol), okc))
            # parent diagonal compensation one level further up
            # (cpp:1184-1198); coinciding parents get 2x via the two adds.
            addl9 = _scalar_scatter9(addl9, pmy, pm9, ok_up, total)
            addl9 = _scalar_scatter9(addl9, pot, pm9, ok_up, total)

    # ---- pair merge levels (cpp:1282-1287) --------------------------------
    if merge_map is not None:
        # emitted by build_hierarchy from its own per-level cu gathers
        lam, lane_ot, ok = merge_map.lam, merge_map.lane_ot, merge_map.ok
        lane_my = [hier.coarse_space[l] % BANK for l in range(levels)]
    else:
        # analytic hierarchies (no builder run): derive from ancestor chains
        anc = node_ancestor_table(gn, levels, total)    # i32[total+1, L]
        myanc = anc[:n]                                 # [N, L]
        otanc = jnp.take(anc, ell_sorted.idx, axis=0)   # [N, K, L]
        eq = (myanc[:, None, :] // BANK) == (otanc // BANK)
        lam = jnp.argmax(eq, axis=-1).astype(jnp.int32)
        ok = jnp.any(eq, axis=-1) & ell_sorted.mask
        lane_ot = (
            jnp.take_along_axis(otanc, lam[:, :, None], axis=2)[:, :, 0] % BANK
        )
        lane_my = [myanc[:, l] % BANK for l in range(levels)]
    blk9 = ell_sorted.blocks.reshape(n, -1, 9)
    dself9 = (ell_sorted.diag + addl9[: n * 9].reshape(n, 3, 3)).reshape(n, 9)

    # ---- per-level row construction + placement --------------------------
    hb2 = jnp.zeros((total + 1, ROW), jnp.float32)
    offs = cfg.level_offsets(n)
    for l in range(levels):
        vals = _level_rows(lane_ot, lam, ok, blk9, lane_my[l], dself9, l)
        if l == 0:
            hb2 = hb2.at[:n].add(vals)  # rows ARE the fine nodes
        else:
            part = _reduce_rows_to_level(vals, hier, cfg, n, l)
            hb2 = hb2.at[offs[l] : offs[l + 1]].add(part)

    # ---- coarse-node additional, full chain (cpp:1236-1252) ---------------
    coarse_off = cfg.level_offsets(n)[1] if levels > 1 else total
    if coarse_off < total:
        # ancestor chains for the coarse segment only (O(total/32) rows)
        ccols = [jnp.arange(coarse_off, total, dtype=jnp.int32)]
        for _ in range(1, levels):
            ccols.append(jnp.take(gn, ccols[-1]))
        canc = jnp.stack(ccols, axis=1)                 # [C, L]
        cmat9 = addl9[coarse_off * 9 : total * 9].reshape(-1, 9)
        for l in range(levels):
            ids = canc[:, l]
            hb2 = _row_scatter(hb2, ids, _diag_rows(cmat9, ids % BANK), ids < total, total)

    for rows, vals, valid in pair_rows:
        hb2 = _row_scatter(hb2, rows, vals, valid, total)
    if pair_dense288 is not None:
        hb2 = hb2.at[:total].add(pair_dense288)

    # ---- identity-fill empty diagonals (cpp:1359-1377) --------------------
    node = jnp.arange(total, dtype=jnp.int32)
    d00 = jnp.take_along_axis(hb2[:total], ((node % BANK) * 3)[:, None], axis=1)[:, 0]
    empty = (d00 == 0.0).reshape(nblocks, BANK)
    h96 = hb2[:total].reshape(nblocks, 3 * BANK, 3 * BANK)  # rows ordered (x, a)
    ii = jnp.arange(3 * BANK)
    eye_mask = (ii[:, None] == ii[None, :]).astype(jnp.float32)
    fill = jnp.repeat(empty, 3, axis=1).astype(jnp.float32)  # [B,96]
    return h96 + eye_mask[None] * fill[:, :, None]
