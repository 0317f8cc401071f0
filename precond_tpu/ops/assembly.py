"""Banked domain Hessian assembly.

Reference: PrepareHessian (cpp:1229-1345), PrepareCollisionHessian
(cpp:1201-1227), AdditionalSchwarzHessian2 (cpp:1164-1199). The banked
storage there is a 32 x totalSz table of 3x3 blocks with
    H[block, x, y] == m_hessian32[y][block*32 + x]
(see LDLtInverse512's gather, cpp:1359-1377); here it is a dense
f32[total*32, 3, 3] scatter target, viewed as [B, 32, 32, 3, 3]: the flat
slot of pair (my, ot) in my's bank is simply my*32 + ot%32.

The reference's atomics / per-thread unordered_map diagonal tables
(cpp:1255-1343) become deterministic jnp scatter-adds; the "climb both ids
up goingNext until they share a bank" walk (cpp:1171-1176, 1282-1287) is a
statically-unrolled vectorized gather loop.

Semantics preserved exactly:
  * a pair contribution resolved at level λ lands symmetrically in that
    level's bank, and its diagonal compensation lands on the *parent chain*
    starting one level above λ (cpp:1184-1198 for collisions; the
    oldDiagonal/diagTable plumbing cpp:1297-1343 for CSR terms);
  * self diagonals (+ collision w² terms) land on the full ancestor chain;
  * pairs that never share a bank within the level budget are dropped
    (cpp:1288-1291);
  * empty padded diagonal blocks are identity-filled so every 96x96 block
    stays SPD (cpp:1365-1367).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SchwarzConfig
from .blockcsr import BlockEll
from .hierarchy import BANK, Hierarchy

_EYE3 = jnp.eye(3, dtype=jnp.float32)


def node_ancestor_table(going_next: jnp.ndarray, levels: int, total: int) -> jnp.ndarray:
    """ANC[x, l] = x climbed l levels (sentinel-saturating). i32[total+1, L].

    Precomputing ancestor chains turns the per-pair climb (cpp:1282-1287)
    into cheap in-row arithmetic: large [N,K] tables of neighbor ancestors
    come from one row gather over the table instead of per-level gathers.
    """
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

    Returns (my', ot', merged) where merged is False for pairs that never
    share a bank within `levels` climbs (reference skips those,
    cpp:1178-1179, 1288-1291). Ids climb in lockstep so both are always at
    the same level.
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


def _scatter_blocks(acc: jnp.ndarray, flat_idx: jnp.ndarray, mats: jnp.ndarray,
                    valid: jnp.ndarray, oob: int) -> jnp.ndarray:
    """acc[flat_idx] += mats where valid (dropped otherwise). acc: [M,3,3].

    The optimization barrier keeps XLA from fusing the index/value
    computation into the scatter (a ~900x serialization on TPU; see
    blockcsr.scatter_accumulate). Values are barriered as a FLAT vector:
    a [M,3,3]-shaped barrier copy gets a (4,128)-tiled layout that pads
    every block ~56x and OOMs at 1M vertices.
    """
    idx = jnp.where(valid, flat_idx, oob)
    idx, mats_flat = jax.lax.optimization_barrier((idx.reshape(-1), mats.reshape(-1)))
    return acc.at[idx].add(mats_flat.reshape(-1, 3, 3), mode="drop")


def _chain_scatter_diag(
    hb: jnp.ndarray,
    base_ids: jnp.ndarray,
    mats: jnp.ndarray,
    valid: jnp.ndarray,
    going_next: jnp.ndarray,
    levels: int,
    total: int,
) -> jnp.ndarray:
    """Add `mats` to the bank diagonal of base_ids and every ancestor.

    Implements the reference's diagonal push-up: the coarse-node loop
    cpp:1236-1252, the oldDiagonal handoff cpp:1297-1321 and the diagTable
    flush cpp:1326-1343 all reduce to "add at node, then at each ancestor".
    """
    ids = base_ids
    for _ in range(levels):
        ok = valid & (ids < total)
        hb = _scatter_blocks(hb, ids * BANK + ids % BANK, mats, ok, total * BANK)
        ids = jnp.take(going_next, jnp.minimum(ids, total))
    return hb


class CollisionTerms(NamedTuple):
    """Pairwise collision contributions, fine sorted space (from stencils)."""

    pair_a: jnp.ndarray     # i32[P] first vertex (mapped)
    pair_b: jnp.ndarray     # i32[P] second vertex (mapped)
    pair_mat: jnp.ndarray   # f32[P,3,3] w_a*w_b*stiff*d d^T
    pair_valid: jnp.ndarray # bool[P]
    diag_ids: jnp.ndarray   # i32[Q] vertex (mapped) for w^2 diagonal terms
    diag_mat: jnp.ndarray   # f32[Q,3,3]
    diag_valid: jnp.ndarray # bool[Q]


def assemble_banked_hessian(
    ell_sorted: BlockEll,
    hier: Hierarchy,
    cfg: SchwarzConfig,
    collisions: Optional[CollisionTerms] = None,
) -> jnp.ndarray:
    """Assemble all domain Hessians -> f32[B, 96, 96] (B = total/32 blocks).

    `ell_sorted` is the system matrix permuted into Morton-sorted order.
    """
    n = ell_sorted.num_verts
    levels = cfg.num_levels(n)
    total = cfg.total_capacity(n)
    nblocks = total // BANK
    gn = hier.going_next

    # m_additionalHessian32 (cpp:168): per-node extra diagonal from collisions.
    addl = jnp.zeros((total, 3, 3), jnp.float32)
    anc = node_ancestor_table(gn, levels, total)  # i32[total+1, L]

    # Level-0 contributions (the vast majority) are built DENSELY: row v of
    # the banked store is bank slot (v//32, v%32), so its in-bank couplings
    # assemble with a one-hot contraction over the ELL slots — no scatter.
    # Only cross-bank (lam >= 1) and coarse-chain terms scatter, and those
    # are pre-reduced to one entry per (vertex, level) first.
    slots, mats, valids = [], [], []

    def emit(flat_idx, mat, valid):
        slots.append(flat_idx.reshape(-1))
        mats.append(mat.reshape(-1, 3, 3))
        valids.append(valid.reshape(-1))

    # ---- collisions first (PrepareCollisionHessian, cpp:1201-1227) -------
    if collisions is not None:
        addl = _scatter_blocks(
            addl, collisions.diag_ids, collisions.diag_mat, collisions.diag_valid, total
        )
        my, ot, merged = common_bank_climb(
            collisions.pair_a, collisions.pair_b, gn, levels, total
        )
        ok = merged & collisions.pair_valid
        # symmetric into the shared bank (cpp:1181-1182)
        emit(my * BANK + ot % BANK, collisions.pair_mat, ok)
        emit(ot * BANK + my % BANK, collisions.pair_mat, ok)
        # parent diagonal compensation one level further up (cpp:1184-1198);
        # when parents coincide the two adds give the reference's 2x.
        pmy = jnp.take(gn, jnp.minimum(my, total))
        pot = jnp.take(gn, jnp.minimum(ot, total))
        ok_up = ok & (pmy < total)
        addl = _scatter_blocks(addl, jnp.concatenate([pmy, pot]),
                               jnp.concatenate([collisions.pair_mat] * 2),
                               jnp.concatenate([ok_up, ok_up]), total)

    # ---- CSR off-diagonals (PrepareHessian, cpp:1262-1307) ----------------
    # The per-pair climb is resolved against precomputed ancestor chains
    # (one row gather replaces the levels x [N,K] gather loop of the naive
    # climb).
    myanc = anc[:n]                                     # [N, L] (contiguous slice)
    otanc = jnp.take(anc, ell_sorted.idx, axis=0)       # [N, K, L]
    eq = (myanc[:, None, :] // BANK) == (otanc // BANK)  # [N, K, L]
    lam = jnp.argmax(eq, axis=-1).astype(jnp.int32)      # first common-bank level
    ok = jnp.any(eq, axis=-1) & ell_sorted.mask          # unresolved pairs drop (cpp:1288-1291)
    my = jnp.take_along_axis(jnp.broadcast_to(myanc[:, None, :], otanc.shape), lam[..., None], -1)[..., 0]
    ot = jnp.take_along_axis(otanc, lam[..., None], -1)[..., 0]
    # level-0 resolved pairs: dense per-row construction (row v -> slot
    # (v//32, v%32); column lane = neighbor % 32). One batched contraction.
    sel0 = (ok & (lam == 0)).astype(jnp.float32)
    lane_oh = (ell_sorted.idx % BANK)[..., None] == jnp.arange(BANK)[None, None, :]
    oh0 = lane_oh.astype(jnp.float32) * sel0[..., None]                 # [N,K,32]
    fine = jnp.einsum("nkj,nkab->njab", oh0, ell_sorted.blocks)          # [N,32,3,3]
    emit(my * BANK + ot % BANK, ell_sorted.blocks, ok & (lam > 0))
    # each resolved pair compensates the diagonal chain from one level above
    # its merge level (oldDiagonal for level 0, diagTable for deeper levels,
    # cpp:1297-1343). All of row v's level-l chain targets are the same node
    # (myanc[v,l]), so contributions pre-reduce over K — one [N] scatter
    # entry per level instead of [N,K] (scatter entries cost ~10x a gather
    # row on TPU; entry count is the knob).
    for l in range(1, levels):
        sel = (ok & (lam < l)).astype(ell_sorted.blocks.dtype)
        mat_l = jnp.einsum("nk,nkab->nab", sel, ell_sorted.blocks)
        ids = myanc[:, l]
        emit(ids * BANK + ids % BANK, mat_l, ids < total)

    # ---- self diagonals + fine additional, full chain (cpp:1270-1271,1309-1321)
    dself = ell_sorted.diag + addl[:n]
    self_oh = (jnp.arange(n, dtype=jnp.int32) % BANK)[:, None] == jnp.arange(BANK)[None, :]
    fine = fine + self_oh[..., None, None].astype(jnp.float32) * dself[:, None]
    for l in range(1, levels):
        ids = myanc[:, l]
        emit(ids * BANK + ids % BANK, dself, ids < total)

    # ---- coarse-node additional, full chain (cpp:1236-1252) ---------------
    coarse_off = cfg.level_offsets(n)[1] if levels > 1 else total
    if coarse_off < total:
        canc = anc[coarse_off:total]                    # [C, L]
        cmat = addl[coarse_off:]
        for l in range(levels):
            ids = canc[:, l]
            emit(ids * BANK + ids % BANK, cmat, ids < total)

    # assemble: dense fine region + separate (small) scatters for the rest.
    # Scatter payloads are never concatenated — a materialized [M,3,3]
    # concat picks a (4,128)-tiled layout that pads each block ~56x (it
    # OOM'd the chip at 1M vertices).
    hb = jnp.concatenate([
        fine.reshape(n * BANK, 3, 3),
        jnp.zeros(((total - n) * BANK, 3, 3), jnp.float32),
    ])
    for s, m, v in zip(slots, mats, valids):
        hb = _scatter_blocks(hb, s, m, v, total * BANK)

    # ---- to dense blocks, identity-fill empty diagonals (cpp:1359-1377) ---
    blocks = hb.reshape(nblocks, BANK, BANK, 3, 3)
    node = jnp.arange(BANK)
    diag = blocks[:, node, node]                       # [B,32,3,3]
    empty = diag[..., 0, 0] == 0.0                     # [B,32]
    diag = jnp.where(empty[..., None, None], _EYE3, diag)
    blocks = blocks.at[:, node, node].set(diag)
    # [B,32,32,3,3] -> [B,96,96] with (node, dof) row ordering
    return blocks.transpose(0, 1, 3, 2, 4).reshape(nblocks, 3 * BANK, 3 * BANK)
