"""Multilevel domain hierarchy: Morton-bank clustering, fully vectorized.

Reference pipeline (ReorderRealtime, /root/reference/SeSchwarzPreconditioner.cpp:415-445):
  BuildConnectMaskL0 (cpp:447-511)      per-warp 32-bit adjacency masks
  BuildCollisionConnection (cpp:514-563) stencil-induced extra connectivity
  PreparePrefixSumL0 (cpp:565-628)      in-warp transitive closure + leader count
  BuildLevel1 (cpp:630-740)             two-stage prefix sum -> level-1 cluster ids
  per level: BuildConnectMaskLx / NextLevelCluster / PrefixSumLx /
             ComputeNextLevel (cpp:743-1084)
  AggregationKernel (cpp:1092-1162)     per-vertex ancestor table

TPU-native re-design (no warps, no ballots, no atomics):
  * a bank's connectivity is a boolean [32,32] adjacency matrix; all banks
    batch into A[W,32,32];
  * the warp ffs/ballot closure fixpoint (cpp:600-614) becomes
    ceil(log2(32)) = 5 rounds of C |= C @ C — batched matmuls on the MXU;
  * "leader iff no earlier lane in my component" (cpp:618-623) is a
    masked any() over the strict lower triangle;
  * the emulated two-stage block prefix sums (cpp:630-740, 963-1072) are
    jnp.cumsum;
  * neighbor "Remain" list compaction (cpp:486-491) becomes a boolean
    remain mask over a fixed ELL neighbor table (static shapes under jit).

Every level has a *static* capacity (config.level_capacities), so the whole
build jits with static shapes; actual level sizes are traced values used
only in masks and index arithmetic. If clustering degenerates and a level
overflows its capacity the result carries an `overflow` flag (the reference
would silently corrupt memory in that case; its 1.5x slack, cpp:114, plays
the same role as our per-level headroom).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SchwarzConfig, ceil_to

BANK = 32
_TRIL_NP = __import__("numpy").tri(BANK, BANK, -1, dtype=bool)  # strict lower triangle


def _tril_strict() -> jnp.ndarray:
    return jnp.asarray(_TRIL_NP)


class StencilPairs(NamedTuple):
    """Cross-primitive vertex pairs of collision stencils, fine sorted space.

    Flattened over stencils x (ita, itb) combos with ita in the first
    primitive and itb in the second (cpp:534-552). `valid` masks real pairs.
    """

    a: jnp.ndarray      # i32[P]
    b: jnp.ndarray      # i32[P]
    valid: jnp.ndarray  # bool[P]


class NeighborMergeMap(NamedTuple):
    """Per ELL pair (v, k): where in the hierarchy the pair's banks merge.

    Assembly needs, for every neighbor pair, the first level whose banks
    coincide and the climbed neighbor's lane there (cpp:1282-1287). The
    builder computes exactly the per-level neighbor cluster gathers
    (`cu = take(cur_ids, nbr_idx)`) this requires — emitting the map from
    the build makes the assembly's own [N,K,L] ancestor gather redundant
    (the dominant general-path prepare cost at 1M, docs/ROADMAP.md
    bottleneck #1: three [N,K]-class gathers -> one extra top-level one).
    """

    lam: jnp.ndarray      # i32[N,K] merge level (== levels when never)
    lane_ot: jnp.ndarray  # i32[N,K] climbed-neighbor lane (%32) at merge
    ok: jnp.ndarray       # bool[N,K] pair merges within the hierarchy


class Hierarchy(NamedTuple):
    """Cluster hierarchy over the concatenated node space.

    Node ids: level l occupies [offsets[l], offsets[l] + caps[l]); a node is
    *active* if its within-level index < level_sizes[l]. going_next maps a
    node to its parent node id (sentinel = total capacity for top level /
    padded nodes); the array has one extra self-loop slot at the sentinel so
    chains can be walked with plain gathers.

    The anchored one-hot transfer operators (see restriction_operators) are
    byproducts of clustering and are carried here so the apply state and the
    in-build adjacency reductions share one construction:
      onehot[b, lc, i] = 1 iff in-bank node i of bank b belongs to the
        bank's lc-th cluster (zero rows for the top level);
      pos[p - cap0]    = flat slot offs[l] + b*32 + lc of coarse node p in
        its child level's per-bank cluster-sum layout, -1 when inactive;
      pb[b]            = smallest parent NODE id of bank b (the anchor of
        its consecutive cluster-id range), `total` when inactive.
    """

    going_next: jnp.ndarray     # i32[total+1]
    coarse_space: jnp.ndarray   # i32[L, N]: row l = within-level cluster id at level l (row 0 = identity)
    level_sizes: jnp.ndarray    # i32[L]: actual node count per level
    overflow: jnp.ndarray       # bool[]: any level exceeded its static capacity
    onehot: jnp.ndarray         # f32[total//32, 32, 32]
    pos: jnp.ndarray            # i32[total - cap0]
    pb: jnp.ndarray             # i32[total//32]


def lane_bitmask_rows(ids_col: jnp.ndarray, contrib: jnp.ndarray) -> jnp.ndarray:
    """Per-row 32-wide lane masks: out[r, j] = any slot with ids_col%32 == j.

    Pre-reduces each row's neighbor contributions into one boolean lane row
    BEFORE any scatter — scatter cost on TPU is per-entry, so collapsing
    the K axis here is the difference between N*K and N scatter entries.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, BANK), 2)
    hits = ((ids_col % BANK)[..., None] == lane) & contrib[..., None]
    return jnp.any(hits, axis=1)  # [rows, 32]


def rows_to_bank_adjacency(
    row_ids: jnp.ndarray,
    rowmask: jnp.ndarray,
    num_banks: int,
) -> jnp.ndarray:
    """Scatter-OR 32-wide lane rows into banked adjacency A[W,32,32].

    row_ids are within-level node indices (invalid -> >= num_banks*32,
    dropped). One row-scatter with a 32-lane payload per contributing row.
    """
    ids, vals = jax.lax.optimization_barrier((row_ids.reshape(-1), rowmask.reshape(-1, BANK).astype(jnp.int32)))
    acc = jnp.zeros((num_banks * BANK, BANK), jnp.int32).at[ids].add(vals, mode="drop")
    return acc.reshape(num_banks, BANK, BANK) > 0


def neighbor_warp_masks_to_adjacency(
    ids_row: jnp.ndarray,
    ids_col: jnp.ndarray,
    contrib: jnp.ndarray,
    num_banks: int,
) -> jnp.ndarray:
    """Pair-list form: scatter (row, col) pairs that share a bank into
    A[W,32,32] (used for the small collision-pair lists)."""
    if ids_row.ndim == 1:
        ids_row = ids_row[:, None]
        ids_col = ids_col[:, None]
        contrib = contrib[:, None]
    rowmask = lane_bitmask_rows(ids_col, contrib)
    row = jnp.where(jnp.any(contrib, axis=1), ids_row[:, 0], num_banks * BANK)
    return rows_to_bank_adjacency(row, rowmask, num_banks)


def transitive_closure_inbank(adj: jnp.ndarray, iters: int) -> jnp.ndarray:
    """C = closure(adj | I) per bank via repeated boolean squaring on the MXU.

    Replaces the serial ffs fixpoint of PreparePrefixSumL0 (cpp:600-614);
    reachable path length doubles per round, so `iters`=5 is exact for 32.
    """
    eye = jnp.eye(BANK, dtype=jnp.float32)
    c = jnp.maximum(adj.astype(jnp.float32), eye[None])
    for _ in range(iters):
        sq = jnp.einsum("wij,wjk->wik", c, c, preferred_element_type=jnp.float32)
        c = jnp.minimum(c + sq, 1.0)
    return c > 0.0


def _cluster_banks(
    closure: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Elect leaders and number components globally.

    closure: bool[W,32,32] in-bank component matrix, valid: bool[W,32]
    (active lanes). Returns (cluster ids i32[W*32] — valid lanes only —
    the total cluster count, and the per-bank exclusive leader prefix,
    i.e. the id of each bank's first cluster). Mirrors the elected-prefix
    rule (cpp:618-623) and two-stage prefix sums (cpp:630-740).
    """
    conn_valid = closure & valid[:, None, :] & valid[:, :, None]
    earlier = jnp.any(conn_valid & _tril_strict()[None], axis=2)  # [W,32]
    leader = valid & ~earlier
    cnt = jnp.sum(leader, axis=1, dtype=jnp.int32)                 # [W]
    bank_prefix = jnp.cumsum(cnt) - cnt                            # exclusive, [W]
    lane_prefix = jnp.cumsum(leader, axis=1, dtype=jnp.int32) - leader  # [W,32]
    # Elected lane = first member of my component (ffs of the closed mask).
    elected = jnp.argmax(conn_valid, axis=2).astype(jnp.int32)     # [W,32]
    cluster = bank_prefix[:, None] + jnp.take_along_axis(lane_prefix, elected, axis=1)
    total = jnp.sum(cnt)
    return cluster.reshape(-1), total, bank_prefix


def build_hierarchy(
    nbr_idx: jnp.ndarray,
    nbr_mask: jnp.ndarray,
    cfg: SchwarzConfig,
    pairs: Optional[StencilPairs] = None,
    with_merge_map: bool = False,
):
    """Build the full cluster hierarchy from sorted-space adjacency.

    nbr_idx/nbr_mask: ELL vertex adjacency in Morton-sorted order, self
    excluded. pairs: optional collision-stencil connectivity (the reference
    injects it at every level, cpp:421,433).

    with_merge_map=True returns (Hierarchy, NeighborMergeMap): the per-pair
    merge level / lane fall out of the `cu` gathers the build performs
    anyway (plus one top-level gather for pairs that only meet there), so
    assembly can skip its own [N,K,L] ancestor gather.
    """
    n = nbr_idx.shape[0]
    levels = cfg.num_levels(n)
    caps = cfg.level_capacities(n)
    offs = cfg.level_offsets(n)
    total = offs[-1]

    vid = jnp.arange(n, dtype=jnp.int32)
    going_next = jnp.full((total + 1,), total, jnp.int32)
    level_sizes = [jnp.asarray(n, jnp.int32)]
    coarse_rows = [vid]  # level-0 "cluster" of a vertex is itself
    overflow = jnp.asarray(False)

    # ---- level 0: in-bank adjacency over sorted vertex ids ---------------
    # Row v IS bank-slot (v//32, v%32), so the adjacency is a pure
    # pre-reduce + reshape — no scatter at all.
    w0 = caps[0] // BANK
    u = nbr_idx
    same_bank = (u // BANK == vid[:, None] // BANK) & nbr_mask
    rowmask0 = lane_bitmask_rows(u, same_bank)                     # [N,32]
    rowmask0 = jnp.zeros((caps[0], BANK), bool).at[:n].set(rowmask0)
    adj = rowmask0.reshape(w0, BANK, BANK)
    remain = nbr_mask & ~same_bank
    if with_merge_map:
        mm_lam = jnp.where(same_bank, 0, levels).astype(jnp.int32)
        mm_lane = (u % BANK).astype(jnp.int32)
    if pairs is not None:
        psame = (pairs.a // BANK == pairs.b // BANK) & (pairs.a != pairs.b) & pairs.valid
        adj = adj | neighbor_warp_masks_to_adjacency(pairs.a, pairs.b, psame, w0)
    adj = adj | jnp.swapaxes(adj, 1, 2)

    cur_ids = vid  # within-level node id of each vertex at the current level

    # Anchored one-hot transfer operators, built as clustering progresses
    # (restriction_operators recomputes the same thing from going_next for
    # standalone callers). oh_chain carries (onehot, local slot index) per
    # clustered level so fine-space lane masks can be reduced up the
    # hierarchy with streaming broadcast-reduces instead of row scatters
    # (40 ns/row on v5e: 2.6 ms per level at 65k).
    onehot_full = jnp.zeros((total // BANK, BANK, BANK), jnp.float32)
    pos_full = jnp.full((total - caps[0],), -1, jnp.int32)
    pb_full = jnp.full((total // BANK,), total, jnp.int32)
    oh_chain = []
    lc_iota = jnp.arange(BANK, dtype=jnp.int32)

    for level in range(1, levels):
        w = caps[level - 1] // BANK
        valid = (jnp.arange(w * BANK, dtype=jnp.int32) < level_sizes[-1]).reshape(w, BANK)
        closed = transitive_closure_inbank(adj, cfg.closure_iters)
        cluster, count, bank_prefix = _cluster_banks(closed, valid)  # i32[w*32]

        overflow = overflow | (count > caps[level])
        level_sizes.append(count.astype(jnp.int32))

        # goingNext for the just-clustered level (cpp:736, 1068); static
        # level begin offsets replace the reference's data-dependent ones.
        # The segment is contiguous, so this is a slice update, not a scatter.
        parents = jnp.where(valid.reshape(-1), offs[level] + jnp.minimum(cluster, caps[level] - 1), total)
        going_next = jax.lax.dynamic_update_slice(going_next, parents, (offs[level - 1],))

        # ---- anchored one-hot operator for child level `level-1` ----------
        local = cluster.reshape(w, BANK) - bank_prefix[:, None]
        oh = (valid[:, None, :] & (local[:, None, :] == lc_iota[None, :, None])).astype(jnp.float32)
        onehot_full = jax.lax.dynamic_update_slice(onehot_full, oh, (offs[level - 1] // BANK, 0, 0))
        has_valid = jnp.any(valid, axis=1)
        pb_seg = jnp.where(has_valid, offs[level] + bank_prefix, total)
        pb_full = jax.lax.dynamic_update_slice(pb_full, pb_seg, (offs[level - 1] // BANK,))
        # Invert the per-bank layout exactly as restriction_operators does:
        # anchors are node-id minima with `total` sentinels for inactive
        # (suffix) banks, so inactive coarse nodes resolve identically.
        c_node = jnp.arange(offs[level], offs[level + 1], dtype=jnp.int32)
        b_of = jnp.clip(
            jnp.searchsorted(pb_seg, c_node, side="right").astype(jnp.int32) - 1,
            0, w - 1,
        )
        local_of = c_node - pb_seg[b_of]
        okc = (local_of >= 0) & (local_of < BANK)
        slot_local = jnp.where(okc, b_of * BANK + local_of, -1)
        pos_full = jax.lax.dynamic_update_slice(
            pos_full,
            jnp.where(okc, offs[level - 1] + slot_local, -1),
            (offs[level] - caps[0],),
        )
        oh_chain.append((oh, slot_local))

        cur_ids = jnp.take(cluster, cur_ids)  # vertex -> cluster at `level`
        coarse_rows.append(cur_ids)

        if level == levels - 1:
            break

        # ---- next level's adjacency from still-unconsumed neighbors ------
        # Lane masks are computed in fine space (cu gather), then reduced
        # child->parent up the one-hot chain — pure streaming, no scatters.
        wl = caps[level] // BANK
        cv = cur_ids
        cu = jnp.take(cur_ids, nbr_idx)
        cross = (cv[:, None] // BANK == cu // BANK) & remain
        if with_merge_map:
            mm_lam = jnp.where(cross, level, mm_lam)
            mm_lane = jnp.where(cross, cu % BANK, mm_lane)
        nsame = cross & (cv[:, None] != cu)
        payload = jnp.zeros((caps[0], BANK), jnp.float32)
        payload = payload.at[:n].set(lane_bitmask_rows(cu, nsame).astype(jnp.float32))
        for ohl, slotl in oh_chain:
            red = jnp.sum(
                ohl[:, :, :, None] * payload.reshape(-1, BANK, BANK)[:, None, :, :],
                axis=2,
            )
            payload = jnp.take(
                red.reshape(-1, BANK), slotl, axis=0, mode="fill", fill_value=0.0
            )
        adj = (payload > 0.0).reshape(wl, BANK, BANK)
        remain = remain & ~cross
        if pairs is not None:
            ca = jnp.take(cur_ids, pairs.a)
            cb = jnp.take(cur_ids, pairs.b)
            psame = (ca // BANK == cb // BANK) & (ca != cb) & pairs.valid
            adj = adj | neighbor_warp_masks_to_adjacency(ca, cb, psame, wl)
        adj = adj | jnp.swapaxes(adj, 1, 2)

    hier = Hierarchy(
        going_next=going_next,
        coarse_space=jnp.stack(coarse_rows),
        level_sizes=jnp.stack(level_sizes),
        overflow=overflow,
        onehot=onehot_full,
        pos=pos_full,
        pb=pb_full,
    )
    if not with_merge_map:
        return hier
    if levels > 1:
        # pairs still unmerged may meet at the top level — the one extra
        # [N,K] gather this map costs. The ideal-shrink level count can
        # leave MORE than 32 active top clusters (degenerate graphs under
        # headroom), so compare banks for real; pairs whose top banks
        # differ never merge and drop, like the reference (cpp:1288-1291).
        cu_top = jnp.take(cur_ids, nbr_idx)
        top = remain & (cur_ids[:, None] // BANK == cu_top // BANK)
        mm_lam = jnp.where(top, levels - 1, mm_lam)
        mm_lane = jnp.where(top, cu_top % BANK, mm_lane)
    return hier, NeighborMergeMap(lam=mm_lam, lane_ot=mm_lane, ok=mm_lam < levels)


def ancestor_node_ids(h: Hierarchy, cfg: SchwarzConfig, n: int) -> jnp.ndarray:
    """coarse_tables (cpp:1092-1162): node id of each vertex's ancestor at
    levels 1..L-1, shape i32[N, L-1] (empty second dim when L == 1)."""
    offs = cfg.level_offsets(n)
    rows = [offs[l] + h.coarse_space[l] for l in range(1, h.coarse_space.shape[0])]
    if not rows:
        return jnp.zeros((n, 0), jnp.int32)
    return jnp.stack(rows, axis=1)


def restriction_operators(going_next: jnp.ndarray, cfg: SchwarzConfig, n: int):
    """One-hot transfer operators shared by apply and assembly.

    Clusters are in-bank with consecutive per-bank ids (_cluster_banks), so
    a bank's smallest parent id anchors its cluster range: local cluster
    index = parent - bank_min. Returns (onehot f32[total//32,32,32] with
    onehot[b,lc,i] = 1 iff in-bank node i belongs to the bank's lc-th
    cluster; pos i32[total-cap0] mapping each coarse node to its flat slot
    offs[l]+b*32+lc in the child level's per-bank cluster-sum layout, -1
    when inactive; pb i32[total//32] per-bank anchors, `total` when
    inactive). The compaction index inverts the per-bank layout via one
    searchsorted over the (nondecreasing) bank minima.
    """
    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    total = offs[-1]
    onehot = jnp.zeros((total // BANK, BANK, BANK), jnp.float32)
    pos = jnp.full((total - offs[1],), -1, jnp.int32)
    pbs = jnp.full((total // BANK,), total, jnp.int32)
    lc_iota = jnp.arange(BANK, dtype=jnp.int32)
    for l in range(levels - 1):
        g2 = going_next[offs[l] : offs[l + 1]].reshape(-1, BANK)   # [Bl,32]
        valid = g2 < total
        pb = jnp.min(jnp.where(valid, g2, total), axis=1)          # [Bl]
        local = jnp.clip(g2 - pb[:, None], 0, BANK - 1)
        oh = (valid[:, None, :] & (local[:, None, :] == lc_iota[None, :, None])).astype(jnp.float32)
        onehot = jax.lax.dynamic_update_slice(onehot, oh, (offs[l] // BANK, 0, 0))
        pbs = jax.lax.dynamic_update_slice(pbs, pb, (offs[l] // BANK,))
        c_node = jnp.arange(offs[l + 1], offs[l + 2], dtype=jnp.int32)
        b_of = jnp.clip(
            jnp.searchsorted(pb, c_node, side="right").astype(jnp.int32) - 1,
            0, pb.shape[0] - 1,
        )
        local_of = c_node - pb[b_of]
        okc = (local_of >= 0) & (local_of < BANK)
        p_slot = jnp.where(okc, offs[l] + b_of * BANK + local_of, -1)
        pos = jax.lax.dynamic_update_slice(pos, p_slot, (offs[l + 1] - offs[1],))
    return onehot, pos, pbs
