"""Preconditioner application  z = M⁻¹ r  (every PCG iteration).

Reference: Preconditioning (cpp:100-110) =
  BuildResidualHierarchy (cpp:1548-1598)  restriction: gather by sort map,
                                          then child->parent accumulation
                                          (levels >= 2 are *serial* there)
  SchwarzLocalXSym (cpp:1600-1696)        per-block symmetric matvec
  CollectFinalZ (cpp:1698-1719)           additive prolongation over at most
                                          4 levels + scatter to original ids

Here the whole thing is one jitted function: two gathers, L-1 level-wise
segment scatter-adds, a batched MXU matvec, and an L-bounded gather-sum.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SchwarzConfig
from .batched_inverse import apply_block_inverse
from .hierarchy import BANK


class ApplyState(NamedTuple):
    """Everything Preconditioning needs, produced once per prepare()."""

    sorted_to_orig: jnp.ndarray  # i32[N]
    orig_to_sorted: jnp.ndarray  # i32[N]
    going_next: jnp.ndarray      # i32[total+1]
    ancestors: jnp.ndarray       # i32[N, L-1] node ids of each vertex's ancestors
    inv96: jnp.ndarray           # f32[B,96,96] (or a packed_symv.PackedInverse)
    overflow: jnp.ndarray        # bool[]
    # Matmul-form restriction operators (see restrict_residual):
    # onehot[b, lc, i] = 1 iff in-bank node i of bank b belongs to the
    # bank's lc-th cluster; zero rows for the top level.
    restrict_onehot: jnp.ndarray  # f32[total//32, 32, 32]
    # For each coarse node p (offset by cap0): flat index offs[l] + b*32+lc
    # of its slot in the child level's per-bank cluster-sum layout; -1 for
    # padded/inactive nodes.
    restrict_pos: jnp.ndarray     # i32[total - cap0]
    # Per-bank smallest parent node id (anchor of the bank's consecutive
    # cluster-id range); `total` for fully inactive banks.
    restrict_pb: jnp.ndarray      # i32[total//32]


def restrict_residual_scatter(
    r_sorted: jnp.ndarray,
    going_next: jnp.ndarray,
    cfg: SchwarzConfig,
    n: int,
) -> jnp.ndarray:
    """Scatter-form residual restriction (oracle / halo-path form).

    Level-by-level child->parent scatter-add accumulation; inactive/padded/
    top nodes have going_next == total (sentinel) so their adds fall in a
    dump slot. Replaces the reference's serial levels>=2 loop
    (cpp:1577-1591) with L-1 parallel sweeps.
    """
    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    total = offs[-1]
    mr = jnp.zeros((total + 1, 3), r_sorted.dtype).at[:n].set(r_sorted)
    for l in range(levels - 1):
        seg = slice(offs[l], offs[l + 1])
        parents, vals = jax.lax.optimization_barrier((going_next[seg], mr[seg]))
        mr = mr.at[parents].add(vals, mode="drop")
    return mr[:total]


def restrict_residual_onehot(
    r_sorted: jnp.ndarray,
    state: "ApplyState",
    cfg: SchwarzConfig,
    n: int,
) -> jnp.ndarray:
    """Build the residual hierarchy: f32[N,3] (sorted order) -> f32[total,3].

    One-hot operator form: clusters never span a 32-node bank and a bank's
    cluster ids are consecutive (ops/hierarchy.py _cluster_banks), so each
    level's child->parent reduction is a per-bank broadcast-multiply-reduce
    against the [32,32] membership one-hot (pure VPU streaming, no scatter)
    followed by one small gather (cap_{l+1} rows) that compacts per-bank
    cluster sums into the next level's node numbering. Replaces the
    issue-rate-bound N-row scatter (40 ns/row: 1.5 ms at 65k, 11 ms at
    262k on v5e) with ops that scale at memory bandwidth.
    """
    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    cap0 = offs[1]
    parts = [jnp.zeros((cap0, 3), r_sorted.dtype).at[:n].set(r_sorted)]
    for l in range(levels - 1):
        rb = parts[l].reshape(-1, BANK, 3)
        oh = state.restrict_onehot[offs[l] // BANK : offs[l + 1] // BANK]
        part = jnp.sum(oh[:, :, :, None] * rb[:, None, :, :], axis=2)
        pos = state.restrict_pos[offs[l + 1] - cap0 : offs[l + 2] - cap0]
        vals = jnp.take(
            part.reshape(-1, 3), pos - offs[l], axis=0, mode="fill", fill_value=0.0
        )                                                  # [cap_{l+1}, 3]
        parts.append(vals)
    return jnp.concatenate(parts, axis=0)


def prolong_and_collect_gather(
    mz: jnp.ndarray,
    ancestors: jnp.ndarray,
    going_next: jnp.ndarray,
    cfg: SchwarzConfig,
    n: int,
) -> jnp.ndarray:
    """Gather-form additive prolongation (oracle / halo-path form).

    Top-down pre-sum: starting at the highest *applied* level (the reference
    caps application at 4 levels — Int4 table, h:96 — the cap is a config
    here), each node accumulates its parent's z, so the fine sum needs only
    ONE gather from the level-1 region instead of one per level
    (CollectFinalZ, cpp:1698-1719).
    """
    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    top = min(levels, cfg.max_applied_levels)  # apply levels 0..top-1
    pz = mz
    for l in range(top - 2, 0, -1):
        seg = slice(offs[l], offs[l + 1])
        parents = going_next[seg]
        pz = pz.at[seg].add(jnp.take(pz, parents, axis=0, mode="fill", fill_value=0))
    z = mz[:n]
    if top > 1:
        coarse = jnp.take(pz, ancestors[:, 0], axis=0)
        if cfg.coarse_damping != 1.0:
            coarse = coarse * cfg.coarse_damping
        z = z + coarse
    return z


def prolong_and_collect_onehot(
    mz: jnp.ndarray,
    state: "ApplyState",
    cfg: SchwarzConfig,
    n: int,
) -> jnp.ndarray:
    """Additive multi-level sum (CollectFinalZ, cpp:1698-1719), one-hot form.

    Coarse levels accumulate top-down with small gathers (≤ cap1 rows).
    The fine level — the only N-row step — avoids both the N-row ancestor
    gather AND the cap1-row slot scatter (40 ns/row issue pricing: 164 µs
    at 65k on v5e): a bank's 32 parent ids are CONSECUTIVE from its anchor
    pb[b] (ops/hierarchy._cluster_banks), so they live in ≤2 consecutive
    level-1 banks. Gather those two banks (one 2-row bank gather per fine
    bank), align by the anchor's in-bank shift r[b] with an iota-compare
    one-hot built in registers (no HBM read), and distribute to fine nodes
    with the transposed restriction one-hot:
        winshift[b,lc] = Σ_j (j == lc + r[b]) · win[b,j]
        contrib[b,i]   = Σ_lc oh[b,lc,i] · winshift[b,lc]
    — pure streaming; ~11 MB moved at 65k (vs 164 µs scatter before).
    """
    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    cap0 = offs[1]
    top = min(levels, cfg.max_applied_levels)  # apply levels 0..top-1
    pz = mz
    for l in range(top - 2, 0, -1):
        seg = slice(offs[l], offs[l + 1])
        parents = state.going_next[seg]
        pz = pz.at[seg].add(jnp.take(pz, parents, axis=0, mode="fill", fill_value=0))
    z = mz[:n]
    if top > 1:
        b0 = cap0 // BANK
        cap1 = offs[2] - cap0
        pz1 = pz[cap0 : offs[2]]                           # [cap1, 3]
        pb = state.restrict_pb[:b0] - cap0                 # level-1-local anchors
        q = jnp.clip(pb // BANK, 0, cap1 // BANK - 1)      # window start bank
        r = pb - q * BANK                                  # in-window shift, [0,32)
        # gather the two-bank windows as FLAT 96-float rows: a [.,32,3]-
        # shaped gather result gets a {3,2,1,0} layout that XLA then
        # relayout-copies (2x ~100 us/iter at 65k in the op trace)
        pzb = jnp.concatenate(
            [pz1.reshape(-1, BANK * 3), jnp.zeros((1, BANK * 3), pz1.dtype)]
        )                                                  # [cap1/32+1, 96]
        win = jnp.take(
            pzb, jnp.stack([q, q + 1], axis=1), axis=0,
            mode="fill", fill_value=0.0,
        ).reshape(b0, 2 * BANK, 3)                         # [B0, 64, 3]
        # winshift[b, lc] = win[b, lc + r[b]]: five static conditional
        # shifts by r's bits — an iota-compare one-hot against the window
        # materializes a [B0,32,64,3] product (~1 GB at 1M verts, 2.7 ms);
        # this is ~0.3 ms of streaming selects.
        for bit in (16, 8, 4, 2, 1):
            shifted = jnp.concatenate(
                [win[:, bit:, :], jnp.zeros((b0, bit, 3), win.dtype)], axis=1
            )
            win = jnp.where((r & bit)[:, None, None] > 0, shifted, win)
        winshift = win[:, :BANK, :]                        # [B0, 32, 3]
        contrib = jnp.sum(
            state.restrict_onehot[:b0][:, :, :, None] * winshift[:, :, None, :],
            axis=1,
        )                                                  # [B0, 32, 3]
        if cfg.coarse_damping != 1.0:
            contrib = contrib * cfg.coarse_damping
        z = z + contrib.reshape(-1, 3)[:n]
    return z


def restrict_residual(
    r_sorted: jnp.ndarray,
    state: "ApplyState",
    cfg: SchwarzConfig,
    n: int,
) -> jnp.ndarray:
    """Residual restriction, dispatching on cfg.use_onehot_transfer."""
    if cfg.use_onehot_transfer:
        return restrict_residual_onehot(r_sorted, state, cfg, n)
    return restrict_residual_scatter(r_sorted, state.going_next, cfg, n)


def prolong_and_collect(
    mz: jnp.ndarray,
    state: "ApplyState",
    cfg: SchwarzConfig,
    n: int,
) -> jnp.ndarray:
    """Additive prolongation, dispatching on cfg.use_onehot_transfer."""
    if cfg.use_onehot_transfer:
        return prolong_and_collect_onehot(mz, state, cfg, n)
    return prolong_and_collect_gather(mz, state.ancestors, state.going_next, cfg, n)


def precondition_sorted(
    state: ApplyState, r_sorted: jnp.ndarray, cfg: SchwarzConfig
) -> jnp.ndarray:
    """z = M⁻¹ r entirely in Morton-sorted vertex order. f32[N,3] -> f32[N,3].

    The permutes to/from original order cost two N-row gathers per PCG
    iteration; a solve that keeps x/r/p/z in sorted space (permuting b once
    before and x once after the loop) avoids them — use this entry point.
    """
    n = r_sorted.shape[0]
    mr = restrict_residual(r_sorted, state, cfg, n)
    rhs = mr.reshape(-1, 3 * BANK)                       # [B,96]
    from .pallas.packed_symv import PackedInverse, packed_symv

    if isinstance(state.inv96, PackedInverse):
        # packed-symmetric storage (the reference's 4704-float layout,
        # cpp:165): half the HBM read at block counts beyond VMEM residency
        z96 = packed_symv(state.inv96, rhs, block_b=cfg.packed_symv_block_b)
    elif cfg.use_pallas_symv:
        from .pallas.symv import batched_symv

        z96 = batched_symv(state.inv96, rhs)
    else:
        z96 = apply_block_inverse(state.inv96, rhs)
    mz = z96.reshape(-1, 3)                              # [total,3]
    return prolong_and_collect(mz, state, cfg, n)


def precondition(state: ApplyState, r: jnp.ndarray, cfg: SchwarzConfig) -> jnp.ndarray:
    """z = M⁻¹ r with r, z in original vertex order. f32[N,3] -> f32[N,3]."""
    r_sorted = jnp.take(r, state.sorted_to_orig, axis=0)
    z_sorted = precondition_sorted(state, r_sorted, cfg)
    return jnp.take(z_sorted, state.orig_to_sorted, axis=0)
