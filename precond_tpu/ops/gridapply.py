"""Static-transfer preconditioner apply for structured power-of-two grids.

With the analytic tile ordering (utils/gridmorton.py) on a connected
2^k x 2^k grid, every 32-node bank at EVERY level is one connected
cluster: a fine bank is an 8x4 grid tile (struct springs connect it) and
each coarser bank covers a contiguous rectangle of tiles (the rank bit
interleave nests dyadic rectangles). Clustering therefore assigns level-l
node j the parent j//32, i.e. going_next is an arithmetic progression and
the transfer operators need NO index arrays at all:

  restriction  (BuildResidualHierarchy, cpp:1548-1598)  = per-level
      reshape-sum over 32 lanes (+ zero-pad to the level capacity);
  prolongation (CollectFinalZ, cpp:1698-1719)           = per-level
      broadcast of the parent z (repeat by 32).

Both are pure streaming ops that fuse into the batched symv, removing the
one-hot transfer operators' 32x read amplification (~0.5 ms/iteration at
65k on v5e). The general hierarchy (ops/hierarchy.py) remains the path
for unstructured meshes and for grids with collision stencils (contact
coupling changes clustering). tests/test_gridprep.py verifies that the
general builder produces exactly this hierarchy on grid meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SchwarzConfig
from .batched_inverse import apply_block_inverse
from .hierarchy import BANK


def grid_level_sizes(n: int, cfg: SchwarzConfig) -> tuple:
    """Active node count per level: n / 32^l (exact powers of two)."""
    assert n % BANK == 0
    sizes = [n]
    for _ in range(1, cfg.num_levels(n)):
        sizes.append(max(sizes[-1] // BANK, 1))
    return tuple(sizes)


def grid_going_next(n: int, cfg: SchwarzConfig) -> jnp.ndarray:
    """The analytic hierarchy's parent map (for oracle tests / halo path)."""
    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    sizes = grid_level_sizes(n, cfg)
    total = offs[-1]
    gn = jnp.full((total + 1,), total, jnp.int32)
    for l in range(levels - 1):
        j = jnp.arange(offs[l + 1] - offs[l], dtype=jnp.int32)
        parents = jnp.where(j < sizes[l], offs[l + 1] + j // BANK, total)
        gn = gn.at[offs[l] : offs[l + 1]].set(parents)
    return gn


def analytic_hierarchy(n: int, cfg: SchwarzConfig):
    """The arithmetic hierarchy as a full Hierarchy NamedTuple.

    For ANY ordering whose banks are single connected clusters at every
    level (2-D tile grids, 3-D tile boxes — utils/gridmorton.py,
    utils/boxmorton.py), the general builder's output is exactly this;
    providing it directly lets prepare skip build_hierarchy while the
    general assembly/apply machinery runs unchanged.
    """
    from .hierarchy import Hierarchy

    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    sizes = grid_level_sizes(n, cfg)
    total = offs[-1]
    gn = grid_going_next(n, cfg)

    lc = jnp.arange(BANK, dtype=jnp.int32)
    onehot = jnp.zeros((total // BANK, BANK, BANK), jnp.float32)
    pos = jnp.full((total - offs[1],), -1, jnp.int32)
    pb = jnp.full((total // BANK,), total, jnp.int32)
    coarse_rows = [jnp.arange(n, dtype=jnp.int32)]
    for l in range(levels - 1):
        nb = (offs[l + 1] - offs[l]) // BANK
        b = jnp.arange(nb, dtype=jnp.int32)
        lane_ok = (b[:, None] * BANK + lc[None, :]) < sizes[l]     # [nb,32]
        oh = (lane_ok[:, None, :] & (lc[None, :, None] == 0)).astype(jnp.float32)
        onehot = jax.lax.dynamic_update_slice(onehot, oh, (offs[l] // BANK, 0, 0))
        pb_seg = jnp.where(b * BANK < sizes[l], offs[l + 1] + b, total)
        pb = jax.lax.dynamic_update_slice(pb, pb_seg, (offs[l] // BANK,))
        cap_next = offs[l + 2] - offs[l + 1]
        p = jnp.arange(cap_next, dtype=jnp.int32)
        pos_seg = jnp.where(p < sizes[l + 1], offs[l] + p * BANK, -1)
        pos = jax.lax.dynamic_update_slice(pos, pos_seg, (offs[l + 1] - offs[1],))
        coarse_rows.append(coarse_rows[0] // (BANK ** (l + 1)))
    return Hierarchy(
        going_next=gn,
        coarse_space=jnp.stack(coarse_rows),
        level_sizes=jnp.asarray(sizes, jnp.int32),
        overflow=jnp.asarray(False),
        onehot=onehot,
        pos=pos,
        pb=pb,
    )


def restrict_residual_grid(
    r_sorted: jnp.ndarray, cfg: SchwarzConfig, n: int
) -> jnp.ndarray:
    """f32[N,3] (tile order) -> f32[total,3]: per-level reshape-sums."""
    offs = cfg.level_offsets(n)
    levels = cfg.num_levels(n)
    parts = [r_sorted]
    cur = r_sorted
    for l in range(levels - 1):
        s = cur.reshape(-1, BANK, 3).sum(axis=1)        # [caps[l]/32, 3]
        cap_next = offs[l + 2] - offs[l + 1]
        cur = jnp.pad(s, ((0, cap_next - s.shape[0]), (0, 0)))
        parts.append(cur)
    return jnp.concatenate(parts, axis=0)


def prolong_and_collect_grid(
    mz: jnp.ndarray, cfg: SchwarzConfig, n: int
) -> jnp.ndarray:
    """Additive multi-level sum: top-down parent broadcasts. [total,3]->[N,3]."""
    offs = cfg.level_offsets(n)
    levels = cfg.num_levels(n)
    top = min(levels, cfg.max_applied_levels)
    pz = mz[offs[top - 1] : offs[top]]
    for l in range(top - 2, -1, -1):
        cur = mz[offs[l] : offs[l + 1]]
        nbanks = (offs[l + 1] - offs[l]) // BANK
        par = jnp.repeat(pz[:nbanks], BANK, axis=0)
        pz = cur + par
    return pz[:n]


# Lane-l-to-component selector: bank-flat [B,96] @ SEL sums the 32 3-vectors
# of each bank per component. With HIGHEST precision this is numerically
# equivalent to the sequential reshape-sum (exact f32 accumulation of 0/1-
# selected terms, in a backend-defined order) but avoids the [*,32,3]
# minor-dim-3 layouts entirely: measured 0.58 -> 0.37 ms/iteration composed
# into the 65k PCG loop on v5e (scripts/probe_transfers.py).
_SEL96 = None


def _sel96():
    """Cached as host numpy so each jit trace embeds it as a fresh program
    constant (a cached jnp array would also be safe — it is a concrete
    device array, not a tracer — but numpy keeps the cache backend-free)."""
    global _SEL96
    if _SEL96 is None:
        import numpy as np

        s = np.zeros((3 * BANK, 3), np.float32)
        s[np.arange(3 * BANK), np.arange(3 * BANK) % 3] = 1.0
        _SEL96 = s
    return _SEL96


def precondition_grid_cm(
    inv_cm, rs_cm: jnp.ndarray, cfg: SchwarzConfig
) -> jnp.ndarray:
    """Component-major apply: z^T = M^-1 r^T on [3, N] sorted vectors.

    The comp-major solve path (crossing via utils/gridmorton.grid_to_
    morton_cm, SpMV via gridstencil.spmv_t) carries every vector as three
    component planes. In that convention the transfers need NO selector
    matmuls and NO payload interleaves at all:

      restriction  = lane-axis reshape-sum per bank  (minor 32, native)
      prolongation = lane-axis broadcast of the parent plane

    because level l+1's bank b groups exactly the 32 consecutive level-l
    banks b*32..b*32+31 (the analytic hierarchy's arithmetic parent map).
    The symv is the batch-minor Pallas kernel, whose native [96, B] rhs is
    just the three [32, B] planes stacked on sublanes — inv_cm must be the
    comp-major-permuted PackedInverse (ops/pallas/packed_symv.pack_sym96_cm).
    Reference semantics: BuildResidualHierarchy cpp:1548-1598, SchwarzLocalXSym
    cpp:1600-1696, CollectFinalZ cpp:1698-1719.
    """
    from .pallas.packed_symv import (
        DenseInverseCM,
        PackedInverseCM,
        dense_symv_cm,
        packed_symv_cm,
    )

    assert isinstance(inv_cm, (PackedInverseCM, DenseInverseCM)), (
        "cm path needs pack_sym96_cm / dense_cm"
    )
    n = rs_cm.shape[1]
    offs = cfg.level_offsets(n)
    levels = cfg.num_levels(n)
    sizes = grid_level_sizes(n, cfg)
    # ---- restrict: per-level lane sums ----
    parts = [rs_cm.reshape(3, n // BANK, BANK)]
    cur = parts[0]
    for l in range(levels - 1):
        nbl = (sizes[l] + BANK - 1) // BANK
        vals = cur[:, :nbl].sum(axis=2)                  # (3, sizes[l+1])
        capb = (offs[l + 2] - offs[l + 1]) // BANK
        cur = jnp.pad(vals, ((0, 0), (0, capb * BANK - vals.shape[1]))).reshape(
            3, capb, BANK
        )
        parts.append(cur)
    mr = jnp.concatenate(parts, axis=1)                  # (3, Btot, 32)
    if isinstance(inv_cm, DenseInverseCM):
        z3 = dense_symv_cm(inv_cm, mr)
    else:
        z3 = packed_symv_cm(inv_cm, mr, block_b=cfg.packed_symv_block_b)
    # ---- prolong + additive collect ----
    top = min(levels, cfg.max_applied_levels)
    pz = z3[:, offs[top - 1] // BANK : offs[top] // BANK]
    for l in range(top - 2, -1, -1):
        curz = z3[:, offs[l] // BANK : offs[l + 1] // BANK]
        nb = (offs[l + 1] - offs[l]) // BANK
        vals = pz.reshape(3, -1)[:, :nb]                 # parent z per child bank
        if l == 0 and cfg.coarse_damping != 1.0:
            vals = vals * cfg.coarse_damping             # z = z0 + theta*sum z_l
        pz = curz + vals[:, :, None]
    return pz.reshape(3, -1)[:, :n]


def precondition_grid(
    inv96: jnp.ndarray, r_sorted: jnp.ndarray, cfg: SchwarzConfig
) -> jnp.ndarray:
    """z = M^-1 r in tile order, static transfers. f32[N,3] -> f32[N,3].

    Bank-flat formulation: restriction/prolongation are selector matmuls on
    [B,96] arrays (see _sel96), numerically identical to
    restrict_residual_grid / prolong_and_collect_grid (the readable spec,
    kept for oracle tests) but layout-friendly in composition.
    """
    n = r_sorted.shape[0]
    offs = cfg.level_offsets(n)
    levels = cfg.num_levels(n)
    sizes = grid_level_sizes(n, cfg)
    sel = _sel96()
    dot = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)  # noqa: E731
    # ---- restrict (reference BuildResidualHierarchy, cpp:1548-1598) ----
    parts = [r_sorted.reshape(-1, 3 * BANK)]
    cur = parts[0]
    for l in range(levels - 1):
        nbl = (sizes[l] + BANK - 1) // BANK          # active banks at level l
        vals = dot(cur[:nbl], sel)                   # [sizes[l+1], 3] bank sums
        capb = (offs[l + 2] - offs[l + 1]) // BANK
        cur = jnp.pad(vals, ((0, capb * BANK - vals.shape[0]), (0, 0))).reshape(
            capb, 3 * BANK
        )
        parts.append(cur)
    mr = jnp.concatenate(parts, axis=0)              # [Btot, 96]
    from .pallas.packed_symv import PackedInverse, PackedInverseCM, packed_symv

    assert not isinstance(inv96, PackedInverseCM), (
        "CM-packed inverse passed to the row-major apply; use precondition_grid_cm"
    )
    if isinstance(inv96, PackedInverse):
        # packed-symmetric storage (4704 floats/block, cpp:165's count):
        # halves the dominant HBM read of the iteration at large B
        z96 = packed_symv(inv96, mr, block_b=cfg.packed_symv_block_b)
    else:
        z96 = apply_block_inverse(inv96, mr)         # [Btot, 96]
    # ---- prolong + additive collect (CollectFinalZ, cpp:1698-1719) ----
    top = min(levels, cfg.max_applied_levels)
    pz = z96[offs[top - 1] // BANK : offs[top] // BANK]
    for l in range(top - 2, -1, -1):
        curz = z96[offs[l] // BANK : offs[l + 1] // BANK]
        nb = (offs[l + 1] - offs[l]) // BANK
        vals = pz.reshape(-1, 3)[:nb]                # parent z per child bank
        if l == 0 and cfg.coarse_damping != 1.0:
            vals = vals * cfg.coarse_damping         # z = z0 + theta*sum z_l
        pz = curz + dot(vals, sel.T)
    return pz.reshape(-1, 3)[:n]
