"""High-level 3-phase preconditioner API (allocate / prepare / apply).

Mirrors the reference contract (SeSchwarzPreconditioner.h:56-63):
  AllocatePrecoditioner  -> here: static geometry from (config, N) + the
                            Morton sort maps (re-sorted on a cadence)
  PreparePreconditioner  -> prepare(): hierarchy + assembly + factorization
  Preconditioning        -> apply(): z = M⁻¹ r

Everything heavy is a jitted pure function; this class only carries static
configuration and the current device state between phases.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import SchwarzConfig
from .ops import hierarchy as hi
from .ops.apply import ApplyState, precondition
from .ops.assembly import CollisionTerms, assemble_banked_hessian
from .ops.batched_inverse import invert_spd_blocks, invert_spd_blocks_panel
from .ops.blockcsr import BlockEll, permute
from .ops.stencils import Stencils, collision_terms, stencil_pairs
from .utils import aabb, morton


class SortMaps(NamedTuple):
    sorted_to_orig: jnp.ndarray  # i32[N] (m_MapperSortedGetOriginal)
    orig_to_sorted: jnp.ndarray  # i32[N] (m_mapperOriginalGetSorted)


@functools.partial(jax.jit, static_argnames=("normalization",))
def compute_sort_maps(
    positions: jnp.ndarray, normalization: str = "isotropic"
) -> SortMaps:
    """Morton spatial sort (AllocatePrecoditioner's reorder, cpp:54-63).

    normalization="isotropic" (default) divides by the MAX AABB extent so
    the sort preserves true spatial proximity; "per_axis" reproduces the
    reference's per-axis unit-cube stretch (FillSortingData, cpp:225-231)
    which tears contact pairs apart on near-flat configurations — see
    config.SchwarzConfig.morton_normalization for the measured effect."""
    box = aabb.compute_aabb(positions)
    if normalization == "isotropic":
        e = box.upper - box.lower
        ext = jnp.max(e)
        unit = (positions - box.lower) / jnp.where(ext > 0, ext, 1.0)
    else:
        unit = aabb.to_unit_cube(positions, box)
    perm = morton.argsort_morton(unit).astype(jnp.int32)
    return SortMaps(perm, morton.inverse_permutation(perm))


def _factorize(h96: jnp.ndarray, cfg: SchwarzConfig, n: int, allow_cm: bool = False):
    """Batched 96x96 SPD factorization tail shared by the static prepares.

    Returns dense [B,96,96] inverses (inverse_dtype), or — when
    cfg.use_packed_symv(n) — the packed-symmetric PackedInverse form
    (4704 floats/block, the reference's LDLtInverse512 packed count,
    cpp:165,1349) that ops/gridapply.precondition_grid applies with the
    Pallas two-sided symv at half the HBM traffic.
    """
    if cfg.solve_layout == "cm" and not allow_cm:
        # trace-time diagnostic: a forced cm layout on a path that cannot
        # honor it (box/general/GSPMD prepares, <32x32 grids) would
        # otherwise silently downgrade to row-major (ADVICE r4)
        import warnings

        warnings.warn(
            "solve_layout='cm' was forced but this prepare path pins the "
            "row-major layout (only >=32x32 2-D grid prepares honor cm); "
            "proceeding row-major"
        )
    debug = bool(cfg.debug_checks or os.environ.get("PRECOND_DEBUG_CHECKS"))
    if cfg.inverse_kernel == "pallas" and jax.default_backend() != "cpu":
        from .ops.pallas.chol_inverse import invert_spd_blocks_chol

        inv96 = invert_spd_blocks_chol(h96, group=cfg.pallas_inverse_group)
    elif cfg.inverse_kernel == "xla":
        inv96 = invert_spd_blocks(h96)
    else:
        # debug mode disables the silent identity repair so a genuine
        # factorization bug reaches assert_healthy as non-finite inv96
        inv96 = invert_spd_blocks_panel(h96, repair=not debug)
    if cfg.use_packed_symv(n):
        from .ops.pallas.packed_symv import pack_sym96, pack_sym96_cm

        # The barrier pins the inverse before the packing transpose: fused
        # into the full prepare program (assembly + chunked panel inverse +
        # pack), XLA's reorganization produced non-finite packed output at
        # 1M-vertex block counts on v5e — each pairwise composition is
        # clean, only the triple fuses wrong. Isolating the pack restores
        # the staged (verified-finite) behavior at ~3 ms cost.
        inv96 = jax.lax.optimization_barrier(inv96)
        if allow_cm and cfg.use_cm(n):
            # component-major DOF convention for the comp-major solve
            # path (ops/gridapply.precondition_grid_cm)
            return pack_sym96_cm(inv96, block_b=cfg.packed_symv_block_b)
        return pack_sym96(inv96, block_b=cfg.packed_symv_block_b)
    if allow_cm and cfg.use_cm(n):
        # forced comp-major below the packed threshold: dense comp-plane
        # table (stays VMEM-resident where Pallas would re-stream HBM)
        from .ops.pallas.packed_symv import dense_cm

        return dense_cm(inv96.astype(jnp.dtype(cfg.inverse_dtype)))
    return inv96.astype(jnp.dtype(cfg.inverse_dtype))


@functools.partial(jax.jit, static_argnames=("offsets", "dims", "cfg"))
def prepare_box(
    diag_rows: jnp.ndarray,   # f32[N,3,3] box (row-major) vertex order
    dirs_rows: jnp.ndarray,   # f32[D,N,3,3] box order
    offsets,                  # static tuple of (di, dj, dk)
    dims,                     # static (nx, ny, nz)
    cfg: SchwarzConfig,
    stencils: Optional[Stencils] = None,  # ORIGINAL (box) vertex ids
    o2s: Optional[jnp.ndarray] = None,    # box->tile map (required w/ stencils)
) -> jnp.ndarray:
    """3-D twin of prepare_grid for tet boxes: static assembly over the
    analytic box ordering (utils/boxmorton.py) + factorization -> inv96.
    Apply with ops.gridapply.precondition_grid on box_to_morton vectors.

    Collision stencils ride the same static hierarchy as on 2-D grids
    (every box bank is one fully-merged cluster, so contact connectivity
    is absorbed); their Hessian terms enter via arithmetic climbs."""
    from .ops.gridassembly import assemble_box_hessian

    terms = None
    if stencils is not None:
        assert o2s is not None, "pass the box->tile map with stencils"
        n = diag_rows.shape[0]
        mapped = stencils._replace(
            idx=jnp.where(
                stencils.valid[:, None] & (jnp.arange(5) < stencils.nverts[:, None]),
                jnp.take(o2s, jnp.clip(stencils.idx, 0, n - 1)),
                0,
            )
        )
        terms = collision_terms(mapped)
    h96 = assemble_box_hessian(diag_rows, dirs_rows, offsets, dims, cfg, terms)
    return _factorize(h96, cfg, diag_rows.shape[0])


@functools.partial(jax.jit, static_argnames=("cfg", "analytic_hier"))
def prepare_with_system(
    ell: BlockEll,
    maps: SortMaps,
    cfg: SchwarzConfig,
    stencils: Optional[Stencils] = None,
    analytic_hier: bool = False,
):
    """prepare_preconditioner that also returns the Morton-sorted system.

    Returns (ApplyState, BlockEll): the sorted ELL is the matrix PCG should
    iterate on — solving P H Pᵀ (P x) = P b in sorted space drops the two
    N-row permutes per iteration that `precondition` pays, and the SpMV
    gathers become spatially local (Morton neighbors are nearby rows).
    """
    n = ell.num_verts
    ell_sorted = permute(ell, maps.sorted_to_orig, maps.orig_to_sorted)

    pairs = None
    terms = None
    if stencils is not None:
        mapped = stencils._replace(
            idx=jnp.where(
                stencils.valid[:, None] & (jnp.arange(5) < stencils.nverts[:, None]),
                jnp.take(maps.orig_to_sorted, jnp.clip(stencils.idx, 0, n - 1)),
                0,
            )
        )
        pairs = stencil_pairs(mapped)
        terms = collision_terms(mapped)

    if analytic_hier:
        # The caller's ordering guarantees single-cluster banks at every
        # level (analytic 2-D tile / 3-D box orderings) — the hierarchy is
        # arithmetic and clustering is invariant to stencil connectivity,
        # so skip the builder entirely (ops/gridapply.analytic_hierarchy).
        from .ops.gridapply import analytic_hierarchy

        hier = analytic_hierarchy(n, cfg)
        merge_map = None
    else:
        hier, merge_map = hi.build_hierarchy(
            ell_sorted.idx, ell_sorted.mask, cfg, pairs, with_merge_map=True
        )
    # The anchored one-hot transfer operators fall out of clustering
    # (hi.restriction_operators rederives the same from going_next).
    onehot, pos, pbs = hier.onehot, hier.pos, hier.pb
    h96 = assemble_banked_hessian(ell_sorted, hier, cfg, terms, merge_map=merge_map)
    inv96 = _factorize(h96, cfg, n)
    state = ApplyState(
        sorted_to_orig=maps.sorted_to_orig,
        orig_to_sorted=maps.orig_to_sorted,
        going_next=hier.going_next,
        ancestors=hi.ancestor_node_ids(hier, cfg, n),
        inv96=inv96,
        overflow=hier.overflow,
        restrict_onehot=onehot,
        restrict_pos=pos,
        restrict_pb=pbs,
    )
    return state, ell_sorted


# Back-compat alias; the implementation lives in ops/hierarchy.py so both
# the apply state and the assembly reduction share one operator build.
_restriction_operators = hi.restriction_operators


@functools.partial(jax.jit, static_argnames=("offsets", "k", "cfg"))
def prepare_grid(
    diag_rows: jnp.ndarray,   # f32[N,3,3] grid vertex order
    dirs_rows: jnp.ndarray,   # f32[D,N,3,3] grid order
    offsets,                  # static tuple of (di, dj)
    k: int,
    cfg: SchwarzConfig,
    stencils: Optional[Stencils] = None,  # ORIGINAL (grid) vertex ids
    o2s: Optional[jnp.ndarray] = None,    # grid->tile map (required w/ stencils)
) -> jnp.ndarray:
    """Structured-grid prepare: static assembly + factorization -> inv96.

    For tile-ordered power-of-two grids the hierarchy is arithmetic
    (ops/gridapply.py) and assembly is scatter-free static placement
    (ops/gridassembly.py), so prepare needs no Morton sort, no ELL
    permutation, and no hierarchy build — the whole phase is the banked
    assembly plus the panel LDLᵀ inverse. Apply with
    ops.gridapply.precondition_grid.

    Collision stencils do NOT change clustering here (every grid bank is
    already one fully-merged cluster, so extra connectivity is absorbed —
    tests/test_gridprep.py), so contacts ride the same static hierarchy:
    their Hessian terms are added by arithmetic climbs
    (ops/gridassembly.grid_collision_terms).
    """
    from .ops.gridassembly import assemble_grid_hessian

    terms = None
    if stencils is not None:
        assert o2s is not None, "pass the grid->tile map with stencils"
        n = diag_rows.shape[0]
        mapped = stencils._replace(
            idx=jnp.where(
                stencils.valid[:, None] & (jnp.arange(5) < stencils.nverts[:, None]),
                jnp.take(o2s, jnp.clip(stencils.idx, 0, n - 1)),
                0,
            )
        )
        terms = collision_terms(mapped)
    h96 = assemble_grid_hessian(diag_rows, dirs_rows, offsets, k, cfg, terms)
    # allow_cm: the 2-D grid path has comp-major crossings (utils/gridmorton
    # grid_to_morton_cm; they need >= 32x32 grids), so cfg.use_cm may select
    # the comp-major-packed inverse here; the box path keeps row-major until
    # boxmorton grows a comp-major crossing.
    return _factorize(h96, cfg, diag_rows.shape[0], allow_cm=k >= 5)


@functools.partial(jax.jit, static_argnames=("cfg",))
def prepare_preconditioner(
    ell: BlockEll,
    maps: SortMaps,
    cfg: SchwarzConfig,
    stencils: Optional[Stencils] = None,
) -> ApplyState:
    """Build hierarchy, assemble banked Hessians, factorize. Fully jitted.

    `ell` is the system matrix in ORIGINAL vertex order; the vertex
    adjacency the reference takes separately (m_neighbours, h:51) is read
    off the same ELL sparsity, which keeps the two always consistent.
    """
    return prepare_with_system(ell, maps, cfg, stencils)[0]


class SchwarzPreconditioner:
    """Stateful convenience wrapper over the functional phases."""

    #: retries of prepare() with doubled level_headroom on capacity overflow
    MAX_OVERFLOW_RETRIES = 4

    def __init__(self, cfg: SchwarzConfig = SchwarzConfig()):
        self.cfg = cfg
        # cfg actually used to build the current state; grows level_headroom
        # on overflow recovery. apply() must use this one (level offsets!).
        self.cfg_effective = cfg
        self.frame_index = 0
        self.maps: Optional[SortMaps] = None
        self.state: Optional[ApplyState] = None

    def allocate(self, positions: jnp.ndarray) -> None:
        """Per-frame entry; re-sorts space on the configured cadence
        (reference: every 17th frame, cpp:49)."""
        if self.maps is None or self.frame_index % self.cfg.resort_every == 0:
            self.maps = compute_sort_maps(
                jnp.asarray(positions), self.cfg.morton_normalization
            )
        self.frame_index += 1

    def prepare(self, ell: BlockEll, stencils: Optional[Stencils] = None) -> None:
        """Hierarchy + assembly + factorization, with overflow recovery.

        If clustering exceeds a level's static capacity the builder clamps
        cluster ids and raises `state.overflow` (ops/hierarchy.py); silently
        solving with a clamped hierarchy would misroute Hessian blocks, so
        rebuild with doubled level_headroom until it fits (the reference
        cannot hit this: its levels are sized after counting, cpp:1028-1032,
        at the price of data-dependent shapes)."""
        assert self.maps is not None, "call allocate() first"
        import dataclasses
        import warnings

        cfg = self.cfg_effective
        debug = self.cfg.debug_checks or os.environ.get("PRECOND_DEBUG_CHECKS")
        if debug:
            from .utils.guards import assert_system_finite

            assert_system_finite(ell)
        for _ in range(self.MAX_OVERFLOW_RETRIES + 1):
            state = prepare_preconditioner(ell, self.maps, cfg, stencils)
            if not bool(state.overflow):
                break
            grown = dataclasses.replace(cfg, level_headroom=cfg.level_headroom * 2.0)
            warnings.warn(
                "hierarchy level capacity overflow; rebuilding with "
                f"level_headroom={grown.level_headroom} (was {cfg.level_headroom})"
            )
            cfg = grown
        self.cfg_effective = cfg
        self.state = state
        if debug:
            from .utils.guards import assert_healthy

            assert_healthy(state)

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        assert self.state is not None, "call prepare() first"
        return precondition(self.state, jnp.asarray(r), self.cfg_effective)
