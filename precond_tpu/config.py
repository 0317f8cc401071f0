"""Solver configuration.

The reference hard-codes all of these as compile-time constants:
  - bank (domain) size 32        -> /root/reference/SeSchwarzPreconditioner.cpp:139
  - 32x coarsening per level     -> cpp:124-131
  - over-allocation ratio 1.5    -> cpp:114
  - applied-hierarchy cap of 4   -> SeSchwarzPreconditioner.h:96, cpp:1710
  - spatial re-sort cadence 17   -> cpp:49
  - collision stencil budget 32/vertex -> cpp:187-188

Here they are a frozen dataclass so meshes / dtypes / headroom are tunable.
All shapes derived from a config are static under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


def ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class SchwarzConfig:
    """Static configuration of the multilevel additive Schwarz preconditioner."""

    # Domain (bank) width: nodes per dense sub-block. 32 maps a reference GPU
    # warp; it also keeps the dense block at 96x96 (=32*3 DOF).
    bank_size: int = 32

    # Target coarsening factor between levels (reference: 32, cpp:124-131).
    coarsen_factor: int = 32

    # Static per-level capacity headroom over the ideal size/coarsen_factor
    # shrink. The reference over-allocates 1.5x globally (cpp:114); we give
    # each level its own static capacity so every shape is jit-static.
    level_headroom: float = 2.0

    # Additive apply uses at most this many levels (reference: Int4 coarse
    # table caps it at 4, cpp:1708-1717).
    max_applied_levels: int = 4

    # Morton re-sort cadence in frames (reference: every 17th, cpp:49).
    resort_every: int = 17

    # Collision stencil budget per vertex (reference: 32, cpp:187-188).
    max_collision_per_vert: int = 32

    # Iterations of mask |= reachable-or used for the in-bank transitive
    # closure. Reachable set doubles per iteration, so ceil(log2(bank)) is
    # exact for a 32-wide bank (reference iterates a serial ffs loop,
    # cpp:600-614; we square a boolean adjacency matrix on the MXU).
    closure_iters: int = 5

    # Batched 96x96 factorization kernel:
    #   "panel"  — full-batch panel-32 blocked LDL^T + Gram
    #              (ops/batched_inverse.invert_spd_blocks_panel): batch-minor
    #              VMEM-resident elimination loops, VPU contraction updates,
    #              one MXU Gram. 3.8 ms at 2185 blocks on v5e — 8.3x the XLA
    #              cholesky path, 3.4x the Pallas kernel (which is
    #              latency-bound at 96 steps x B/G grid steps). Pure jnp, so
    #              it is also the CPU default.
    #   "pallas" — VMEM-resident per-group Pallas LDL^T kernel
    #              (ops/pallas/chol_inverse.py); kept as an A/B alternate.
    #              Falls back to "panel" on CPU backends.
    #   "xla"    — jnp.linalg.cholesky + triangular solves (oracle).
    inverse_kernel: str = "panel"
    # Blocks factorized per Pallas grid step (VMEM holds 2 scratch copies;
    # 32 measured best on v5e, 64 exceeds VMEM and fails to compile).
    pallas_inverse_group: int = 32
    # Pallas symv for the apply phase (off: the XLA batched einsum already
    # streams inv96 at memory speed; kept as an A/B hook).
    use_pallas_symv: bool = False

    # Apply-phase inverse storage + symv kernel:
    #   "dense"  — explicit [B,96,96] inverses, one XLA batched einsum. At
    #              small B the whole table stays VMEM-resident across PCG
    #              iterations (75 MB at 65k verts on a 128 MB-VMEM v5e:
    #              0.068 ms/iter traced) — unbeatable there.
    #   "packed" — 4704 floats/block (the reference's packed count,
    #              cpp:165): batch-minor triangular packing + a Pallas
    #              two-sided symv that reads each element once and uses it
    #              for both A[i,j] and A[j,i] (ops/pallas/packed_symv.py).
    #              Measured 0.83 ms/iter at 33.8k blocks on v5e (799 GB/s,
    #              HBM roofline) vs 3.5 ms dense — for tables too big to
    #              stay VMEM-resident. Implies float32 inverse storage.
    #   "auto"   — packed iff num_blocks(n) >= packed_symv_min_blocks
    #              (default: the point where the dense table outgrows VMEM)
    #              and inverse_dtype is float32.
    # Applies to the static grid/box paths (prepare_grid/prepare_box).
    # The GSPMD sharded paths force dense (XLA cannot partition a
    # pallas_call); the shard_map halo path may pass packed explicitly.
    symv_kernel: str = "auto"
    packed_symv_min_blocks: int = 4096
    packed_symv_block_b: int = 256

    def use_packed_symv(self, num_verts: int) -> bool:
        if self.symv_kernel == "dense" or self.inverse_dtype != "float32":
            return False
        if self.symv_kernel == "packed":
            return True
        return self.num_blocks(num_verts) >= self.packed_symv_min_blocks

    # Component-major solve layout for the static 2-D grid path: carries
    # are [3,N] planes, SpMV is gridstencil.spmv_t, crossings are the
    # MXU-oriented patch factorization (utils/gridmorton.grid_to_morton_cm)
    # and the apply is ops/gridapply.precondition_grid_cm on a comp-major
    # inverse — packed (Pallas symv) above packed_symv_min_blocks, dense
    # batch-minor einsum below. Measured on v5e: 8.53 -> 5.07 ms/iter at
    # 1M, 0.435 -> 0.194 ms/iter at 65k (scripts/probe_crossing_fix.py,
    # BENCH_LAYOUT A/B): the row-major crossings' composed carry-relayout
    # penalty is the whole difference.
    #   "auto" — comp-major wherever the path supports it (2-D grid
    #            prepares, >= 32x32; the GSPMD/box/general paths pin rows)
    #   "cm" / "rows" — force
    solve_layout: str = "auto"

    def use_cm(self, num_verts: int) -> bool:
        if self.solve_layout == "rows":
            return False
        return True

    # One-hot (broadcast-multiply-reduce) forms of the restriction and
    # prolongation transfer ops instead of the scatter/gather forms. The
    # scatter/gather forms are priced per ROW on TPU (~40/4.2 ns) and so
    # scale at issue rate, not bandwidth (1.5 ms at 65k, 11 ms at 262k for
    # the L0 restriction scatter on v5e); the one-hot pair is pure VPU
    # streaming and fuses into ~0.53 ms at 65k. Alternates kept for the
    # halo path and as oracles. (A batched-MXU matmul variant and a
    # vmapped-dynamic-slice prolong were measured and rejected: tiny
    # [32,32]x[32,3] matmuls pad catastrophically, slice-gathers price
    # per output row.)
    use_onehot_transfer: bool = True

    # Debug-mode numerical guards: after every prepare(), fetch the built
    # state and assert it is finite / symmetric / not overflowed
    # (utils/guards.assert_healthy). Costs a host round-trip per prepare,
    # so it is off by default; the PRECOND_DEBUG_CHECKS=1 env var turns it
    # on without touching code (reference analogue: the stencil-overflow
    # printf, cpp:312-316, was its only runtime diagnostic).
    debug_checks: bool = False

    # Morton-sort normalization. The reference divides each axis by its
    # own AABB extent (FillSortingData, cpp:225-231); on near-flat
    # configurations (a draped/folded sheet) that stretches the thin axis
    # to unit scale, so vertices in CONTACT (h/2 apart in real space)
    # sort to opposite ends and no fine domain ever contains a contact
    # pair. "isotropic" divides by the max extent, preserving true
    # distances: measured on the folded-sheet contact config, Schwarz
    # PCG iterations drop 1160 -> 504 at penalty stiffness 1e4 while
    # Jacobi stays at 960 (scripts/probe_isosort.py) — a deliberate
    # improvement over the reference (PARITY.md deviations).
    #   "isotropic" (default) | "per_axis" (reference-exact)
    morton_normalization: str = "isotropic"

    # Coarse-level correction damping of the additive apply:
    # z = z_0 + coarse_damping * sum_{l>=1} z_l. 1.0 is the reference's
    # plain additive sum (CollectFinalZ, cpp:1708-1717). Stiff cross-bank
    # contact constraints over-correct additively; 0.25-0.5 measured
    # 10-20% fewer PCG iterations in the contact-stiff regime with no
    # effect elsewhere (scripts/probe_damping.py). Kept at 1.0 by
    # default for reference fidelity.
    coarse_damping: float = 1.0

    # Storage dtype of the factorized domain inverses. "bfloat16" halves
    # the apply-phase HBM traffic (the [B,96,96] read dominates each PCG
    # iteration); rounding a symmetric matrix entrywise keeps it exactly
    # symmetric, so CG stays valid — typically costs a few extra
    # iterations on stiff systems. Accumulation stays f32. CAUTION: at
    # cloth-stiff conditioning (~1e7) the rounded M can lose positive
    # definiteness and stall/diverge CG (measured r2; also sensitive to
    # the clustering — diverges under the isotropic sort on the same
    # mesh where the per-axis sort merely costs iterations). Use for
    # milder regimes only; f32 is the production default.
    inverse_dtype: str = "float32"

    def __post_init__(self):
        assert self.bank_size == 32, "bank_size is pinned to 32 (uint32 masks / 96x96 blocks)"
        assert self.closure_iters >= math.ceil(math.log2(self.bank_size))
        assert self.symv_kernel in ("auto", "dense", "packed"), self.symv_kernel
        assert self.solve_layout in ("auto", "rows", "cm"), self.solve_layout
        assert self.morton_normalization in ("isotropic", "per_axis")
        assert 0.0 < self.coarse_damping <= 1.0, self.coarse_damping

    # ---- static level geometry ------------------------------------------

    def num_levels(self, num_verts: int) -> int:
        """Level count for an N-vertex mesh (reference ComputeLevelNums, cpp:112-135)."""
        n_level = 1
        level_sz = ceil_to(max(num_verts, 1), self.bank_size)
        while level_sz > self.bank_size:
            level_sz = ceil_to(level_sz // self.coarsen_factor, self.bank_size)
            n_level += 1
        return n_level

    def level_capacities(self, num_verts: int) -> Tuple[int, ...]:
        """Static per-level node capacities (multiples of bank_size).

        Level 0 capacity is exact (ceil32(N)). Coarser levels get
        ceil32(headroom * prev/coarsen_factor), floored at one bank. The
        reference sizes levels ideally and leans on a global 1.5x slack
        (cpp:114,134); static shapes need per-level slack instead. If real
        clustering ever exceeds a capacity the builder reports overflow.
        """
        caps = [ceil_to(max(num_verts, 1), self.bank_size)]
        for _ in range(1, self.num_levels(num_verts)):
            ideal = caps[-1] / self.coarsen_factor
            caps.append(max(self.bank_size, ceil_to(int(math.ceil(ideal * self.level_headroom)), self.bank_size)))
        return tuple(caps)

    def level_offsets(self, num_verts: int) -> Tuple[int, ...]:
        """Static begin offset of each level in the concatenated node space."""
        caps = self.level_capacities(num_verts)
        offs = [0]
        for c in caps:
            offs.append(offs[-1] + c)
        return tuple(offs)  # length num_levels+1; last entry == total_capacity

    def total_capacity(self, num_verts: int) -> int:
        return self.level_offsets(num_verts)[-1]

    def num_blocks(self, num_verts: int) -> int:
        return self.total_capacity(num_verts) // self.bank_size
