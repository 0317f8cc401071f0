"""Measured comm-volume vs local-compute model for the multi-host target
(BASELINE.json:11: 4M verts, >=2 hosts, >=80% nnz/s scaling efficiency).

Real pods are not reachable from this environment, so the >=80% claim is
evidenced by MEASURED communication volumes: this script builds the REAL
halo exchange tables (parallel/halo.build_halo_system) for the 1M and 4M
cloth systems at several shard counts and tabulates, per PCG iteration:

  * bytes exchanged for the SpMV halo (ppermute window or sparse
    all_to_all lists — whichever mode the real Morton boundary needs);
  * bytes psum'd for the coarse-level restriction (replicated coarse
    hierarchy) and the CG dot products;
  * local HBM bytes each shard streams (ELL blocks + packed inverse +
    vectors) — the measured bottleneck resource of the iteration (the
    1M iteration runs at HBM roofline, BASELINE.md).

Projected scaling efficiency = t_local / (t_local + t_comm) with
t_local = local bytes / HBM bandwidth and t_comm = comm bytes / ICI
bandwidth, i.e. NO overlap credited (the halo exchange is issued before
the local contraction and can overlap it, so this is a lower bound).

Hardware constants are v5p per-chip figures and are printed with the
table so the assumption is auditable.

Output: a JSON line per (grid, shards) + a markdown table for BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops import blockcsr
from precond_tpu.parallel import halo
from precond_tpu.solver import SortMaps
from precond_tpu.utils import gridmorton as gm

# v5p per-chip figures (public: HBM2e ~2765 GB/s; ICI 4800 Gbit/s total
# = 600 GB/s aggregate, 3D torus; a 1-D ring solve uses 2 of 6 links ->
# ~200 GB/s usable, halved again to be conservative about protocol +
# bidirectional accounting).
HBM_GBPS = 2765.0
ICI_GBPS = 100.0


def measure(grid: int, shards: int, cfg: SchwarzConfig) -> dict:
    n = grid * grid
    k = grid.bit_length() - 1
    mesh_c = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001)
    ell = cloth.assemble_system(mesh_c)
    s2o, o2s = gm.sort_maps(k)
    maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    ell_sorted = blockcsr.permute(ell, maps.sorted_to_orig, maps.orig_to_sorted)
    hsys = halo.build_halo_system(ell_sorted, shards)

    nnz_blocks = int(np.asarray(ell.mask).sum()) + n  # off-diag + diag 3x3 blocks
    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    total = offs[-1]
    total_coarse = total - offs[1]
    nblocks = total // 32

    # ---- per-iteration comm bytes (per chip) ----------------------------
    if hsys.halo >= 0:
        # two ring ppermutes of `halo` rows of f32[3]
        spmv_bytes = 2 * hsys.halo * 3 * 4
        mode = f"ring halo={hsys.halo}"
    else:
        send = np.asarray(hsys.send_idx)
        # all_to_all: each shard sends its per-dst lists once; count the
        # MAX over shards (the ring is synchronous) of total rows sent
        per_shard_rows = send.shape[2] * shards  # padded slots actually moved
        spmv_bytes = per_shard_rows * 3 * 4
        real_rows = max(
            int((send[s] != 0).sum()) for s in range(shards)
        )  # informational
        mode = f"sparse all_to_all (padded rows/shard={per_shard_rows}, live~{real_rows})"
    # coarse restriction psum (ring all-reduce moves ~2x the buffer per
    # chip) + 2 scalar dots per iteration. The apply psums only the LIVE
    # level-1 span (halo.local_apply l1_live): fine parents are level-1
    # nodes, so the capacity-padded coarse tail never rides the wire.
    # l1_live = n/32 exactly on the analytic orderings (the pod grid
    # path); the general builder's worst case is the 2x-headroom cap —
    # reported as psum_bytes_worst.
    l1_live = n // 32
    psum_bytes = 2 * (l1_live + 1) * 3 * 4 + 2 * 2 * 4
    cap1 = offs[2] - offs[1] if levels > 1 else 0
    psum_bytes_worst = 2 * (cap1 + 1) * 3 * 4 + 2 * 2 * 4

    # ---- per-iteration local HBM bytes per shard ------------------------
    ell_bytes = nnz_blocks * 9 * 4 / shards          # block stream
    idx_bytes = nnz_blocks * 4 / shards
    packed = cfg.use_packed_symv(n)
    inv_bytes = nblocks * (4704 if packed else 9216) * 4 / shards
    vec_bytes = 6 * n * 3 * 4 / shards               # x,r,p,z,q,b streams
    local_bytes = ell_bytes + idx_bytes + inv_bytes + vec_bytes

    t_local = local_bytes / (HBM_GBPS * 1e9)
    t_comm = (spmv_bytes + psum_bytes) / (ICI_GBPS * 1e9)
    eff = t_local / (t_local + t_comm)
    return {
        "grid": grid,
        "num_verts": n,
        "shards": shards,
        "mode": mode,
        "spmv_exchange_bytes": int(spmv_bytes),
        "coarse_psum_bytes": int(psum_bytes),
        "coarse_psum_bytes_worst": int(psum_bytes_worst),
        "local_hbm_bytes_per_shard": int(local_bytes),
        "packed_inverse": bool(packed),
        "t_local_us": round(t_local * 1e6, 1),
        "t_comm_us": round(t_comm * 1e6, 1),
        "projected_scaling_efficiency": round(eff, 4),
        "assumptions": {"hbm_GBps": HBM_GBPS, "ici_GBps": ICI_GBPS},
    }


def main():
    cfg = SchwarzConfig()
    rows = []
    for grid, shard_list in ((1024, (8, 16)), (2048, (8, 16, 32))):
        for s in shard_list:
            t0 = time.perf_counter()
            r = measure(grid, s, cfg)
            r["build_s"] = round(time.perf_counter() - t0, 1)
            rows.append(r)
            print(json.dumps(r), flush=True)
    print("\n| grid | verts | shards | exchange mode | SpMV comm B/iter | "
          "psum B/iter | local HBM B/iter/shard | eff (no overlap) |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['grid']} | {r['num_verts']/1e6:.2f}M | {r['shards']} | "
              f"{r['mode']} | {r['spmv_exchange_bytes']:,} | "
              f"{r['coarse_psum_bytes']:,} | "
              f"{r['local_hbm_bytes_per_shard']:,} | "
              f"{r['projected_scaling_efficiency']:.1%} |")


if __name__ == "__main__":
    main()
