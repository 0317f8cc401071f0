"""4M-vertex sharded capacity + correctness run on the virtual CPU mesh.

Real pods are unreachable here; this runs the ACTUAL multi-chip programs
(GSPMD grid step and/or the shard_map halo step) at the BASELINE.json:11
problem size (2048^2 = 4.19M vertices) over 8 virtual CPU devices —
real shard multiplicity, real collectives, full-size buffers. Evidence
that the 4M configuration compiles, fits, and converges; wall times are
CPU-bound and meaningless for TPU throughput (see scaling_model.py for
the comm/compute projection).

Usage: scaling_capacity.py [--grid 2048] [--path gspmd|halo|both]
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=2048)
    ap.add_argument("--path", default="gspmd", choices=["gspmd", "halo", "both"])
    ap.add_argument("--max-iters", type=int, default=12)
    # dense on CPU: interpret-mode Pallas at 131k blocks inlines ~512
    # unrolled grid steps into the XLA CPU graph and compiles for hours;
    # the packed halo apply's equivalence is proven at 65k by
    # tests/test_halo.py — this run is about 4M shapes + collectives.
    ap.add_argument("--symv", default="dense", choices=["dense", "auto", "packed"])
    args = ap.parse_args()

    from jax.sharding import Mesh

    from precond_tpu.config import SchwarzConfig
    from precond_tpu.models import cloth
    from precond_tpu.utils import gridmorton as gm

    g = args.grid
    k = g.bit_length() - 1
    cfg = SchwarzConfig(symv_kernel=args.symv)
    ndev = 8
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("x",))
    t0 = time.perf_counter()
    mesh_c = cloth.make_grid(g, g, z_wave=0.02, mass=0.001)
    n = mesh_c.num_verts
    print(json.dumps({"stage": "mesh", "num_verts": n, "rss_gb": round(rss_gb(), 1),
                      "t_s": round(time.perf_counter() - t0, 1)}), flush=True)

    if args.path in ("gspmd", "both"):
        from precond_tpu.parallel.gridsharded import sharded_grid_solve_step

        ssys = cloth.assemble_system_stencil(mesh_c)
        dgr, drr, full_off = cloth.assemble_system_grid(mesh_c)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        print(json.dumps({"stage": "assembled", "rss_gb": round(rss_gb(), 1),
                          "t_s": round(time.perf_counter() - t0, 1)}), flush=True)
        step = sharded_grid_solve_step(
            mesh, cfg, ssys.offsets, k, tol=1e-4, max_iters=args.max_iters
        )
        with mesh:
            res = step(ssys, dgr, drr, b)
            res.x.block_until_ready()
        out = {
            "stage": "gspmd_done", "num_verts": n, "ndev": ndev,
            "iterations": int(res.iterations),
            "rel_residual": float(np.asarray(res.rel_residual)),
            "finite": bool(np.isfinite(np.asarray(res.x)).all()),
            "rss_gb": round(rss_gb(), 1),
            "t_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(out), flush=True)
        del ssys, dgr, drr, step, res

    if args.path in ("halo", "both"):
        from precond_tpu.ops import blockcsr
        from precond_tpu.parallel import halo
        from precond_tpu.ops.pallas.packed_symv import PackedInverse
        from precond_tpu.solver import SortMaps, prepare_with_system

        ell = cloth.assemble_system(mesh_c)
        s2o, o2s = gm.sort_maps(k)
        maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
        state, ell_sorted = prepare_with_system(ell, maps, cfg)
        print(json.dumps({"stage": "prepared", "rss_gb": round(rss_gb(), 1),
                          "packed": isinstance(state.inv96, PackedInverse),
                          "t_s": round(time.perf_counter() - t0, 1)}), flush=True)
        hsys = halo.build_halo_system(ell_sorted, ndev)
        sap = halo.split_apply_state(state, cfg, n, num_shards=ndev)
        rng = np.random.default_rng(0)
        b_sorted = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        res = halo.solve_sorted(mesh, cfg, hsys, sap, b_sorted,
                                tol=1e-4, max_iters=args.max_iters)
        out = {
            "stage": "halo_done", "num_verts": n, "ndev": ndev,
            "halo_mode": int(hsys.halo),
            "iterations": int(res.iterations),
            "rel_residual": float(np.asarray(res.rel_residual)),
            "finite": bool(np.isfinite(np.asarray(res.x)).all()),
            "packed_apply": isinstance(sap.inv_fine, PackedInverse),
            "rss_gb": round(rss_gb(), 1),
            "t_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
