"""One process of a multi-process (multi-host) solve — CI-runnable.

Launched N times (tests/test_multiprocess.py runs 2 processes x 4 virtual
CPU devices each) to exercise the REAL multi-host code path end-to-end:
jax.distributed initialization, the global mesh spanning processes
(parallel/hosts.py), globally-sharded inputs, the shard_map halo PCG solve
(parallel/halo.py) with its ppermute/all_to_all/psum collectives crossing
the process boundary, and an orbax sharded checkpoint round-trip
(io/sharded.py). Each process verifies its own shards against a locally
computed single-device solve and writes a JSON verdict.

On a real pod this same structure runs one process per host with
jax.distributed auto-detection — see scripts/run_pod.sh.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)  # host:port
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", required=True)          # per-process JSON verdict
    ap.add_argument("--ckpt-dir", required=True)     # SHARED orbax dir
    ap.add_argument("--grid", type=int, default=16)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from precond_tpu.config import SchwarzConfig
    from precond_tpu.io import sharded as shio
    from precond_tpu.models import cloth
    from precond_tpu.ops import blockcsr
    from precond_tpu.ops.apply import precondition
    from precond_tpu.parallel import halo, hosts
    from precond_tpu.parallel.pcg import pcg
    from precond_tpu.solver import compute_sort_maps, prepare_preconditioner

    hosts.initialize_hosts(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_index() == args.process_id
    assert jax.local_device_count() == args.local_devices
    ndev = jax.device_count()
    assert ndev == args.num_processes * args.local_devices

    mesh = hosts.global_mesh()

    # Problem setup is deterministic, so every process builds the same
    # full-system host copy (a real pod would build only its row slab;
    # correctness-checking needs the full copy anyway).
    cfg = SchwarzConfig()
    mesh_c = cloth.make_grid(args.grid, args.grid, z_wave=0.02, mass=0.01)
    n = mesh_c.num_verts
    assert n % (ndev * 32) == 0
    ell = cloth.assemble_system(mesh_c)
    maps = compute_sort_maps(jnp.asarray(mesh_c.positions))
    state = prepare_preconditioner(ell, maps, cfg)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    # local single-device reference (independent per process)
    res1 = pcg(
        lambda v: blockcsr.spmv(ell, v),
        lambda r: precondition(state, r, cfg),
        b, tol=1e-4, max_iters=200,
    )
    x1_sorted = np.asarray(jnp.take(res1.x, maps.sorted_to_orig, axis=0))

    # global sharded inputs for the halo solve
    ell_sorted = blockcsr.permute(ell, maps.sorted_to_orig, maps.orig_to_sorted)
    hsys = halo.build_halo_system(ell_sorted, ndev)
    sap = halo.split_apply_state(state, cfg, n, num_shards=ndev)
    b_sorted = jnp.take(b, maps.sorted_to_orig, axis=0)

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

    levels = cfg.num_levels(n)
    solver = halo.halo_pcg_solver(
        mesh, cfg, n, hsys.halo, levels, sap.total_coarse,
        tol=1e-4, max_iters=200,
        packed=isinstance(sap.inv_fine, _PK),
        l1_live=sap.l1_live or None,
    )
    with mesh:
        res = solver(ell_parts, sap_parts, bg)
    iters = int(np.asarray(res.iterations))
    rel = float(np.asarray(res.rel_residual))

    # each process checks the shards it owns against the local reference
    scale = float(np.abs(x1_sorted).max())
    maxdiff = 0.0
    for s in res.x.addressable_shards:
        want = x1_sorted[s.index]
        maxdiff = max(maxdiff, float(np.abs(np.asarray(s.data) - want).max()))
    solve_ok = rel <= 1e-4 and maxdiff <= 5e-3 * scale

    # orbax sharded checkpoint round-trip across the processes
    shio.save_tree(args.ckpt_dir, {"x": res.x, "b": bg})
    tmpl = {
        "x": jax.ShapeDtypeStruct(res.x.shape, res.x.dtype,
                                  sharding=NamedSharding(mesh, row)),
        "b": jax.ShapeDtypeStruct(bg.shape, bg.dtype,
                                  sharding=NamedSharding(mesh, row)),
    }
    back = shio.load_tree(args.ckpt_dir, template=tmpl)
    ck = 0.0
    for s, s2 in zip(res.x.addressable_shards, back["x"].addressable_shards):
        assert s.index == s2.index
        ck = max(ck, float(np.abs(np.asarray(s.data) - np.asarray(s2.data)).max()))
    ckpt_ok = ck == 0.0

    with open(args.out, "w") as f:
        json.dump(
            {
                "ok": bool(solve_ok and ckpt_ok),
                "solve_ok": bool(solve_ok),
                "ckpt_ok": bool(ckpt_ok),
                "iterations": iters,
                "rel_residual": rel,
                "maxdiff": maxdiff,
                "ndev": ndev,
                "process": args.process_id,
                "abs_iter_gap": abs(iters - int(res1.iterations)),
            },
            f,
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
