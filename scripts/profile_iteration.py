"""Composed-iteration dissection: time the bench PCG loop with stages
selectively stubbed, all INSIDE the fori_loop (standalone stage timings
sum to ~55% of the composed iteration — docs/ROADMAP.md — so attribution
must happen in composition).

Variants (all k iterations of the same loop skeleton):
  full        SpMV + crossings + apply + dots      (the bench iteration)
  no-apply    pre_op = identity                     -> apply cost = full - this
  symv-only   pre_op = crossings + symv, no transfers
  no-cross    pre_op = transfers + symv in Morton order (no grid<->Morton)
  no-spmv     q = p                                  -> SpMV cost
  dots-only   q = p, pre_op = identity               -> loop/dot floor

Env: BENCH_GRID (default 256), PROF_K (default 50).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops import gridstencil
from precond_tpu.ops.batched_inverse import apply_block_inverse
from precond_tpu.ops.gridapply import (
    precondition_grid, restrict_residual_grid, prolong_and_collect_grid,
)
from precond_tpu.ops.hierarchy import BANK
from precond_tpu.solver import prepare_grid
from precond_tpu.utils import gridmorton as gm

K = int(os.environ.get("PROF_K", "50"))
grid = int(os.environ.get("BENCH_GRID", "256"))
k_gm = grid.bit_length() - 1
cfg = SchwarzConfig(symv_kernel=os.environ.get("BENCH_SYMV", "auto"))
mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
n = mesh.num_verts

ssys = cloth.assemble_system_stencil(mesh)
dgr, drr, goffsets = cloth.assemble_system_grid(mesh)
s2o, o2s = gm.sort_maps(k_gm)
inv96 = jax.jit(
    lambda dg, dr, o: prepare_grid(dg, dr, goffsets, k_gm, cfg, None, o)
)(dgr, drr, jnp.asarray(o2s))

rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))


def sync(a):
    return float(np.asarray(a).ravel()[0])


def pre_full(st, r):
    rs = gm.grid_to_morton(r, k_gm)
    return gm.morton_to_grid(precondition_grid(st, rs, cfg), k_gm)


def _symv(st, rhs):
    from precond_tpu.ops.pallas.packed_symv import PackedInverse, packed_symv

    if isinstance(st, PackedInverse):
        return packed_symv(st, rhs, block_b=cfg.packed_symv_block_b)
    return apply_block_inverse(st, rhs)


def pre_symv_only(st, r):
    # NOTE: applies ALL Btot blocks (incl. coarse) to the fine vector
    # reshaped - op mix attribution only, numerically meaningless
    rs = gm.grid_to_morton(r, k_gm)
    pad = jnp.zeros((_btot * BANK - n, 3), rs.dtype)
    z = _symv(st, jnp.concatenate([rs, pad]).reshape(-1, 3 * BANK)).reshape(-1, 3)
    return gm.morton_to_grid(z[:n], k_gm)


def pre_no_cross(st, r):
    # r is grid-ordered; treat it as Morton-ordered (numerically different,
    # identical op mix minus the crossings)
    return precondition_grid(st, r, cfg)


def pre_transfers_only(st, r):
    rs = gm.grid_to_morton(r, k_gm)
    mr = restrict_residual_grid(rs, cfg, n)
    z = prolong_and_collect_grid(mr[: cfg.total_capacity(n)], cfg, n)
    return gm.morton_to_grid(z, k_gm)


VARIANTS = {
    "full": (True, pre_full),
    "no-apply": (True, None),
    "symv-only": (True, pre_symv_only),
    "no-cross": (True, pre_no_cross),
    "transfers-only": (True, pre_transfers_only),
    "no-spmv": (False, pre_full),
    "dots-only": (False, None),
}


def loop_for(use_spmv, pre_op):
    def k_iterations(op, state, b):
        def body(_, carry):
            x, r, p, z, rz = carry
            q = gridstencil.spmv(op, p) if use_spmv else p * 1.000001
            alpha = rz / jnp.sum(p * q)
            x = x + alpha * p
            r = r - alpha * q
            z = pre_op(state, r) if pre_op is not None else r * 1.000001
            rz_new = jnp.sum(r * z)
            p = z + (rz_new / rz) * p
            return (x, r, p, z, rz_new)

        z0 = pre_op(state, b) if pre_op is not None else b
        init = (jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0))
        return jax.lax.fori_loop(0, K, body, init)[0][0, :1]

    return jax.jit(k_iterations)


_btot = cfg.total_capacity(n) // BANK
print(f"grid={grid} n={n} K={K} blocks={_btot} packed={type(inv96).__name__=='PackedInverse'}")
base = None
for name, (use_spmv, pre_op) in VARIANTS.items():
    fn = loop_for(use_spmv, pre_op)
    sync(fn(ssys, inv96, b))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(ssys, inv96, b))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    if name == "full":
        base = ms
    print(f"{name:16s} {ms:8.3f} ms/iter"
          + (f"   (delta vs full {base - ms:+.3f})" if base and name != "full" else ""),
          flush=True)
