"""Composed-crossing A/B: streaming vs patch-Morton crossings (and
optimization_barrier pinning) inside the production-shaped PCG loop.

VERDICT r3 item 2: crossings cost ~3.5 ms/iter composed at 1M vs 0.5 ms
standalone — a while-loop carry-layout penalty. Candidates measured here,
all bit-identical permutations of the same vectors:

  stream          grid_to_morton / morton_to_grid        (production today)
  stream+bar      same, optimization_barrier around each crossing
  patch           grid_to_morton_patch / morton_to_grid_patch
                  (tile-granular transpose + patch row gather + fixed
                   [1024,1024] one-hot selector matmul, O(N*1024) FLOPs)
  patch+bar       same + barriers

Env: BENCH_GRID (default 1024), PROF_K (default 50), BENCH_SYMV.
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
from precond_tpu.ops.gridapply import precondition_grid
from precond_tpu.solver import prepare_grid
from precond_tpu.utils import gridmorton as gm

K = int(os.environ.get("PROF_K", "50"))
grid = int(os.environ.get("BENCH_GRID", "1024"))
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

bar = jax.lax.optimization_barrier


def make_pre(g2m, m2g, barrier):
    def pre(st, r):
        if barrier:
            r = bar(r)
        rs = g2m(r, k_gm)
        if barrier:
            rs = bar(rs)
        z = precondition_grid(st, rs, cfg)
        if barrier:
            z = bar(z)
        out = m2g(z, k_gm)
        return bar(out) if barrier else out

    return pre


VARIANTS = {
    "stream": make_pre(gm.grid_to_morton, gm.morton_to_grid, False),
    "stream+bar": make_pre(gm.grid_to_morton, gm.morton_to_grid, True),
    "patch": make_pre(gm.grid_to_morton_patch, gm.morton_to_grid_patch, False),
    "patch+bar": make_pre(gm.grid_to_morton_patch, gm.morton_to_grid_patch, True),
}


def loop_for(pre_op):
    def k_iterations(op, state, b):
        def body(_, carry):
            x, r, p, z, rz = carry
            q = gridstencil.spmv(op, p)
            alpha = rz / jnp.sum(p * q)
            x = x + alpha * p
            r = r - alpha * q
            z = pre_op(state, r)
            rz_new = jnp.sum(r * z)
            p = z + (rz_new / rz) * p
            return (x, r, p, z, rz_new)

        z0 = pre_op(state, b)
        init = (jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0))
        return jax.lax.fori_loop(0, K, body, init)[0][0, :1]

    return jax.jit(k_iterations)


def sync(a):
    return float(np.asarray(a).ravel()[0])


# ---- comp-major variant: [3,N] carries, spmv_t, cm crossings, cm apply ----
from precond_tpu.ops.gridapply import precondition_grid_cm
from precond_tpu.ops.pallas.packed_symv import PackedInverse, pack_sym96_cm

if isinstance(inv96, PackedInverse):
    cfg_dense = SchwarzConfig(symv_kernel="dense")
    dense96 = jax.jit(
        lambda dg, dr, o: prepare_grid(dg, dr, goffsets, k_gm, cfg_dense, None, o)
    )(dgr, drr, jnp.asarray(o2s)).astype(jnp.float32)
else:
    dense96 = inv96
inv_cm = jax.jit(lambda d: pack_sym96_cm(d, block_b=cfg.packed_symv_block_b))(dense96)


def loop_cm():
    def k_iterations(op, state, bt):
        def body(_, carry):
            x, r, p, z, rz = carry
            q = gridstencil.spmv_t(op, p)
            alpha = rz / jnp.sum(p * q)
            x = x + alpha * p
            r = r - alpha * q
            rs = gm.grid_to_morton_cm(r, k_gm)
            z = gm.morton_to_grid_cm(precondition_grid_cm(state, rs, cfg), k_gm)
            rz_new = jnp.sum(r * z)
            p = z + (rz_new / rz) * p
            return (x, r, p, z, rz_new)

        z0 = gm.morton_to_grid_cm(
            precondition_grid_cm(state, gm.grid_to_morton_cm(bt, k_gm), cfg), k_gm
        )
        init = (jnp.zeros_like(bt), bt, z0, z0, jnp.sum(bt * z0))
        return jax.lax.fori_loop(0, K, body, init)[0][:1, 0]

    return jax.jit(k_iterations)


print(f"grid={grid} n={n} K={K} packed={type(inv96).__name__ == 'PackedInverse'}",
      flush=True)
ref = None
for name, pre_op in VARIANTS.items():
    fn = loop_for(pre_op)
    v = sync(fn(ssys, inv96, b))
    if ref is None:
        ref = v
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(ssys, inv96, b))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    tag = "" if v == ref else f"  VALUE DRIFT {v} vs {ref}"
    print(f"{name:12s} {ms:8.3f} ms/iter{tag}", flush=True)

fn = loop_cm()
bt = jnp.transpose(b)
v = sync(fn(ssys, inv_cm, bt))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    sync(fn(ssys, inv_cm, bt))
    best = min(best, time.perf_counter() - t0)
ms = best / K * 1e3
tag = "" if abs(v - ref) < 1e-6 * max(abs(ref), 1e-9) else f"  value {v} vs {ref}"
print(f"{'comp-major':12s} {ms:8.3f} ms/iter{tag}", flush=True)
