"""Fine-grained in-jit timings of precondition_sorted stages at scale."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# honor JAX_PLATFORMS even when a platform plugin (axon) outranks it
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops.apply import (
    precondition_sorted, restrict_residual_onehot, prolong_and_collect_onehot,
)
from precond_tpu.ops.batched_inverse import apply_block_inverse
from precond_tpu.ops.hierarchy import BANK
from precond_tpu.solver import SortMaps, prepare_with_system
from precond_tpu.utils import gridmorton as gm

K = int(os.environ.get("PROF_K", "50"))
grid = int(os.environ.get("BENCH_GRID", "1024"))
k_gm = grid.bit_length() - 1
cfg = SchwarzConfig()
mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
n = mesh.num_verts
ell = cloth.assemble_system(mesh)
s2o, o2s = gm.sort_maps(k_gm)
maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
state, ells = jax.jit(lambda e, m: prepare_with_system(e, m, cfg, None))(ell, maps)

rng = np.random.default_rng(0)
r0 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
total = cfg.total_capacity(n)
offs = cfg.level_offsets(n)
mr0 = jnp.asarray(rng.standard_normal((total, 3)).astype(np.float32))


def sync(a):
    return float(np.asarray(a).ravel()[0])


def timeit(name, fn, x, *rest):
    f = jax.jit(lambda x0, *r_: jax.lax.fori_loop(
        0, K, lambda _, y: fn(y, *r_), x0).ravel()[:1])
    sync(f(x, *rest))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); sync(f(x, *rest)); best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best / K * 1e3:9.3f} ms/op", flush=True)


print(f"grid={grid} n={n} total={total} K={K}")
timeit("floor (r scale)", lambda r: r * 1.000001, r0)
timeit("grid->morton transform", lambda r: gm.morton_to_grid(gm.grid_to_morton(r, k_gm), k_gm) * 1.000001, r0)
timeit("restrict", lambda r, st: restrict_residual_onehot(r * 1.000001, st, cfg, n)[:n], r0, state)

def symv_only(m, inv):
    z = apply_block_inverse(inv, m.reshape(-1, 3 * BANK))
    return z.reshape(-1, 3) * 1.000001
timeit("symv", symv_only, mr0, state.inv96)

def prolong_only(m, st):
    return jnp.pad(prolong_and_collect_onehot(m * 1.000001, st, cfg, n), ((0, total - n), (0, 0)))
timeit("prolong full", prolong_only, mr0, state)

# prolong internals
def prolong_coarse_only(m, st):
    pz = m * 1.000001
    for l in range(min(cfg.num_levels(n), cfg.max_applied_levels) - 2, 0, -1):
        seg = slice(offs[l], offs[l + 1])
        parents = st.going_next[seg]
        pz = pz.at[seg].add(jnp.take(pz, parents, axis=0, mode="fill", fill_value=0))
    return pz
timeit("prolong coarse-accum", prolong_coarse_only, mr0, state)

def prolong_fine_only(m, st):
    cap0 = offs[1]
    b0 = cap0 // BANK
    cap1 = offs[2] - cap0
    pz1 = m[cap0 : offs[2]] * 1.000001
    pb = st.restrict_pb[:b0] - cap0
    q = jnp.clip(pb // BANK, 0, cap1 // BANK - 1)
    r = pb - q * BANK
    pzb = jnp.concatenate([pz1, jnp.zeros((BANK, 3), pz1.dtype)]).reshape(-1, BANK, 3)
    win = jnp.take(pzb, jnp.stack([q, q + 1], axis=1), axis=0, mode="fill", fill_value=0.0).reshape(b0, 2 * BANK, 3)
    for bit in (16, 8, 4, 2, 1):
        shifted = jnp.concatenate([win[:, bit:, :], jnp.zeros((b0, bit, 3), win.dtype)], axis=1)
        win = jnp.where((r & bit)[:, None, None] > 0, shifted, win)
    winshift = win[:, :BANK, :]
    contrib = jnp.sum(st.restrict_onehot[:b0][:, :, :, None] * winshift[:, :, None, :], axis=1)
    return jnp.pad(contrib.reshape(-1, 3), ((0, total - cap0), (0, 0)))
timeit("prolong fine-distribute", prolong_fine_only, mr0, state)

timeit("precondition_sorted", lambda r, st: precondition_sorted(st, r * 1.000001, cfg), r0, state)

# ---- static grid apply (ops/gridapply.py) ----------------------------------
from precond_tpu.ops.gridapply import (
    precondition_grid, restrict_residual_grid, prolong_and_collect_grid,
)

timeit("grid restrict", lambda r: jnp.pad(restrict_residual_grid(r * 1.000001, cfg, n), ((0, 0), (0, 0)))[:n], r0)
timeit("grid prolong", lambda m: jnp.pad(prolong_and_collect_grid(m * 1.000001, cfg, n), ((0, total - n), (0, 0))), mr0)
timeit("precondition_grid", lambda r, inv: precondition_grid(inv, r * 1.000001, cfg), r0, state.inv96)
timeit("precondition_grid+crossings", lambda r, inv: gm.morton_to_grid(
    precondition_grid(inv, gm.grid_to_morton(r * 1.000001, k_gm), cfg), k_gm), r0, state.inv96)
