"""A/B the static-transfer formulations inside the composed PCG loop.

The dissection (scripts/profile_iteration.py) showed transfers cost
~0.22 ms/iter at 65k — far above their ~0.01 ms traffic. Hypothesis: the
[cap/32, 32, 3]-shaped reshape-sums and jnp.repeat broadcasts hit
padding-hostile layouts. Alternative: keep everything bank-flat [B, 96]
and express restriction/prolongation as tiny matmuls against a constant
0/1 selector SEL f32[96, 3] (lane l, component c) -> (c):

  restrict:  next[B/32, 96] = reshape(cur[B,96] @ SEL)
  prolong:   child += reshape(parent_vals[B,3] @ SEL^T)

All timings dispatch-cancelled: run K and 3K iterations, difference.
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
from precond_tpu.ops.gridapply import precondition_grid
from precond_tpu.ops.hierarchy import BANK
from precond_tpu.solver import prepare_grid
from precond_tpu.utils import gridmorton as gm

K = int(os.environ.get("PROF_K", "50"))
grid = int(os.environ.get("BENCH_GRID", "256"))
k_gm = grid.bit_length() - 1
cfg = SchwarzConfig()
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

SEL = jnp.zeros((96, 3), jnp.float32).at[jnp.arange(96), jnp.arange(96) % 3].set(1.0)


def precondition_grid_mm(inv96, r_sorted, cfg):
    """[B,96]-flat static transfers via selector matmuls."""
    nn = r_sorted.shape[0]
    offs = cfg.level_offsets(nn)
    levels = cfg.num_levels(nn)
    sizes = [nn]
    for _ in range(1, levels):
        sizes.append(max(sizes[-1] // BANK, 1))
    # ---- restrict ----
    parts = [r_sorted.reshape(-1, 3 * BANK)]                  # [B0,96]
    cur = parts[0]
    for l in range(levels - 1):
        vals = cur[: sizes[l] // BANK] @ SEL                  # [sizes[l+1], 3]
        capb = (offs[l + 2] - offs[l + 1]) // BANK
        cur = jnp.pad(vals, ((0, capb * BANK - vals.shape[0]), (0, 0))).reshape(
            capb, 3 * BANK
        )
        parts.append(cur)
    mr = jnp.concatenate(parts, axis=0)                       # [Btot,96]
    z96 = apply_block_inverse(inv96, mr)                      # [Btot,96]
    # ---- prolong ----
    top = min(levels, cfg.max_applied_levels)
    pz = z96[offs[top - 1] // BANK : offs[top] // BANK]
    for l in range(top - 2, -1, -1):
        curz = z96[offs[l] // BANK : offs[l + 1] // BANK]
        nb = (offs[l + 1] - offs[l]) // BANK
        vals = pz.reshape(-1, 3)[:nb]                         # [nb,3]
        pz = curz + (vals @ SEL.T)                            # [nb,96]
    return pz.reshape(-1, 3)[:nn]


def pre_full(st, r):
    rs = gm.grid_to_morton(r, k_gm)
    return gm.morton_to_grid(precondition_grid(st, rs, cfg), k_gm)


def pre_mm(st, r):
    rs = gm.grid_to_morton(r, k_gm)
    return gm.morton_to_grid(precondition_grid_mm(st, rs, cfg), k_gm)


import functools
from jax import lax


def precondition_grid_mmh(inv96, r_sorted, cfg):
    nn = r_sorted.shape[0]
    offs = cfg.level_offsets(nn)
    levels = cfg.num_levels(nn)
    sizes = [nn]
    for _ in range(1, levels):
        sizes.append(max(sizes[-1] // BANK, 1))
    dot = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)
    parts = [r_sorted.reshape(-1, 3 * BANK)]
    cur = parts[0]
    for l in range(levels - 1):
        nbl = (sizes[l] + BANK - 1) // BANK
        vals = dot(cur[:nbl], SEL)
        capb = (offs[l + 2] - offs[l + 1]) // BANK
        cur = jnp.pad(vals, ((0, capb * BANK - vals.shape[0]), (0, 0))).reshape(
            capb, 3 * BANK
        )
        parts.append(cur)
    mr = jnp.concatenate(parts, axis=0)
    z96 = apply_block_inverse(inv96, mr)
    top = min(levels, cfg.max_applied_levels)
    pz = z96[offs[top - 1] // BANK : offs[top] // BANK]
    for l in range(top - 2, -1, -1):
        curz = z96[offs[l] // BANK : offs[l + 1] // BANK]
        nb = (offs[l + 1] - offs[l]) // BANK
        vals = pz.reshape(-1, 3)[:nb]
        pz = curz + dot(vals, SEL.T)
    return pz.reshape(-1, 3)[:nn]


def pre_mmh(st, r):
    rs = gm.grid_to_morton(r, k_gm)
    return gm.morton_to_grid(precondition_grid_mmh(st, rs, cfg), k_gm)


def sync(a):
    return float(np.asarray(a).ravel()[0])


def loop_for(pre_op, k):
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
        return jax.lax.fori_loop(0, k, body, init)[0][0, :1]

    return jax.jit(k_iterations)


# correctness first
za = pre_full(inv96, b)
zb = pre_mm(inv96, b)
err = float(jnp.max(jnp.abs(za - zb)) / (jnp.max(jnp.abs(za)) + 1e-30))
print(f"grid={grid} n={n} rel_err(mm vs full) = {err:.3e}")

zc = pre_mmh(inv96, b)
err2 = float(jnp.max(jnp.abs(za - zc)) / (jnp.max(jnp.abs(za)) + 1e-30))
print(f"rel_err(mmh vs full) = {err2:.3e}")
for name, pre in [("reshape-sum", pre_full), ("selector-mm", pre_mm), ("selector-mmh", pre_mmh)]:
    t = {}
    for k in (K, 3 * K):
        fn = loop_for(pre, k)
        sync(fn(ssys, inv96, b))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(ssys, inv96, b))
            best = min(best, time.perf_counter() - t0)
        t[k] = best
    ms = (t[3 * K] - t[K]) / (2 * K) * 1e3
    print(f"{name:14s} {ms:8.4f} ms/iter (dispatch-cancelled)", flush=True)
