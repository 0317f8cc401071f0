"""Composed-iteration dissection for the COMP-MAJOR solve path.

Same stub-in-the-loop method as profile_iteration.py (standalone stage
timings don't attribute composed cost — docs/ROADMAP.md): every variant
runs K iterations of the same fori skeleton with one stage replaced by a
near-noop, all on [3,N] carries.

  full            spmv_t + cm crossings + cm apply + dots
  no-apply        pre = identity
  crossings-only  pre = g2m_cm . m2g_cm (no apply work)
  symv-only       pre = crossings + packed/dense symv on the fine level
  no-spmv         q = p * 1.000001
  dots-only       both stubbed (loop floor)

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
from precond_tpu.ops.gridapply import precondition_grid_cm
from precond_tpu.ops.hierarchy import BANK
from precond_tpu.ops.pallas.packed_symv import (
    DenseInverseCM, PackedInverseCM, dense_symv_cm, packed_symv_cm,
)
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
inv_cm = jax.jit(
    lambda dg, dr: prepare_grid(dg, dr, goffsets, k_gm, cfg)
)(dgr, drr)
assert isinstance(inv_cm, (PackedInverseCM, DenseInverseCM)), type(inv_cm)

rng = np.random.default_rng(0)
bt = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))


def pre_full(st, r):
    rs = gm.grid_to_morton_cm(r, k_gm)
    return gm.morton_to_grid_cm(precondition_grid_cm(st, rs, cfg), k_gm)


def pre_crossings(st, r):
    return gm.morton_to_grid_cm(gm.grid_to_morton_cm(r, k_gm), k_gm) * 1.000001


def pre_symv_only(st, r):
    # fine-level-only symv on the crossed vector (op-mix attribution)
    rs = gm.grid_to_morton_cm(r, k_gm).reshape(3, n // BANK, BANK)
    if isinstance(st, DenseInverseCM):
        b0 = rs.shape[1]
        z = dense_symv_cm(DenseInverseCM(m=st.m[..., :b0]), rs)
    else:
        pad = st.f.shape[2] - rs.shape[1]
        rsp = jnp.pad(rs, ((0, 0), (0, pad), (0, 0)))
        z = packed_symv_cm(st, rsp, block_b=cfg.packed_symv_block_b)[:, : rs.shape[1]]
    return gm.morton_to_grid_cm(z.reshape(3, n), k_gm)


VARIANTS = {
    "full": (True, pre_full),
    "no-apply": (True, None),
    "crossings-only": (True, pre_crossings),
    "symv-only": (True, pre_symv_only),
    "no-spmv": (False, pre_full),
    "dots-only": (False, None),
}


def loop_for(use_spmv, pre_op):
    def k_iterations(op, state, b):
        def body(_, carry):
            x, r, p, z, rz = carry
            q = gridstencil.spmv_t(op, p) if use_spmv else p * 1.000001
            alpha = rz / jnp.sum(p * q)
            x = x + alpha * p
            r = r - alpha * q
            z = pre_op(state, r) if pre_op is not None else r * 1.000001
            rz_new = jnp.sum(r * z)
            p = z + (rz_new / rz) * p
            return (x, r, p, z, rz_new)

        z0 = pre_op(state, b) if pre_op is not None else b
        init = (jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0))
        return jax.lax.fori_loop(0, K, body, init)[0][:1, 0]

    return jax.jit(k_iterations)


def sync(a):
    return float(np.asarray(a).ravel()[0])


kind = type(inv_cm).__name__
print(f"grid={grid} n={n} K={K} inv={kind}", flush=True)
base = None
for name, (use_spmv, pre_op) in VARIANTS.items():
    fn = loop_for(use_spmv, pre_op)
    sync(fn(ssys, inv_cm, bt))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(ssys, inv_cm, bt))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    if name == "full":
        base = ms
    print(f"{name:16s} {ms:8.3f} ms/iter"
          + (f"   (delta vs full {base - ms:+.3f})" if base and name != "full" else ""),
          flush=True)
