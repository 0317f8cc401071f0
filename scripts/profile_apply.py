"""Per-component in-jit timings of the PCG iteration on the real chip.

Each component runs K times inside one jit (chained through a data
dependency) so the shared chip's dispatch floor is amortized away.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops import gridstencil
from precond_tpu.ops.apply import (
    precondition_sorted,
    restrict_residual,
    prolong_and_collect,
)
from precond_tpu.ops.batched_inverse import apply_block_inverse
from precond_tpu.ops.hierarchy import BANK
from precond_tpu.solver import compute_sort_maps, prepare_with_system

K = int(os.environ.get("PROF_K", "100"))
grid = int(os.environ.get("BENCH_GRID", "256"))
cfg = SchwarzConfig()
mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
n = mesh.num_verts
ell = cloth.assemble_system(mesh)
ssys = cloth.assemble_system_stencil(mesh)
maps = compute_sort_maps(jnp.asarray(mesh.positions))
state, ells = jax.jit(lambda e, m: prepare_with_system(e, m, cfg, None))(ell, maps)

rng = np.random.default_rng(0)
r0 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
total = cfg.total_capacity(n)
mr0 = jnp.asarray(rng.standard_normal((total, 3)).astype(np.float32))


def sync(a):
    return float(np.asarray(a).ravel()[0])


def timeit(name, fn, *args):
    f = jax.jit(fn)
    sync(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:32s} {best / K * 1e6:9.1f} us/op")
    return best / K


def chain(op):
    """Run op K times with a data dependency (perturb input by output[0])."""

    def run(x, *rest):
        def body(_, x):
            y = op(x, *rest)
            return x + 1e-30 * jnp.mean(y) * jnp.ones_like(x) if y.shape != x.shape else y
        return jax.lax.fori_loop(0, K, body, x)[0, :1]

    return run


print(f"grid={grid} n={n} total={total} blocks={state.inv96.shape[0]} K={K}")

# HBM roofline probe: sum of inv96 (one full read)
inv = state.inv96
timeit("inv96 full-read (sum)", chain(lambda x, i: x + jnp.sum(i) * 0), r0[:1, :1], inv)

# components
timeit("restrict", chain(lambda r, st: restrict_residual(r, st, cfg, n)[: r.shape[0]]), r0, state)
timeit("symv (einsum)", chain(lambda m, i: apply_block_inverse(i, m.reshape(-1, 3 * BANK)).reshape(-1, 3)), mr0, inv)
timeit("prolong", chain(lambda m, st: jnp.pad(prolong_and_collect(m, st, cfg, n), ((0, total - n), (0, 0)))), mr0, state)
timeit("precondition_sorted", chain(lambda r, st: precondition_sorted(st, r, cfg)), r0, state)
timeit("spmv stencil (grid order)", chain(lambda v, s: gridstencil.spmv(s, v)), r0, ssys)
timeit("spmv ell (sorted order)", chain(lambda v, e: __import__("precond_tpu.ops.blockcsr", fromlist=["spmv"]).spmv(e, v)), r0, ells)
timeit("dot+axpy pair", chain(lambda v, b: v * (jnp.vdot(v.ravel(), b.ravel()) / jnp.vdot(b.ravel(), b.ravel())) + b), r0, r0 * 2.0)
