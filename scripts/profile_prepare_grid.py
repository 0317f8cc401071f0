"""Dissect the grid-path prepare (static assembly + panel inverse) on chip.

Chained-loop, dispatch-cancelled timings at BENCH_GRID (default 256).
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
from precond_tpu.ops.batched_inverse import invert_spd_blocks_panel
from precond_tpu.ops.gridassembly import assemble_grid_hessian
from precond_tpu.utils import gridmorton as gm

K = int(os.environ.get("PROF_K", "8"))
grid = int(os.environ.get("BENCH_GRID", "256"))
k_gm = grid.bit_length() - 1
cfg = SchwarzConfig()
mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
n = mesh.num_verts
dgr, drr, goffsets = cloth.assemble_system_grid(mesh)
h96 = jax.jit(
    lambda dg, dr: assemble_grid_hessian(dg, dr, goffsets, k_gm, cfg, None)
)(dgr, drr)


def sync(a):
    return float(np.asarray(a).ravel()[0])


def chained(op, k):
    """Run op k times, each dependent on the last via a scalar tap."""

    def run(*args):
        def body(_, c):
            x, tap = c
            y = op(x * (1.0 + 0.0 * tap), *args[1:])
            return (x, jnp.asarray(y).ravel()[0].astype(jnp.float32))

        return jax.lax.fori_loop(0, k, body, (args[0], jnp.float32(0)))[1]

    return jax.jit(run)


def timeit(name, op, *args):
    t = {}
    for k in (K, 3 * K):
        f = chained(op, k)
        sync(f(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(*args))
            best = min(best, time.perf_counter() - t0)
        t[k] = best
    print(f"{name:34s} {(t[3 * K] - t[K]) / (2 * K) * 1e3:9.3f} ms/op", flush=True)


print(f"grid={grid} n={n} blocks={h96.shape[0]} K={K}")
timeit("assemble_grid_hessian", lambda dg, dr: assemble_grid_hessian(dg, dr, goffsets, k_gm, cfg, None), dgr, drr)
timeit("invert_spd_blocks_panel", invert_spd_blocks_panel, h96)
timeit(
    "prepare_grid (asm+inv)",
    lambda dg, dr: invert_spd_blocks_panel(
        assemble_grid_hessian(dg, dr, goffsets, k_gm, cfg, None)
    ),
    dgr,
    drr,
)
