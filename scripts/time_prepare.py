"""Quick prepare-phase timer (min-of-5) for A/B testing assembly changes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.solver import compute_sort_maps, prepare_with_system

grid = int(os.environ.get("BENCH_GRID", "256"))
cfg = SchwarzConfig()
mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
ell = cloth.assemble_system(mesh)
maps = compute_sort_maps(jnp.asarray(mesh.positions))


def sync(a):
    return float(np.asarray(a).ravel()[0])


prep = jax.jit(lambda e, m: prepare_with_system(e, m, cfg, None))
state, _ = prep(ell, maps)
sync(state.inv96[0, 0, :1])
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    state, _ = prep(ell, maps)
    sync(state.inv96[0, 0, :1])
    best = min(best, time.perf_counter() - t0)
print(f"prepare min-of-5: {best*1e3:.2f} ms (grid={grid}, n={mesh.num_verts})")
