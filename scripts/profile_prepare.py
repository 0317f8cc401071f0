"""Per-component in-jit timings of the prepare phase on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops import hierarchy as hi
from precond_tpu.ops.assembly import assemble_banked_hessian
from precond_tpu.ops.batched_inverse import invert_spd_blocks
from precond_tpu.ops.blockcsr import permute
from precond_tpu.solver import compute_sort_maps, prepare_with_system

K = int(os.environ.get("PROF_K", "20"))
grid = int(os.environ.get("BENCH_GRID", "256"))
cfg = SchwarzConfig()
mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
n = mesh.num_verts
ell = cloth.assemble_system(mesh)
maps = compute_sort_maps(jnp.asarray(mesh.positions))
ells = jax.jit(lambda e, m: permute(e, m.sorted_to_orig, m.orig_to_sorted))(ell, maps)
hier = jax.jit(lambda i, m: hi.build_hierarchy(i, m, cfg, None))(ells.idx, ells.mask)
h96 = jax.jit(lambda e, h: assemble_banked_hessian(e, h, cfg, None))(ells, hier)

from precond_tpu.ops import batched_inverse as bi


def sync(a):
    return float(np.asarray(a).ravel()[0])


def timeit(name, fn, *args, k=K):
    f = jax.jit(fn)
    sync(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best / k * 1e3:9.3f} ms/op")
    return best / k


def chain(op, shape_of_x):
    def run(x, *rest):
        def body(_, x):
            y = op(x, *rest)
            return x * (1.0 + 1e-30 * jnp.mean(y).astype(x.dtype))
        return jax.lax.fori_loop(0, K, body, x).ravel()[:1]
    return run


print(f"grid={grid} n={n} total={cfg.total_capacity(n)} K={K}")

# floor probe
timeit("floor (scaled copy)", chain(lambda x: x * 1.000001, None), ells.diag)

# components (x is perturbed input to stop LICM)
timeit("permute ELL", chain(lambda d, e, m: permute(e._replace(diag=d), m.sorted_to_orig, m.orig_to_sorted).blocks, None), ells.diag, ell, maps)
timeit("build_hierarchy", chain(lambda mskf, idx: hi.build_hierarchy(idx, mskf > 0, cfg, None).going_next.astype(jnp.float32), None), ells.mask.astype(jnp.float32), ells.idx)
timeit("restriction_operators", chain(lambda gnf: hi.restriction_operators(gnf.astype(jnp.int32), cfg, n)[0], None), hier.going_next.astype(jnp.float32))
timeit("assemble", chain(lambda d, e, h: assemble_banked_hessian(e._replace(diag=d), h, cfg, None)[:, 0, :], None), ells.diag, ells, hier)
timeit("invert panel", chain(lambda h: bi.invert_spd_blocks_panel(h)[:, 0, :], None), h96)


# full prepare (single dispatch, k=1)
prep = jax.jit(lambda e, m: prepare_with_system(e, m, cfg, None))
timeit("prepare (single)", lambda e, m: prep(e, m)[0].inv96[0, 0, :1], ell, maps, k=1)
timeit("sort maps (single)", lambda p: compute_sort_maps(p).sorted_to_orig[:1].astype(jnp.float32), jnp.asarray(mesh.positions), k=1)
