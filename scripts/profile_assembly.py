"""Sub-component timings of assemble_banked_hessian on the real chip."""
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
from precond_tpu.ops import assembly as asm
from precond_tpu.ops.blockcsr import permute
from precond_tpu.solver import compute_sort_maps

K = int(os.environ.get("PROF_K", "30"))
grid = int(os.environ.get("BENCH_GRID", "256"))
cfg = SchwarzConfig()
mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=0.001, dt=1.0 / 60.0)
n = mesh.num_verts
ell = cloth.assemble_system(mesh)
maps = compute_sort_maps(jnp.asarray(mesh.positions))
ells = jax.jit(lambda e, m: permute(e, m.sorted_to_orig, m.orig_to_sorted))(ell, maps)
hier = jax.jit(lambda i, m: hi.build_hierarchy(i, m, cfg, None))(ells.idx, ells.mask)

levels = cfg.num_levels(n)
total = cfg.total_capacity(n)
gn = hier.going_next


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
    print(f"{name:34s} {best / k * 1e3:9.3f} ms/op")


def chain(op):
    def run(x, *rest):
        def body(_, x):
            y = op(x, *rest)
            return x * (1.0 + 1e-30 * jnp.mean(y).astype(x.dtype))
        return jax.lax.fori_loop(0, K, body, x).ravel()[:1]
    return run


print(f"grid={grid} n={n} total={total} K={K} levels={levels} K_ell={ells.idx.shape[1]}")
timeit("floor (scaled copy)", chain(lambda x: x * 1.000001), ells.diag)

anc = jax.jit(lambda g: asm.node_ancestor_table(g, levels, total))(gn)

timeit("anc table", chain(lambda gf: asm.node_ancestor_table(gf.astype(jnp.int32), levels, total).astype(jnp.float32), ), gn.astype(jnp.float32))
timeit("otanc gather [N,K,L]", chain(lambda xf, a, idx: jnp.take(a, idx, axis=0).astype(jnp.float32).sum(-1) + 0 * xf[..., :1], ), ells.idx.astype(jnp.float32), anc, ells.idx)

# full assembly
timeit("assemble full", chain(lambda d, e, h: asm.assemble_banked_hessian(e._replace(diag=d), h, cfg, None)[:, 0, :]), ells.diag, ells, hier)

# level_rows per level
myanc = anc[:n]
otanc = jnp.take(anc, ells.idx, axis=0)
eq = (myanc[:, None, :] // 32) == (otanc // 32)
lam = jnp.argmax(eq, axis=-1).astype(jnp.int32)
ok = jnp.any(eq, axis=-1) & ells.mask
blk9 = ells.blocks.reshape(n, -1, 9)
dself9 = ells.diag.reshape(n, 9)

for l in range(levels):
    timeit(
        f"_level_rows l={l}",
        chain(lambda d9, idx, ot, la, okk, b9, my: asm._level_rows(idx, ot, la, okk, b9, my, d9, l)),
        dself9, ells.idx, otanc[:, :, l], lam, ok, blk9, myanc[:, l],
    )

# row scatter for one coarse level
vals1 = jnp.ones((n, asm.ROW), jnp.float32)
hb0 = jnp.zeros((total + 1, asm.ROW), jnp.float32)
timeit(
    "_row_scatter level-1",
    chain(lambda v, hb, rows: asm._row_scatter(hb, rows, v, rows < total, total)[:n]),
    vals1, hb0, myanc[:, 1],
)
