"""A/B the ELL permute forms on the real chip (general-path prepare cost).

Forms: baseline jnp.take on [N,K,3,3] vs flat-row [N,K*9] take (+reshape)
vs fully-flat [N, K*9+K+K+9] single row gather of the whole ELL payload.
In-jit k-vs-3k chains. Run: python scripts/time_permute.py [grid]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from precond_tpu.models import cloth
from precond_tpu.solver import compute_sort_maps
from precond_tpu.ops import blockcsr


def sync(a):
    return float(np.asarray(a).ravel()[0])


def per_iter(fn, args, k):
    def chain(mult):
        @jax.jit
        def run(*a):
            def body(_, x):
                out = fn(*a[:-1], x)
                return jax.lax.optimization_barrier(out)
            return jax.lax.fori_loop(0, k * mult, body, a[-1])
        return run

    outs = {}
    for m in (1, 3):
        c = chain(m)
        sync(c(*args)[0, :1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(c(*args)[0, :1])
            best = min(best, time.perf_counter() - t0)
        outs[m] = best
    return (outs[3] - outs[1]) / (2 * k)


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    mesh = cloth.make_grid(g, g, z_wave=0.02)
    ell = cloth.assemble_system(mesh)
    maps = compute_sort_maps(jnp.asarray(mesh.positions))
    n, kk = ell.idx.shape
    print("device:", jax.devices()[0], "n:", n, "K:", kk, flush=True)
    perm = maps.sorted_to_orig

    def base(blocks, perm, x):
        out = jnp.take(blocks, perm, axis=0)
        return out[:, 0, :, 0] + x

    def flat(blocks, perm, x):
        out = jnp.take(blocks.reshape(n, -1), perm, axis=0)
        return out.reshape(n, kk, 3, 3)[:, 0, :, 0] + x

    x0 = jnp.zeros((n, 3), jnp.float32)
    k = 8
    tb = per_iter(base, (ell.blocks, perm, x0), k)
    print(f"blocks take [N,K,3,3]: {tb*1e3:.2f} ms", flush=True)
    tf = per_iter(flat, (ell.blocks, perm, x0), k)
    print(f"blocks take flat [N,K*9]: {tf*1e3:.2f} ms  ({tb/tf:.2f}x)", flush=True)

    def whole(blocks, idx, mask, diag, perm, x):
        e = blockcsr.BlockEll(diag=diag, idx=idx, blocks=blocks, mask=mask)
        out = blockcsr.permute(e, perm, jnp.argsort(perm).astype(jnp.int32))
        return out.blocks[:, 0, :, 0] + x

    tw = per_iter(whole, (ell.blocks, ell.idx, ell.mask, ell.diag, perm, x0), 4)
    print(f"full permute() today: {tw*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
