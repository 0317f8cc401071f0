"""Micro-probe: TPU pricing of the primitives grid_collision_terms v2
would use (P ~ 1M pair payloads into an M ~ 2.2M-slot banked table).

Answers, on the real chip:
  * is scatter-add priced per ROW or per ELEMENT (9-wide vs scalar)?
  * does sorting targets (+ indices_are_sorted hint) change scatter cost?
  * argsort cost at P (the sorted-cumsum plan needs one);
  * searchsorted with M dense queries (the boundary-table plan);
  * gather of [P,9] rows (payload reorder cost).

All in-jit, k-vs-3k chain differenced.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import jax.numpy as jnp

P = 1 << 20          # ~1M payload rows
M = 1 << 21 | 131072  # ~2.2M target slots


def sync(a):
    return float(np.asarray(a).ravel()[0])


def chain(op, k):
    def run(tgt, val):
        acc = jnp.float32(0)
        for i in range(k):
            out = op(tgt, val)
            acc = acc + out.ravel()[i]
            tgt, val = jax.lax.optimization_barrier((tgt, val))
        return acc

    return jax.jit(run)


def bench(name, op, tgt, val, k=4):
    walls = {}
    for mult in (1, 3):
        f = chain(op, k * mult)
        sync(f(tgt, val))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(tgt, val))
            best = min(best, time.perf_counter() - t0)
        walls[mult] = best
    per = (walls[3] - walls[1]) / (2 * k)
    print(f"{name:44s} {per*1e3:9.3f} ms", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.integers(0, M, P).astype(np.int32))
    tgt_sorted = jnp.sort(tgt)
    val9 = jnp.asarray(rng.standard_normal((P, 9)).astype(np.float32))
    val1 = val9[:, :1]

    def scat9(t, v):
        return jnp.zeros((M, 9), jnp.float32).at[t].add(v)

    def scat1(t, v):
        return jnp.zeros((M, 1), jnp.float32).at[t].add(v)

    def scat9_hint(t, v):
        return jnp.zeros((M, 9), jnp.float32).at[t].add(
            v, indices_are_sorted=True)

    def gath9(t, v):
        return jnp.take(v, t % P, axis=0)

    def argsort_op(t, v):
        return jnp.argsort(t).astype(jnp.float32)[:, None]

    def searchsorted_op(t, v):
        return jnp.searchsorted(
            t, jnp.arange(M, dtype=jnp.int32)
        ).astype(jnp.float32)[:, None]

    def cumsum9(t, v):
        return jnp.cumsum(v, axis=0)

    def cumsum9_t(t, v):
        return jnp.cumsum(v.reshape(9, -1), axis=1).reshape(-1, 9)

    bench("scatter-add [P,9] random", scat9, tgt, val9)
    bench("scatter-add [P,9] sorted", scat9, tgt_sorted, val9)
    bench("scatter-add [P,9] sorted+hint", scat9_hint, tgt_sorted, val9)
    bench("scatter-add [P,1] random", scat1, tgt, val1)
    bench("scatter-add [P,1] sorted+hint",
          lambda t, v: jnp.zeros((M, 1), jnp.float32).at[t].add(
              v, indices_are_sorted=True), tgt_sorted, val1)
    bench("gather [P,9] rows", gath9, tgt, val9)
    bench("cumsum [P,9] (9-minor)", cumsum9, tgt, val9)
    bench("cumsum [9,P] (P-minor)", cumsum9_t, tgt, val9)
    bench("argsort [P] i32", argsort_op, tgt, val9, k=2)
    bench("searchsorted M queries", searchsorted_op, tgt_sorted, val9, k=2)


if __name__ == "__main__":
    main()
