"""Micro-benchmarks of the hot primitives on the real chip.

Measures, inside jit-repeat chains (dispatch-free internally):
  - batched 96x96 SPD inverse (XLA cholesky path) at B blocks
  - row gather jnp.take on [N,3] (the SpMV/apply bottleneck)
  - batched symv einsum [B,96,96]x[B,96]
  - scatter-add of N rows
Run: python scripts/micro_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from precond_tpu.ops.batched_inverse import invert_spd_blocks


def sync(a):
    return float(np.asarray(a).ravel()[0])


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(f, k):
    """Repeat f k times with data dependency, inside one jit."""

    def g(x, *rest):
        def body(_, x):
            return f(x, *rest)
        return jax.lax.fori_loop(0, k, body, x)

    return jax.jit(g)


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    rng = np.random.default_rng(0)

    # --- dispatch floor ---------------------------------------------------
    x = jnp.ones((8, 128))
    t = timeit(jax.jit(lambda x: x + 1), x)
    print(f"dispatch floor: {t*1e3:.3f} ms")

    # --- batched inverse --------------------------------------------------
    for b in (2208, 8736):
        q = rng.standard_normal((b, 96, 96)).astype(np.float32)
        spd = jnp.asarray(np.einsum("bij,bkj->bik", q, q) + 96 * np.eye(96, dtype=np.float32))
        k = 3
        f = chain(lambda h: invert_spd_blocks(h) + 1e-9, k)
        t = timeit(f, spd) / k
        print(f"xla chol inverse B={b}: {t*1e3:.1f} ms  ({2*b*96**3/t/1e12:.2f} eff-TFLOP/s)")

    # --- gather -----------------------------------------------------------
    n = 65536
    xs = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(n, 12)).astype(np.int32))
    k = 20
    f = chain(lambda x, i: jnp.take(x, i, axis=0).sum(axis=1) * 0.5, k, idx)
    t = timeit(f, xs, idx) / k
    print(f"gather [{n},12] rows: {t*1e3:.3f} ms  ({t/ (n*12)*1e9:.2f} ns/row)")

    idx1 = jnp.asarray(rng.permutation(n).astype(np.int32))
    f = chain(lambda x, i: jnp.take(x, i, axis=0) * 0.5, k, idx1)
    t = timeit(f, xs, idx1) / k
    print(f"gather [{n}] perm rows: {t*1e3:.3f} ms  ({t/n*1e9:.2f} ns/row)")

    # bank gather: 96-wide rows
    xb = xs.reshape(-1, 96)  # [2048, 96]
    idxb = jnp.asarray(rng.integers(0, n // 32, size=(n // 32, 9)).astype(np.int32))
    f = chain(lambda x, i: jnp.take(x, i, axis=0) * 0.5, k, idxb)
    t = timeit(f, xb, idxb) / k
    print(f"bank gather [{n//32},9]x96: {t*1e3:.3f} ms")

    # --- scatter-add ------------------------------------------------------
    tgt = jnp.asarray(rng.integers(0, 4096, size=(n,)).astype(np.int32))
    def scat(x, tgt):
        t2, v = jax.lax.optimization_barrier((tgt, x))
        return jnp.zeros((4096, 3), jnp.float32).at[t2].add(v)
    f = chain(lambda x, tg: scat(x, tg) [tgt % 4096 * 0 + jnp.arange(n) % 4096] , k, tgt)
    # simpler: chain via sum
    f = jax.jit(lambda x, tg: jax.lax.fori_loop(0, k, lambda _, a: scat(a[:n // 16 * 16].repeat(1, axis=0), tg)[tgt].astype(jnp.float32), x))
    # fallback plain single timing
    g = jax.jit(scat)
    t = timeit(g, xs, tgt)
    print(f"scatter-add [{n}]->4096 (single dispatch): {t*1e3:.3f} ms")

    # --- symv -------------------------------------------------------------
    b = 2208
    inv = jnp.asarray(rng.standard_normal((b, 96, 96)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, 96)).astype(np.float32))
    k = 20
    f = chain(lambda r, m: jnp.einsum("bij,bj->bi", m, r, preferred_element_type=jnp.float32), k, inv)
    t = timeit(f, r, inv) / k
    bw = 4 * b * 96 * 96 / t / 1e9
    print(f"einsum symv B={b}: {t*1e3:.3f} ms  ({bw:.0f} GB/s inv-read)")

    # --- hbm stream reference --------------------------------------------
    big = jnp.asarray(rng.standard_normal((2208 * 96 * 96 // 128, 128)).astype(np.float32))
    f = chain(lambda a: a * 1.000001, 20)
    t = timeit(f, big) / 20
    print(f"elementwise stream {big.size*4/1e6:.0f}MB: {t*1e3:.3f} ms ({2*big.size*4/t/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
