"""A/B the batched 96x96 inverse kernels on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from precond_tpu.ops.batched_inverse import invert_spd_blocks, invert_spd_blocks_panel
from precond_tpu.ops.pallas.chol_inverse import (
    invert_spd_blocks_chol,
    invert_spd_blocks_chol_panel,
)

K = int(os.environ.get("PROF_K", "20"))
B = int(os.environ.get("PROF_B", "2185"))
rng = np.random.default_rng(0)
q = rng.standard_normal((B, 96, 96)).astype(np.float32)
spd = jnp.asarray(np.einsum("bij,bkj->bik", q, q) + 96 * np.eye(96, dtype=np.float32))


def sync(a):
    return float(np.asarray(a).ravel()[0])


def timeit(name, fn):
    f = jax.jit(lambda h: jax.lax.fori_loop(
        0, K, lambda _, x: fn(x * 1.0000001), h)[:, 0, 0][:1])
    try:
        sync(f(spd))
    except Exception as e:
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(spd))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best / K * 1e3:9.3f} ms/op")


print(f"B={B} K={K}")
timeit("floor", lambda h: h)
timeit("xla chol", invert_spd_blocks)
for g in (16, 32, 64):
    timeit(f"pallas ds g={g}", lambda h, g=g: invert_spd_blocks_chol(h, group=g))
timeit("panel xla full-batch", invert_spd_blocks_panel)

# accuracy cross-check on chip
a = np.asarray(invert_spd_blocks_panel(spd[:64]))
b = np.asarray(invert_spd_blocks_chol(spd[:64], group=16))
print("max rel panel-vs-ds:", float(np.abs(a - b).max() / np.abs(b).max()))
