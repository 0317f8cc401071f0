"""Probe: why is the PCG loop floor (dots+axpys only) ~0.5 ms/iter at 65k?

Times the dots-only skeleton with state carried as [N,3], [3,N], and flat
[3N], plus a bare single-axpy loop, to separate layout padding from
per-step loop overhead.
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

K = int(os.environ.get("PROF_K", "50"))
n = int(os.environ.get("PROF_N", str(65536)))
rng = np.random.default_rng(0)
b_n3 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))


def sync(a):
    return float(np.asarray(a).ravel()[0])


def skeleton(b):
    def body(_, carry):
        x, r, p, z, rz = carry
        q = p * 1.000001
        alpha = rz / jnp.sum(p * q)
        x = x + alpha * p
        r = r - alpha * q
        z = r * 1.000001
        rz_new = jnp.sum(r * z)
        p = z + (rz_new / rz) * p
        return (x, r, p, z, rz_new)

    init = (jnp.zeros_like(b), b, b, b, jnp.sum(b * b))
    return jax.lax.fori_loop(0, K, body, init)[0].ravel()[:1]


def axpy_only(b):
    def body(_, carry):
        x, p = carry
        return (x + 1.000001 * p, p * 0.999999)

    return jax.lax.fori_loop(0, K, body, (jnp.zeros_like(b), b))[0].ravel()[:1]


CASES = {
    "skel [N,3]": (skeleton, b_n3),
    "skel [3,N]": (skeleton, b_n3.T),
    "skel flat [3N]": (skeleton, b_n3.ravel()),
    "axpy [N,3]": (axpy_only, b_n3),
    "axpy flat": (axpy_only, b_n3.ravel()),
}

print(f"n={n} K={K}")
for name, (fn, arg) in CASES.items():
    jf = jax.jit(fn)
    sync(jf(arg))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(jf(arg))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:18s} {best / K * 1e3:8.4f} ms/iter", flush=True)
