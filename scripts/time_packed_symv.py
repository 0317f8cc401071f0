"""A/B the packed symv kernel vs the dense einsum on the real chip.

In-jit k-vs-3k repeat chains (dispatch-free), at the 1M-config block count
(~33.8k blocks) and the 65k count (2185). Run on TPU:
    python scripts/time_packed_symv.py [B] [block_b ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from precond_tpu.ops.batched_inverse import apply_block_inverse
from precond_tpu.ops.pallas.packed_symv import pack_sym96, packed_symv_t


def sync(a):
    return float(np.asarray(a).ravel()[0])


def time_chain(build, k):
    fn = build(k)
    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(build, k=32):
    t1 = time_chain(build, k)
    t3 = time_chain(build, 3 * k)
    return (t3 - t1) / (2 * k)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 33824
    blocks = [int(a) for a in sys.argv[2:]] or [128, 256, 512, 1024]
    print("device:", jax.devices()[0], " B =", b)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((b, 96, 96)).astype(np.float32)
    a = jnp.asarray(0.5 * (a + np.swapaxes(a, 1, 2)))
    x0 = jnp.asarray(rng.standard_normal((b, 96)).astype(np.float32))

    # dense einsum chain: z <- einsum(inv, z)
    def dense_build(k):
        @jax.jit
        def run(a, x):
            def body(_, x):
                return apply_block_inverse(a, x)
            return jax.lax.fori_loop(0, k, body, x)[0, :1]
        return lambda: run(a, x0)

    td = per_iter(dense_build)
    gb = b * 96 * 96 * 4 / 1e9
    print(f"dense einsum: {td*1e3:.3f} ms/iter  ({gb/td:.0f} GB/s on {gb:.2f} GB)")

    for bk in blocks:
        packed = pack_sym96(a, block_b=bk)
        bp = packed.f.shape[2]
        xt0 = jnp.pad(jnp.transpose(x0, (1, 0)), ((0, 0), (0, bp - b)))

        def packed_build(k, bk=bk, packed=packed, xt0=xt0):
            @jax.jit
            def run(f, dg, xt):
                p = type(packed)(f, dg, packed.nb)

                def body(_, xt):
                    return packed_symv_t(p, xt, block_b=bk, interpret=False)

                return jax.lax.fori_loop(0, k, body, xt)[0, :1]
            return lambda: run(packed.f, packed.dg, xt0)

        try:
            tp = per_iter(packed_build)
        except Exception as e:  # noqa: BLE001
            print(f"packed bk={bk}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        gbp = (bp * 4704 + 2 * bp * 96) * 4 / 1e9
        print(
            f"packed bk={bk}: {tp*1e3:.3f} ms/iter  "
            f"({gbp/tp:.0f} GB/s on {gbp:.2f} GB)  speedup {td/tp:.2f}x"
        )


if __name__ == "__main__":
    main()
