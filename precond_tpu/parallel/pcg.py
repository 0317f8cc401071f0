"""Preconditioned conjugate gradients.

The reference leaves the PCG loop to the host simulator (reconstructed in
SURVEY.md §3.4 from the API comments, SeSchwarzPreconditioner.h:55-63).
Here it is a jitted lax.while_loop; dot products are written with a
reduction hook so the same loop body runs single-chip (identity) and under
shard_map (psum over the mesh axis).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class PcgResult(NamedTuple):
    x: jnp.ndarray          # f32[N,3]
    iterations: jnp.ndarray # i32[]
    rel_residual: jnp.ndarray  # f32[]


def _identity_reduce(x: jnp.ndarray) -> jnp.ndarray:
    return x


def pcg(
    spmv: Callable[[jnp.ndarray], jnp.ndarray],
    precond: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-4,
    max_iters: int = 1000,
    reduce_sum: Callable[[jnp.ndarray], jnp.ndarray] = _identity_reduce,
    check_every: int = 1,
) -> PcgResult:
    """Solve H x = b to ||r|| <= tol * ||b|| (the BASELINE.md criterion).

    spmv/precond map f32[N,3] -> f32[N,3]. reduce_sum reduces a local scalar
    across devices (jax.lax.psum inside shard_map; identity otherwise).

    check_every > 1 tests convergence only every that many iterations
    (runs up to check_every-1 past tolerance — harmless for CG): a
    while_loop with an every-iteration predicate defeats XLA's cross-
    iteration software pipelining of the apply's async operand prefetch,
    while a fixed inner fori block pipelines fully.
    """

    def dot(u, v):
        return reduce_sum(jnp.sum(u * v))

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - spmv(x)
    z = precond(r)
    p = z
    rz = dot(r, z)
    b2 = dot(b, b)
    tol2 = tol * tol * b2

    def cond(carry):
        _, r, _, _, _, it = carry
        return (dot(r, r) > tol2) & (it < max_iters)

    def one(carry):
        x, r, p, z, rz, it = carry
        q = spmv(p)
        alpha = rz / dot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, z, rz_new, it + 1)

    body = one if check_every <= 1 else (
        lambda carry: jax.lax.fori_loop(0, check_every, lambda _, c: one(c), carry)
    )

    x, r, p, z, rz, it = jax.lax.while_loop(cond, body, (x, r, p, z, rz, jnp.asarray(0)))
    rel = jnp.sqrt(dot(r, r) / jnp.maximum(b2, 1e-30))
    return PcgResult(x=x, iterations=it, rel_residual=rel)


def pcg_with_history(
    spmv: Callable[[jnp.ndarray], jnp.ndarray],
    precond: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    num_iters: int,
    x0: Optional[jnp.ndarray] = None,
    reduce_sum: Callable[[jnp.ndarray], jnp.ndarray] = _identity_reduce,
):
    """Fixed-iteration PCG recording the relative-residual curve.

    Returns (x, rel_residuals f32[num_iters]). The curve is the
    convergence-fidelity artifact BASELINE.md asks to compare against the
    reference algorithm (SURVEY.md §4.4).
    """

    def dot(u, v):
        return reduce_sum(jnp.sum(u * v))

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - spmv(x)
    z = precond(r)
    p = z
    rz = dot(r, z)
    bnorm = jnp.sqrt(jnp.maximum(dot(b, b), 1e-30))

    def body(carry, _):
        x, r, p, z, rz = carry
        q = spmv(p)
        alpha = rz / dot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        rel = jnp.sqrt(dot(r, r)) / bnorm
        return (x, r, p, z, rz_new), rel

    (x, r, p, z, rz), curve = jax.lax.scan(body, (x, r, p, z, rz), None, length=num_iters)
    return x, curve


def jacobi_preconditioner(diag: jnp.ndarray) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Block-Jacobi (3x3 diagonal inverse) baseline preconditioner."""
    inv = jnp.linalg.inv(diag)

    def apply(r):
        return jnp.einsum("nij,nj->ni", inv, r)

    return apply
