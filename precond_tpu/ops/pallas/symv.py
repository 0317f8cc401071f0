"""Pallas TPU kernel: batched dense block matvec  z_b = inv_b @ r_b.

The preconditioner apply's compute core (reference SchwarzLocalXSym,
cpp:1600-1696). XLA's batched-matvec lowering underuses the chip for
[B,96,96]x[B,96]; this kernel streams G inverse blocks per grid step
through VMEM and does the contraction as a VPU multiply-reduce, which is
bandwidth-optimal (the op reads ~36KB per block and does 96^2 MACs — it is
HBM-bound, so the goal is full-rate streaming, not MXU occupancy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DOF = 96


def _symv_kernel(inv_ref, rhs_ref, out_ref):
    # inv_ref: [G, 96, 96], rhs_ref: [G, 96] -> out_ref: [G, 96]
    prod = inv_ref[:] * rhs_ref[:][:, None, :]
    out_ref[:] = jnp.sum(prod, axis=2)


@functools.partial(jax.jit, static_argnames=("group",))
def batched_symv(inv96: jnp.ndarray, rhs: jnp.ndarray, group: int = 16) -> jnp.ndarray:
    """[B,96,96], [B,96] -> [B,96]. B must be a multiple of `group`
    (total capacity is a multiple of 32 banks, so pick group | B)."""
    b = inv96.shape[0]
    if b % group != 0:
        group = 1
    grid = (b // group,)
    return pl.pallas_call(
        _symv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, DOF, DOF), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, DOF), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, DOF), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, DOF), inv96.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * DOF * DOF,
            bytes_accessed=4 * b * (DOF * DOF + 2 * DOF),
            transcendentals=0,
        ),
    )(inv96, rhs)
