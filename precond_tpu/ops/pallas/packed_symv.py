"""Packed-symmetric batched 96x96 symv (the SchwarzLocalXSym hot kernel).

The reference stores each 96x96 domain inverse as 4704 packed floats —
96 diagonal entries + the lower triangle in banked panels — and applies
from that layout with a two-sided symmetric matvec so every stored element
is used for both A[i,j] and A[j,i] (LDLtInverse512 packing cpp:165,1349;
SchwarzLocalXSym apply cpp:1600-1696). The dense TPU apply
(ops/batched_inverse.apply_block_inverse) instead stores all 9216 floats:
at 1M vertices the [B,96,96] read is 1.29 GB/iteration at ~75% of HBM
roofline — the single largest term of the PCG iteration.

This module is the TPU-native packed equivalent. Layout (per block b):

  split A into 48x48 blocks  A = [[A11, A21^T], [A21, A22]]  (A11/A22 sym)

  F  f32[48, 96, B]  batch-minor:  F[i, c, b] =
      c < 48, i > c :  A11[i, c]        (strict lower of A11)
      c < 48, i < c :  A22[c, i]        (strict lower of A22, transposed up)
      c >= 48       :  A21[i, c - 48]   (the full off-diagonal block)
  dg f32[96, B]      the diagonal of A

  -> 48*96 + 96 = 4704 floats per block, the reference's exact count.

Batch-minor is the whole trick: the minor (lane) axis is B and the
sublane axis is 96, so the HBM arrays tile (8,128) with ZERO padding —
a [B,48,48] layout would pad 48 lanes to 128 (2.67x traffic) and the
dense [B,96,96] pads 96 to 128. HBM bytes per block-apply drop from
9216 (+lane padding) to 4704 floats.

The Pallas kernel reads each F block ONCE into VMEM and uses every
element twice (the two-sided trick), which XLA cannot be made to do —
two dot_generals over a shared operand each read it from HBM.
Per grid step over a bk-wide batch slab:

  natural products  (sum over the 96-axis = sublanes, native reduce):
    z1[i] += sum_c  F[i,c]*x[c]        on the A11-lower region
    z2[i] += sum_c  F[i,c]*xr[c]       on the A22-upper + A21 regions
      (xr = x rotated by 48 so lane c carries the partner half's entry)
  transposed products (sum over the 48-axis = major, unrolled FMA chain;
  each step is a free major slice of F, a sublane slice of x broadcast
  across sublanes, an iota-mask select, and one FMA):
    z1[c] += sum_i  F[i,c]*x1[i]       A11-lower + A21 regions
    z2[c] += sum_i  F[i,c]*x2[i]       A22-upper region

Everything is f32; accumulation order differs from the dense einsum so
results match to ~1e-6 relative, and symmetry of the applied operator is
exact by construction (each off-diagonal element is stored once and used
for both orientations).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


class PackedInverse(NamedTuple):
    """Packed symmetric [B,96,96] batch, batch-minor (see module doc)."""

    f: jnp.ndarray   # f32[48, 96, Bp]
    dg: jnp.ndarray  # f32[96, Bp]
    nb: jnp.ndarray  # i32[] true (unpadded) block count — static not needed


class PackedInverseCM(NamedTuple):
    """PackedInverse with the bank DOF convention permuted to component-
    major (DOF c*32+l instead of l*3+c). A distinct type on purpose:
    applying a CM-packed inverse through the row-major apply (or vice
    versa) would be silently wrong, so the two conventions cannot be
    mixed up by isinstance dispatch."""

    f: jnp.ndarray   # f32[48, 96, Bp]
    dg: jnp.ndarray  # f32[96, Bp]
    nb: jnp.ndarray  # i32[]


class DenseInverseCM(NamedTuple):
    """Dense inverse in the comp-major convention, BATCH-MINOR — the
    small-scale twin of PackedInverseCM: below the packed-symv threshold
    the dense table stays VMEM-resident across PCG iterations (Pallas
    would re-stream it from HBM every call), so the comp-major solve
    keeps the dense einsum there. Batch-minor because a batch-major
    [B,...] table is re-laid-out INSIDE the PCG while_loop every
    iteration (the same measured disease as [N,3,3] stencil storage,
    ops/gridstencil.py module doc): measured 0.21 ms/iter in a fori
    chain but 2.2 ms/iter in the while-loop solve at 65k."""

    m: jnp.ndarray   # [3, 32, 3, 32, B] (inverse_dtype)


def pack_sym96(inv96: jnp.ndarray, block_b: int = 256) -> PackedInverse:
    """[B,96,96] symmetric -> PackedInverse (B padded up to block_b)."""
    b = inv96.shape[0]
    bp = -(-b // block_b) * block_b
    a11 = inv96[:, :48, :48]
    a22 = inv96[:, 48:, 48:]
    a21 = inv96[:, 48:, :48]
    i = jnp.arange(48)[:, None]
    c = jnp.arange(48)[None, :]
    t = jnp.where(
        (i > c)[None], a11, jnp.where((i < c)[None], jnp.swapaxes(a22, 1, 2), 0.0)
    )
    fb = jnp.concatenate([t, a21], axis=2)              # [B,48,96]
    f = jnp.transpose(fb, (1, 2, 0))                    # [48,96,B]
    dg = jnp.transpose(
        jnp.diagonal(inv96, axis1=1, axis2=2), (1, 0)
    )                                                   # [96,B]
    if bp != b:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, bp - b)))
        dg = jnp.pad(dg, ((0, 0), (0, bp - b)))
    return PackedInverse(f=f, dg=dg, nb=jnp.int32(b))


def _kernel(f_ref, dg_ref, x_ref, z_ref):
    f = f_ref[...]                                      # [48,96,bk]
    x = x_ref[...]                                      # [96,bk]
    dg = dg_ref[...]
    xr = jnp.concatenate([x[48:], x[:48]], axis=0)      # xr[c] = x[(c+48)%96]
    i_ = jax.lax.broadcasted_iota(jnp.int32, (48, 96, 1), 0)
    c_ = jax.lax.broadcasted_iota(jnp.int32, (48, 96, 1), 1)
    mlow = (c_ < 48) & (i_ > c_)                        # A11 strict lower
    mupg = (c_ < 48) & (i_ < c_) | (c_ >= 48)           # A22-upper + A21
    # natural direction: sublane reductions
    s1a = jnp.sum(jnp.where(mlow, f, 0.0) * x[None], axis=1)    # [48,bk] -> z1
    s1b = jnp.sum(jnp.where(mupg, f, 0.0) * xr[None], axis=1)   # [48,bk] -> z2
    # transposed direction: unrolled 48-step FMA accumulation
    cl = jax.lax.broadcasted_iota(jnp.int32, (96, 1), 0)        # lane-region ids
    acc_a = jnp.zeros_like(x)                                   # [96,bk]
    acc_b = jnp.zeros_like(x)
    for i in range(48):
        row = f[i]                                              # [96,bk]
        x1i = jax.lax.broadcast_in_dim(x[i], (96, x.shape[1]), (1,))
        x2i = jax.lax.broadcast_in_dim(x[48 + i], (96, x.shape[1]), (1,))
        wa = jnp.where(cl < i, x1i, jnp.where(cl >= 48, x2i, 0.0))
        wb = jnp.where((cl > i) & (cl < 48), x2i, 0.0)
        acc_a = acc_a + row * wa
        acc_b = acc_b + row * wb
    z1 = s1a + acc_a[:48] + acc_a[48:] + dg[:48] * x[:48]
    z2 = s1b + acc_b[:48] + dg[48:] * x[48:]
    z_ref[...] = jnp.concatenate([z1, z2], axis=0)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def packed_symv_t(
    packed: PackedInverse,
    xt: jnp.ndarray,  # f32[96, Bp] rhs, batch-minor (pre-transposed)
    block_b: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """z = A x per block from packed storage; [96,Bp] in, [96,Bp] out."""
    f, dg = packed.f, packed.dg
    bp = f.shape[2]
    assert bp % block_b == 0, (bp, block_b)
    grid = (bp // block_b,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((48, 96, block_b), lambda ib: (0, 0, ib)),
            pl.BlockSpec((96, block_b), lambda ib: (0, ib)),
            pl.BlockSpec((96, block_b), lambda ib: (0, ib)),
        ],
        out_specs=pl.BlockSpec((96, block_b), lambda ib: (0, ib)),
        out_shape=jax.ShapeDtypeStruct((96, bp), jnp.float32),
        interpret=interpret,
    )(f, dg, xt)


def packed_symv(
    packed: PackedInverse,
    rhs: jnp.ndarray,  # f32[B, 96] (bank-flat, as apply_block_inverse takes)
    block_b: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for apply_block_inverse on packed storage: [B,96] -> [B,96].

    Transposes the rhs to batch-minor around the kernel (two [B,96]
    streaming passes — 12.6 MB at 1M vertices, negligible next to the
    halved F read).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = rhs.shape[0]
    bp = packed.f.shape[2]
    xt = jnp.transpose(rhs, (1, 0))
    if bp != b:
        xt = jnp.pad(xt, ((0, 0), (0, bp - b)))
    zt = packed_symv_t(packed, xt, block_b=block_b, interpret=interpret)
    return jnp.transpose(zt[:, :b], (1, 0))


_CM_PERM = None


def _cm_perm():
    """DOF permutation lane-major -> component-major: new DOF c*32+l is
    old DOF l*3+c (the bank's 32 3-vectors regrouped into 3 planes)."""
    global _CM_PERM
    if _CM_PERM is None:
        import numpy as np

        c, l = np.meshgrid(np.arange(3), np.arange(32), indexing="ij")
        _CM_PERM = (l * 3 + c).reshape(-1)               # [96] new -> old
    return _CM_PERM


def pack_sym96_cm(inv96: jnp.ndarray, block_b: int = 256) -> PackedInverseCM:
    """pack_sym96 with the bank DOF convention permuted to component-major.

    The comp-major solve path (ops/gridapply.precondition_grid_cm) keeps
    every vector as 3 component planes; permuting the inverse rows/cols
    once at prepare time lets the apply skip all payload interleaves.

    The permutation IS a reshape-transpose (96 = 32 lanes x 3 comps on
    both axes), so the 1.2 GB-at-1M table is re-laid-out by pure
    transposes — an index-gather form would price per element (~7.5 ns)
    and add seconds to prepare."""
    b = inv96.shape[0]
    cm = (
        inv96.reshape(b, 32, 3, 32, 3)
        .transpose(0, 2, 1, 4, 3)
        .reshape(b, 96, 96)
    )
    return PackedInverseCM(*pack_sym96(cm, block_b=block_b))


def dense_cm(inv96: jnp.ndarray) -> DenseInverseCM:
    """[B,96,96] lane-major dense -> DenseInverseCM ([3,32,3,32,B])."""
    b = inv96.shape[0]
    return DenseInverseCM(
        m=inv96.reshape(b, 32, 3, 32, 3).transpose(2, 1, 4, 3, 0)
    )


def dense_symv_cm(inv: DenseInverseCM, rs3: jnp.ndarray) -> jnp.ndarray:
    """[3,B,32] -> [3,B,32] dense comp-plane symv (einsum, VMEM-resident
    batch-minor table below the packed threshold)."""
    return jnp.einsum(
        "cldmb,dbm->cbl", inv.m, rs3.astype(inv.m.dtype),
        preferred_element_type=jnp.float32,
    )


def packed_symv_cm(
    packed: PackedInverseCM,
    rs3: jnp.ndarray,  # f32[3, B, 32] comp-plane bank vectors
    block_b: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[3,B,32] -> [3,B,32] through the batch-minor kernel.

    The kernel's native rhs layout is [96, B] DOF-major; in comp-major
    convention that is just the three [32, B] planes stacked along
    sublanes — one (B,32)->(32,B) transpose per direction (32-granular,
    ~25 us at 1M verts) instead of the [B,96] interleave."""
    assert isinstance(packed, PackedInverseCM), "cm apply needs pack_sym96_cm"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = rs3.shape[1]
    bp = packed.f.shape[2]
    xt = rs3.transpose(0, 2, 1).reshape(96, b)
    if bp != b:
        xt = jnp.pad(xt, ((0, 0), (0, bp - b)))
    zt = packed_symv_t(packed, xt, block_b=block_b, interpret=interpret)
    return zt[:, :b].reshape(3, 32, b).transpose(0, 2, 1)


def packed_symv_ref(packed: PackedInverse, rhs: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp oracle: unpack to dense and einsum (tests only)."""
    f = jnp.transpose(packed.f, (2, 0, 1))              # [Bp,48,96]
    dg = jnp.transpose(packed.dg, (1, 0))               # [Bp,96]
    b = rhs.shape[0]
    t, g = f[:b, :, :48], f[:b, :, 48:]
    i = jnp.arange(48)[:, None]
    c = jnp.arange(48)[None, :]
    a11 = jnp.where((i > c)[None], t, 0.0)
    a11 = a11 + jnp.swapaxes(a11, 1, 2)
    sl22 = jnp.swapaxes(jnp.where((i < c)[None], t, 0.0), 1, 2)
    a22 = sl22 + jnp.swapaxes(sl22, 1, 2)
    top = jnp.concatenate([a11, jnp.swapaxes(g, 1, 2)], axis=2)
    bot = jnp.concatenate([g, a22], axis=2)
    dense = jnp.concatenate([top, bot], axis=1)
    dense = dense + jax.vmap(jnp.diag)(dg[:b])
    return jnp.einsum("bij,bj->bi", dense, rhs)
