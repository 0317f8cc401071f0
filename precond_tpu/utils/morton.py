"""63-bit Morton (Z-order) encoding and spatial sort.

Reproduces the reference bit-interleave exactly (SeMorton64::Encode /
ExpandBits, /root/reference/SeMorton.h:75-101): each axis is clamped to
[0, 2^21-1] after scaling by 2^21, expanded by inserting two zeros after
every bit, and interleaved as (x<<2) + (y<<1) + z, giving a 63-bit key.

TPU-native twist: JAX runs without 64-bit ints by default, so the device
encoder produces the key as a (hi, lo) uint32 pair and sorting uses a
stable lexsort. A NumPy uint64 encoder is provided for host-side setup and
as the oracle the device path is tested against.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PRECISION_BITS = 21  # per axis; 3*21 = 63-bit keys (SeMorton.h:59)


# ---------------------------------------------------------------------------
# NumPy (host) path — exact uint64 reference spec
# ---------------------------------------------------------------------------

def _expand_bits_u64(bits: np.ndarray) -> np.ndarray:
    """Insert two zeros after each of the low 21 bits (SeMorton.h:94-101)."""
    bits = bits.astype(np.uint64)
    bits = (bits | (bits << np.uint64(32))) & np.uint64(0xFFFF00000000FFFF)
    bits = (bits | (bits << np.uint64(16))) & np.uint64(0x00FF0000FF0000FF)
    bits = (bits | (bits << np.uint64(8))) & np.uint64(0xF00F00F00F00F00F)
    bits = (bits | (bits << np.uint64(4))) & np.uint64(0x30C30C30C30C30C3)
    return (bits | (bits << np.uint64(2))) & np.uint64(0x9249249249249249)


def encode_np(unit_pos: np.ndarray) -> np.ndarray:
    """Morton keys (uint64) for points in the unit cube. [N,3] -> [N]."""
    scale = float(1 << PRECISION_BITS)
    q = np.clip(unit_pos * scale, 0.0, scale - 1.0).astype(np.uint64)
    xx = _expand_bits_u64(q[..., 0])
    yy = _expand_bits_u64(q[..., 1])
    zz = _expand_bits_u64(q[..., 2])
    return (xx << np.uint64(2)) + (yy << np.uint64(1)) + zz


# ---------------------------------------------------------------------------
# JAX (device) path — (hi, lo) uint32 pair, no x64 requirement
# ---------------------------------------------------------------------------

def _expand_bits10_u32(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v to bit positions 0,3,...,27."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _expand_axis_u32(v: jnp.ndarray, shift: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """64-bit (hi, lo) of ExpandBits(v) << shift using only uint32 math.

    v holds 21 significant bits. Bit i of v lands at global position
    3*i + shift. Low 11 bits expand into positions shift..30+shift (bit 10
    handled explicitly at position 30), high 10 bits into 33+shift..60+shift.
    """
    lo_field = _expand_bits10_u32(v) | (((v >> 10) & 1) << 30)  # positions 0..30
    hi_field = _expand_bits10_u32(v >> 11)                       # -> global 33..60
    lo = (lo_field << shift).astype(jnp.uint32)
    carry = (lo_field >> (32 - shift)) if shift > 0 else jnp.zeros_like(lo_field)
    hi = ((hi_field << (1 + shift)) | carry).astype(jnp.uint32)
    return hi, lo


def encode_jax(unit_pos: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Morton keys for unit-cube points as (hi, lo) uint32 arrays. [N,3] -> 2x[N]."""
    scale = float(1 << PRECISION_BITS)
    q = jnp.clip(unit_pos * scale, 0.0, scale - 1.0).astype(jnp.uint32)
    hi = jnp.zeros(q.shape[:-1], jnp.uint32)
    lo = jnp.zeros(q.shape[:-1], jnp.uint32)
    for axis, shift in ((0, 2), (1, 1), (2, 0)):  # (x<<2)+(y<<1)+z, SeMorton.h:85
        h, l = _expand_axis_u32(q[..., axis], shift)
        new_lo = lo + l
        hi = hi + h + (new_lo < lo).astype(jnp.uint32)  # carry of the +
        lo = new_lo
    return hi, lo


def argsort_morton(unit_pos: jnp.ndarray) -> jnp.ndarray:
    """Permutation sorting vertices by Morton key (stable), fully on device.

    Replaces the reference's serial std::sort (cpp:238-243) with a device
    sort; cheap enough to run every re-sort frame.
    """
    hi, lo = encode_jax(unit_pos)
    # Stable two-key sort: sort by lo, then stably by hi.
    n = unit_pos.shape[0]
    idx = jnp.argsort(lo, stable=True)
    hi_perm = jnp.take(hi, idx)
    idx2 = jnp.argsort(hi_perm, stable=True)
    return jnp.take(idx, idx2)


def inverse_permutation(perm: jnp.ndarray) -> jnp.ndarray:
    """original->sorted map from sorted->original map (cpp:245-255)."""
    n = perm.shape[0]
    return jnp.zeros((n,), perm.dtype).at[perm].set(jnp.arange(n, dtype=perm.dtype))
