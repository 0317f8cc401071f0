"""Native host graph builder vs. NumPy fallback vs. existing oracles."""

import numpy as np

from precond_tpu import native
from precond_tpu.models import cloth
from precond_tpu.utils.morton import encode_np


def test_native_builds():
    assert native.have_native(), "g++ toolchain should be available in this image"


def _coo_fixture(seed=0, n=50, m=300):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, m).astype(np.int32)
    cols = rng.integers(0, n, m).astype(np.int32)
    vals = rng.standard_normal((m, 3, 3)).astype(np.float32)
    return n, rows, cols, vals


def _dense_from_ell(n, idx, blocks, mask):
    d = np.zeros((n, n, 3, 3))
    for r in range(n):
        for k in range(idx.shape[1]):
            if mask[r, k]:
                d[r, idx[r, k]] += blocks[r, k]
    return d


def test_coo_to_ell_native_vs_fallback():
    n, rows, cols, vals = _coo_fixture()
    idx_n, blk_n, msk_n = native.coo_to_ell(n, rows, cols, vals)
    # force fallback
    saved, native._lib, native._lib_tried = native._lib, None, True
    try:
        idx_f, blk_f, msk_f = native.coo_to_ell(n, rows, cols, vals)
    finally:
        native._lib, native._lib_tried = saved, True
    d_n = _dense_from_ell(n, idx_n, blk_n, msk_n)
    d_f = _dense_from_ell(n, idx_f, blk_f, msk_f)
    np.testing.assert_allclose(d_n, d_f, rtol=1e-6, atol=1e-6)
    # coalesced duplicates: dense equals direct accumulation
    d_ref = np.zeros_like(d_n)
    for r, c, v in zip(rows, cols, vals):
        d_ref[r, c] += v
    np.testing.assert_allclose(d_n, d_ref, rtol=1e-5, atol=1e-5)


def test_morton_argsort_matches_python_oracle():
    rng = np.random.default_rng(1)
    pos = rng.random((500, 3)).astype(np.float32)
    perm = native.morton_argsort(pos)
    lo, ext = pos.min(0), np.ptp(pos, 0)
    keys = encode_np((pos - lo) / np.where(ext > 0, ext, 1.0))
    assert np.all(np.diff(keys[perm].astype(np.uint64)) >= 0)
    assert np.array_equal(np.sort(perm), np.arange(500))


def test_elements_to_adjacency():
    mesh = cloth.make_grid(6, 6)
    idx, mask = native.elements_to_adjacency_ell(mesh.num_verts, mesh.springs)
    # oracle from python adjacency
    adj = cloth.adjacency_from_springs(mesh.num_verts, mesh.springs)
    for v in range(mesh.num_verts):
        got = sorted(idx[v, mask[v]].tolist())
        assert got == adj[v].tolist()
    # fallback agrees
    saved, native._lib, native._lib_tried = native._lib, None, True
    try:
        idx_f, mask_f = native.elements_to_adjacency_ell(mesh.num_verts, mesh.springs)
    finally:
        native._lib, native._lib_tried = saved, True
    for v in range(mesh.num_verts):
        assert sorted(idx_f[v, mask_f[v]].tolist()) == adj[v].tolist()
