"""Contact fill-in (ops/contact.py) vs an independent dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from precond_tpu.models import cloth
from precond_tpu.models import collision as coll
from precond_tpu.ops.contact import build_contact_ell, contact_spmv
from precond_tpu.ops.stencils import build_stencils


def _folded_stencils(grid=16):
    mesh = cloth.make_grid(grid, grid, z_wave=0.0, mass=0.002)
    n = mesh.num_verts
    h = 1.0 / (grid - 1)
    p = np.asarray(mesh.positions).copy()
    fold = p[:, 0] > 0.5
    p[:, 2] = np.where(fold, 0.5 * h, 0.0)
    p[:, 0] = np.where(fold, 1.0 - p[:, 0], p[:, 0])
    pos = jnp.asarray(p.astype(np.float32))
    fj, ej = jnp.asarray(mesh.faces), jnp.asarray(mesh.edges)
    vf, _ = coll.detect_vf_grid(pos, fj, 0.75 * h, 1e3, 2 * n)
    ee, _ = coll.detect_ee_grid(pos, ej, 0.75 * h, 1e3, 2 * n)
    st = build_stencils(ej, fj, ee=ee, vf=vf)
    assert int(np.asarray(st.valid).sum()) > 0
    return st, n


def _dense_oracle(st, n):
    """H_c = sum_s stiff (w w^T) (x) (d d^T), built directly from stencils."""
    idx = np.asarray(st.idx)
    w = np.asarray(st.weight)
    nv = np.asarray(st.nverts)
    stiff = np.asarray(st.stiff)
    d = np.asarray(st.direction)
    valid = np.asarray(st.valid)
    h = np.zeros((3 * n, 3 * n), np.float64)
    for s in range(idx.shape[0]):
        if not valid[s]:
            continue
        ddt = stiff[s] * np.outer(d[s], d[s])
        for a in range(nv[s]):
            for b in range(nv[s]):
                i, j = idx[s, a], idx[s, b]
                h[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] += w[s, a] * w[s, b] * ddt
    return h


def test_contact_ell_matches_dense_oracle():
    st, n = _folded_stencils()
    ce = build_contact_ell(st, n, kc=32)
    assert int(ce.dropped) == 0
    h = _dense_oracle(st, n)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 3)).astype(np.float32)
    y_ref = (h @ x.reshape(-1).astype(np.float64)).reshape(n, 3)
    y = np.asarray(contact_spmv(ce, jnp.asarray(x)))
    scale = max(np.abs(y_ref).max(), 1e-12)
    np.testing.assert_allclose(y, y_ref, rtol=0, atol=5e-6 * scale)


def test_stencil_contact_spmv_matches_dense_oracle():
    """The rank-1 stencil SpMV (the production apply form) must equal the
    dense H_c and the unbudgeted ELL's contact diagonal."""
    from precond_tpu.ops.contact import contact_diag, stencil_contact_spmv

    st, n = _folded_stencils()
    h = _dense_oracle(st, n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, 3)).astype(np.float32)
    y_ref = (h @ x.reshape(-1).astype(np.float64)).reshape(n, 3)
    y = np.asarray(stencil_contact_spmv(st, jnp.asarray(x)))
    scale = max(np.abs(y_ref).max(), 1e-12)
    np.testing.assert_allclose(y, y_ref, rtol=0, atol=5e-6 * scale)
    # contact_diag == the ELL's diagonal field
    ce = build_contact_ell(st, n, kc=32)
    np.testing.assert_allclose(
        np.asarray(contact_diag(st, n)), np.asarray(ce.diag), rtol=0, atol=1e-6
    )


def test_slot_contact_spmv_matches_dense_oracle():
    """The slot-sorted scatter-free apply (build_contact_slots +
    slot_contact_spmv) must equal the dense H_c like the scatter form."""
    from precond_tpu.ops.contact import build_contact_slots, slot_contact_spmv

    st, n = _folded_stencils()
    cs = jax.jit(build_contact_slots, static_argnums=1)(st, n)
    h = _dense_oracle(st, n)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((n, 3)).astype(np.float32)
    y_ref = (h @ x.reshape(-1).astype(np.float64)).reshape(n, 3)
    y = np.asarray(jax.jit(slot_contact_spmv)(st, cs, jnp.asarray(x)))
    scale = max(np.abs(y_ref).max(), 1e-12)
    np.testing.assert_allclose(y, y_ref, rtol=0, atol=5e-6 * scale)


def test_contact_ell_budget_drops_counted():
    st, n = _folded_stencils()
    ce = build_contact_ell(st, n, kc=1)
    assert int(ce.dropped) > 0


def _penalty_energy(st, x, rest_gap):
    """Reference energy: 1/2 sum_s stiff * max(rest_gap - g_s, 0)^2."""
    idx = np.asarray(st.idx)
    w = np.asarray(st.weight)
    nv = np.asarray(st.nverts)
    stiff = np.asarray(st.stiff)
    d = np.asarray(st.direction).astype(np.float64)
    valid = np.asarray(st.valid)
    e = 0.0
    for s in range(idx.shape[0]):
        if not valid[s]:
            continue
        g = sum(w[s, a] * d[s] @ x[idx[s, a]] for a in range(nv[s]))
        e += 0.5 * stiff[s] * max(rest_gap - g, 0.0) ** 2
    return e


def test_contact_forces_match_energy_gradient():
    from precond_tpu.ops.contact import contact_forces

    st, n = _folded_stencils()
    rest = 0.75 / 15  # the detection threshold of _folded_stencils
    rng = np.random.default_rng(1)
    mesh = cloth.make_grid(16, 16, z_wave=0.0, mass=0.002)
    p = np.asarray(mesh.positions).astype(np.float64)
    p += 1e-4 * rng.standard_normal(p.shape)  # keep the clamps strictly active
    f = np.asarray(contact_forces(st, jnp.asarray(p.astype(np.float32)), rest))
    # momentum conservation: each primitive's weights sum to +/-1
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=2e-4 * np.abs(f).max())
    # finite-difference gradient of the (frozen-stencil) penalty energy
    eps = 1e-5
    probes = rng.choice(n, size=8, replace=False)
    for v in probes:
        for k in range(3):
            pp, pm = p.copy(), p.copy()
            pp[v, k] += eps
            pm[v, k] -= eps
            g = -(_penalty_energy(st, pp, rest) - _penalty_energy(st, pm, rest)) / (2 * eps)
            assert abs(f[v, k] - g) < 5e-3 * max(np.abs(f).max(), 1.0), (v, k, f[v, k], g)


def test_contact_forces_push_apart():
    """A face-adjacent vertex is pushed along the VF normal (apart)."""
    from precond_tpu.ops.contact import contact_forces

    st, n = _folded_stencils()
    mesh = cloth.make_grid(16, 16, z_wave=0.0, mass=0.002)
    h = 1.0 / 15
    p = np.asarray(mesh.positions).copy()
    fold = p[:, 0] > 0.5
    p[:, 2] = np.where(fold, 0.5 * h, 0.0)
    p[:, 0] = np.where(fold, 1.0 - p[:, 0], p[:, 0])
    f = np.asarray(contact_forces(st, jnp.asarray(p.astype(np.float32)), 0.75 * h))
    assert np.abs(f).max() > 0
    # the fold gap is along z: upper-half vertices feel net +z, lower -z
    upper = fold & (np.abs(f).max(axis=1) > 1e-6)
    lower = ~fold & (np.abs(f).max(axis=1) > 1e-6)
    assert f[upper, 2].mean() > 0
    assert f[lower, 2].mean() < 0


def _pad_terms(terms, extra):
    """Append `extra` INVALID pair rows (crosses the big-path threshold
    without changing the operator)."""
    import jax.numpy as jnp

    z9 = jnp.zeros((extra, 3, 3), jnp.float32)
    return terms._replace(
        pair_a=jnp.concatenate([terms.pair_a, jnp.zeros(extra, jnp.int32)]),
        pair_b=jnp.concatenate([terms.pair_b, jnp.zeros(extra, jnp.int32)]),
        pair_mat=jnp.concatenate([terms.pair_mat, z9]),
        pair_valid=jnp.concatenate(
            [terms.pair_valid, jnp.zeros(extra, bool)]
        ),
    )


def test_grid_collision_terms_big_path_matches_small():
    """The scatter-free segment placement (>32768 pairs) must reproduce
    the scatter branch exactly (same operator, fp-tolerance association)."""
    from precond_tpu.config import SchwarzConfig
    from precond_tpu.ops.gridassembly import grid_collision_terms
    from precond_tpu.ops.stencils import collision_terms
    from precond_tpu.utils import gridmorton as gm

    st, n = _folded_stencils(grid=16)
    cfg = SchwarzConfig()
    s2o, o2s = gm.sort_maps(4)
    mapped = st._replace(
        idx=jnp.where(
            st.valid[:, None] & (jnp.arange(5) < st.nverts[:, None]),
            jnp.take(jnp.asarray(o2s), jnp.clip(st.idx, 0, n - 1)), 0,
        )
    )
    terms = collision_terms(mapped)
    hb2_s, dg_s = jax.jit(
        lambda t: grid_collision_terms(t, cfg, n)
    )(terms)
    assert terms.pair_a.shape[0] <= 32768, "small-path precondition"
    big = _pad_terms(terms, 40000 - terms.pair_a.shape[0])
    hb2_b, dg_b = jax.jit(
        lambda t: grid_collision_terms(t, cfg, n)
    )(big)
    # TIGHT tolerance on purpose: the first segment_place9 (global-cumsum
    # boundary differences) carried absolute error ~|running prefix|*eps
    # (~8e-6 of the max entry) that 1e-5*scale masked — and that error
    # corrupted mass-scale diagonals enough to stall CG at contact
    # stiffness 1e4. The segmented scan matches the scatter build to
    # association-order rounding.
    scale = max(float(jnp.abs(hb2_s).max()), 1e-12)
    np.testing.assert_allclose(
        np.asarray(hb2_b), np.asarray(hb2_s), rtol=0, atol=1e-6 * scale
    )
    np.testing.assert_allclose(
        np.asarray(dg_b), np.asarray(dg_s), rtol=0, atol=1e-6 * scale
    )


def test_assembly_collision_big_path_matches_small():
    """General-path twin: assemble_banked_hessian with the padded (big)
    collision set must equal the scatter-branch assembly."""
    from precond_tpu.config import SchwarzConfig
    from precond_tpu.models import cloth
    from precond_tpu.ops.stencils import collision_terms, stencil_pairs
    from precond_tpu.solver import compute_sort_maps, prepare_with_system

    cfg = SchwarzConfig()
    mesh = cloth.make_grid(16, 16, z_wave=0.0, mass=0.001)
    n = mesh.num_verts
    st, _ = _folded_stencils(grid=16)
    ell = cloth.assemble_system(mesh)
    maps = compute_sort_maps(jnp.asarray(mesh.positions))

    from precond_tpu.ops import hierarchy as hi
    from precond_tpu.ops.assembly import assemble_banked_hessian
    from precond_tpu.ops.blockcsr import permute

    ell_sorted = permute(ell, maps.sorted_to_orig, maps.orig_to_sorted)
    mapped = st._replace(
        idx=jnp.where(
            st.valid[:, None] & (jnp.arange(5) < st.nverts[:, None]),
            jnp.take(maps.orig_to_sorted, jnp.clip(st.idx, 0, n - 1)), 0,
        )
    )
    pairs = stencil_pairs(mapped)
    terms = collision_terms(mapped)
    hier, mm = hi.build_hierarchy(
        ell_sorted.idx, ell_sorted.mask, cfg, pairs, with_merge_map=True
    )
    h_small = jax.jit(
        lambda t: assemble_banked_hessian(ell_sorted, hier, cfg, t, merge_map=mm)
    )(terms)
    assert terms.pair_a.shape[0] <= 32768, "small-path precondition"
    big = _pad_terms(terms, 40000 - terms.pair_a.shape[0])
    h_big = jax.jit(
        lambda t: assemble_banked_hessian(ell_sorted, hier, cfg, t, merge_map=mm)
    )(big)
    scale = max(float(jnp.abs(h_small).max()), 1e-12)
    np.testing.assert_allclose(
        np.asarray(h_big), np.asarray(h_small), rtol=0, atol=1e-6 * scale
    )
