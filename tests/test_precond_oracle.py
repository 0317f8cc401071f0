"""Numerical oracle tests (SURVEY.md §4.3-4.4).

The real correctness checks: the preconditioner applied to basis vectors
must be symmetric PSD; exact on a single-domain problem (N <= 32 implies
M⁻¹ = H⁻¹ modulo identity padding, cpp:1365-1367); and it must beat
block-Jacobi inside PCG on cloth systems.
"""

import jax.numpy as jnp
import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.ops import blockcsr
from precond_tpu.parallel.pcg import jacobi_preconditioner, pcg
from precond_tpu.solver import SchwarzPreconditioner


def _setup(nx, ny, **kw):
    mesh = cloth.make_grid(nx, ny, z_wave=0.02, **kw)
    ell = cloth.assemble_system(mesh)
    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell)
    return mesh, ell, pre


def _explicit_minv(pre, n):
    cols = []
    for i in range(3 * n):
        e = np.zeros((n, 3), np.float32)
        e[i // 3, i % 3] = 1.0
        cols.append(np.asarray(pre.apply(jnp.asarray(e))).reshape(-1))
    return np.stack(cols, axis=1)


def test_single_domain_exact():
    # 5x5 grid = 25 verts <= 32: one domain, one level -> apply == H^{-1} r.
    mesh, ell, pre = _setup(5, 5)
    n = mesh.num_verts
    assert not bool(pre.state.overflow)
    dense = np.asarray(blockcsr.to_dense(ell))
    rng = np.random.default_rng(0)
    r = rng.standard_normal((n, 3)).astype(np.float32)
    z = np.asarray(pre.apply(jnp.asarray(r))).reshape(-1)
    z_ref = np.linalg.solve(dense.astype(np.float64), r.reshape(-1).astype(np.float64))
    np.testing.assert_allclose(z, z_ref, rtol=2e-4, atol=1e-8)


def test_minv_symmetric_psd_multilevel():
    # 12x12 grid = 144 verts -> 2 levels; M^{-1} must be symmetric PSD.
    mesh, ell, pre = _setup(12, 12)
    n = mesh.num_verts
    assert not bool(pre.state.overflow)
    minv = _explicit_minv(pre, n).astype(np.float64)
    asym = np.abs(minv - minv.T).max() / np.abs(minv).max()
    assert asym < 1e-5, f"asymmetry {asym}"
    evals = np.linalg.eigvalsh(0.5 * (minv + minv.T))
    assert evals.min() > -1e-10 * evals.max(), f"min eig {evals.min()}"
    # applying M^{-1} is linear: apply(a+b) == apply(a)+apply(b)
    rng = np.random.default_rng(1)
    a = rng.standard_normal((n, 3)).astype(np.float32)
    b = rng.standard_normal((n, 3)).astype(np.float32)
    zab = np.asarray(pre.apply(jnp.asarray(a + b)))
    za = np.asarray(pre.apply(jnp.asarray(a)))
    zb = np.asarray(pre.apply(jnp.asarray(b)))
    np.testing.assert_allclose(zab, za + zb, rtol=1e-4, atol=1e-5)


def test_pcg_schwarz_beats_jacobi():
    mesh, ell, pre = _setup(24, 24)
    n = mesh.num_verts
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    spmv = lambda x: blockcsr.spmv(ell, x)
    res_schwarz = pcg(spmv, pre.apply, b, tol=1e-4, max_iters=500)
    res_jacobi = pcg(spmv, jacobi_preconditioner(ell.diag), b, tol=1e-4, max_iters=500)

    assert float(res_schwarz.rel_residual) <= 1e-4
    assert float(res_jacobi.rel_residual) <= 1e-4
    it_s, it_j = int(res_schwarz.iterations), int(res_jacobi.iterations)
    assert it_s < it_j, f"schwarz {it_s} vs jacobi {it_j}"
    # solution actually solves the system
    x = res_schwarz.x
    err = np.asarray(blockcsr.spmv(ell, x) - b)
    assert np.linalg.norm(err) <= 1.1e-4 * np.linalg.norm(np.asarray(b))


def test_pcg_converges_on_stiff_system():
    # The production regime: feather-weight vertices + stiff springs
    # (block condition numbers ~1e6-1e7). Guards against numerically
    # fragile factorizations — an f32 Gauss-Jordan inverse passed every
    # well-conditioned test but stalled CG here (see batched_inverse.py).
    mesh = cloth.make_grid(32, 32, z_wave=0.02, mass=1e-4)
    ell = cloth.assemble_system(mesh)
    pre = SchwarzPreconditioner(SchwarzConfig())
    pre.allocate(mesh.positions)
    pre.prepare(ell)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    res = pcg(lambda x: blockcsr.spmv(ell, x), pre.apply, b, tol=1e-4, max_iters=1000)
    assert float(res.rel_residual) <= 1e-4
    assert int(res.iterations) < 400, int(res.iterations)


def test_bf16_inverse_still_converges():
    # bf16-stored domain inverses: symmetric by entrywise rounding, so CG
    # remains valid; allow a modest iteration penalty vs f32.
    # Pinned to the reference per-axis sort: bf16 is marginal at this
    # stiffness (cond ~1e7) and under the isotropic default's different
    # clustering the rounded M loses positive-definiteness and CG
    # diverges — bf16 inverse storage is validated (and recommended)
    # only for milder regimes (config.inverse_dtype docs).
    mesh = cloth.make_grid(24, 24, z_wave=0.02, mass=1e-3)
    ell = cloth.assemble_system(mesh)
    rng = np.random.default_rng(6)
    b = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
    its = {}
    for dtype in ("float32", "bfloat16"):
        pre = SchwarzPreconditioner(
            SchwarzConfig(inverse_dtype=dtype, morton_normalization="per_axis")
        )
        pre.allocate(mesh.positions)
        pre.prepare(ell)
        res = pcg(lambda x: blockcsr.spmv(ell, x), pre.apply, b, tol=1e-4, max_iters=1000)
        assert float(res.rel_residual) <= 1e-4, dtype
        its[dtype] = int(res.iterations)
    assert its["bfloat16"] <= 2 * its["float32"] + 10, its


def test_pcg_iterations_stable_across_sizes():
    # Multilevel Schwarz keeps iteration counts roughly flat as N grows
    # (the whole point of the hierarchy).
    iters = []
    for nx in (16, 32):
        mesh, ell, pre = _setup(nx, nx)
        rng = np.random.default_rng(3)
        b = jnp.asarray(rng.standard_normal((mesh.num_verts, 3)).astype(np.float32))
        res = pcg(lambda x: blockcsr.spmv(ell, x), pre.apply, b, tol=1e-4, max_iters=500)
        assert float(res.rel_residual) <= 1e-4
        iters.append(int(res.iterations))
    assert iters[1] <= 3 * iters[0] + 10, iters


def test_onehot_restriction_equals_scatter():
    """The one-hot broadcast-reduce restriction must reproduce the
    scatter form (same sums, FP-tolerance)."""
    import jax.numpy as jnp
    from precond_tpu.models import cloth
    from precond_tpu.ops.apply import restrict_residual_onehot, restrict_residual_scatter
    from precond_tpu.solver import compute_sort_maps, prepare_with_system

    cfg = SchwarzConfig()
    mesh = cloth.make_grid(40, 40, z_wave=0.02)
    n = mesh.num_verts
    ell = cloth.assemble_system(mesh)
    maps = compute_sort_maps(jnp.asarray(mesh.positions))
    state, _ = prepare_with_system(ell, maps, cfg)
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    a = np.asarray(restrict_residual_onehot(r, state, cfg, n))
    b = np.asarray(restrict_residual_scatter(r, state.going_next, cfg, n))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)  # FP sum order


def test_onehot_prolong_equals_gather():
    """The slot-scatter + transposed one-hot prolongation must reproduce
    the ancestor-gather form on meshes incl. partial end-of-level banks."""
    import jax.numpy as jnp
    from precond_tpu.models import cloth
    from precond_tpu.ops.apply import (
        prolong_and_collect_gather,
        prolong_and_collect_onehot,
    )
    from precond_tpu.solver import compute_sort_maps, prepare_with_system

    cfg = SchwarzConfig()
    for g in (12, 40):  # 12x12 hits the end-of-level anchor case
        mesh = cloth.make_grid(g, g, z_wave=0.02)
        n = mesh.num_verts
        ell = cloth.assemble_system(mesh)
        maps = compute_sort_maps(jnp.asarray(mesh.positions))
        state, _ = prepare_with_system(ell, maps, cfg)
        total = cfg.level_offsets(n)[-1]
        rng = np.random.default_rng(7)
        mz = jnp.asarray(rng.standard_normal((total, 3)).astype(np.float32))
        a = np.asarray(prolong_and_collect_onehot(mz, state, cfg, n))
        b = np.asarray(
            prolong_and_collect_gather(
                mz, state.ancestors, state.going_next, cfg, n
            )
        )
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
