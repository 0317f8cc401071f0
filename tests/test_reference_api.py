"""The reference-shaped facade must reproduce the native pipeline exactly.

Drives precond_tpu.reference_api.SeSchwarzPreconditioner through the
reference's own calling convention (SeSchwarzPreconditioner.h:44-63):
input pointers, AllocatePrecoditioner, PreparePreconditioner with the
CSR triplet + VF sets and prefix counts, Preconditioning per iteration.
"""

import jax.numpy as jnp
import numpy as np

from precond_tpu.config import SchwarzConfig
from precond_tpu.models import cloth
from precond_tpu.models import collision as coll
from precond_tpu.ops.stencils import VfSets, build_stencils
from precond_tpu.reference_api import SeSchwarzPreconditioner
from precond_tpu.solver import SchwarzPreconditioner


def _csr_from_ell(ell):
    """BlockEll -> (adjacency starts/ids, off-diagonal blocks, ranges)."""
    n = ell.num_verts
    idx = np.asarray(ell.idx)
    mask = np.asarray(ell.mask)
    blocks = np.asarray(ell.blocks)
    starts = [0]
    ids, vals = [], []
    for i in range(n):
        cols = idx[i][mask[i]]
        order = np.argsort(cols)
        ids.extend(cols[order].tolist())
        vals.append(blocks[i][mask[i]][order])
        starts.append(len(ids))
    return (
        np.asarray(starts, np.int32),
        np.asarray(ids, np.int32),
        np.concatenate(vals, axis=0).astype(np.float32),
    )


def test_reference_contract_matches_native_pipeline():
    mesh = cloth.make_grid(16, 16, z_wave=0.02)
    n = mesh.num_verts
    ell = cloth.assemble_system(mesh)
    starts, ids, off = _csr_from_ell(ell)
    cfg = SchwarzConfig()

    pre = SeSchwarzPreconditioner(cfg)
    pre.m_positions = np.asarray(mesh.positions)
    pre.m_edges = np.asarray(mesh.edges)
    pre.m_faces = np.asarray(mesh.faces)
    pre.m_neighbours = (starts, ids)
    pre.AllocatePrecoditioner(n, len(mesh.edges), len(mesh.faces))
    pre.PreparePreconditioner(np.asarray(ell.diag), off, starts)

    ref = SchwarzPreconditioner(cfg)
    ref.allocate(mesh.positions)
    ref.prepare(ell)

    rng = np.random.default_rng(3)
    r = rng.standard_normal((n, 3)).astype(np.float32)
    z_facade = np.asarray(pre.Preconditioning(r))
    z_native = np.asarray(ref.apply(jnp.asarray(r)))
    np.testing.assert_allclose(z_facade, z_native, rtol=1e-6, atol=1e-8)


def test_reference_contract_with_collision_sets_and_counts():
    """VF sets with the reference's prefix-count sizing (cpp:306-308)."""
    mesh = cloth.make_grid(16, 16, z_wave=0.0)
    n = mesh.num_verts
    h = 1.0 / 15
    p = np.asarray(mesh.positions).copy()
    fold = p[:, 0] > 0.5
    p[:, 2] = np.where(fold, 0.5 * h, 0.0)
    p[:, 0] = np.where(fold, 1.0 - p[:, 0], p[:, 0]).astype(np.float32)
    pos = jnp.asarray(p.astype(np.float32))
    fj = jnp.asarray(mesh.faces)
    vf, _ = coll.detect_vf_grid(pos, fj, 0.75 * h, 1e3, 2 * n)
    keep = np.asarray(vf.v_id) >= 0
    live = int(keep.sum())
    assert live > 0
    # order live entries first so a prefix count can address them
    order = np.argsort(~keep, kind="stable")
    vf_np = VfSets(*(np.asarray(f)[order] for f in vf))
    vf_counts = np.zeros((n + 1,), np.int32)
    vf_counts[n] = live

    ell = cloth.assemble_system(mesh, positions=p.astype(np.float32))
    starts, ids, off = _csr_from_ell(ell)
    cfg = SchwarzConfig()

    pre = SeSchwarzPreconditioner(cfg)
    pre.m_positions = p.astype(np.float32)
    pre.m_edges = np.asarray(mesh.edges)
    pre.m_faces = np.asarray(mesh.faces)
    pre.m_neighbours = (starts, ids)
    pre.AllocatePrecoditioner(n, len(mesh.edges), len(mesh.faces))
    pre.PreparePreconditioner(
        np.asarray(ell.diag), off, starts,
        vf_sets=vf_np, vf_counts=vf_counts,
    )

    ref = SchwarzPreconditioner(cfg)
    ref.allocate(p.astype(np.float32))
    live_sets = VfSets(*(np.asarray(f)[order][:live] for f in vf))
    stencils = build_stencils(
        jnp.asarray(mesh.edges), fj, vf=type(vf)(*map(jnp.asarray, live_sets))
    )
    ref.prepare(ell, stencils)

    rng = np.random.default_rng(4)
    r = rng.standard_normal((n, 3)).astype(np.float32)
    z_facade = np.asarray(pre.Preconditioning(r))
    z_native = np.asarray(ref.apply(jnp.asarray(r)))
    scale = max(abs(z_native).max(), 1e-12)
    np.testing.assert_allclose(z_facade, z_native, rtol=1e-5, atol=1e-6 * scale)
