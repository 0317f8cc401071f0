"""Contact fill-in: collision-stencil Hessians as a system-matrix term.

The reference's host simulator assembles contact penalty Hessians INTO the
system CSR it hands the preconditioner (SURVEY §1: the caller passes
`diagonal`/`csrOffDiagonals` already containing them; the EF/EE/VF sets
exist so the PRECONDITIONER can track that same coupling,
SeSchwarzPreconditioner.cpp:67-72). A preconditioner that contains contact
terms the system lacks is actively harmful (measured: 632 vs 448 PCG
iterations against block-Jacobi on a folded sheet), so any contact-enabled
solve needs H to carry the fill-in too.

Per stencil (<=5 verts, weights w, stiffness s, direction d — the rank-1
model of PrepareCollisionHessian, cpp:1201-1227):

    H_c = s * (w w^T) (x) (d d^T)

i.e. block (i, j) = s * w_i * w_j * d d^T. Diagonal parts (i == j) fold
into `diag`; off-diagonal parts are bucketed into a per-row contact ELL
once per step (sort + rank-in-run + one scatter — paid at system-assembly
time, like the reference's host CSR fill-in), so the per-iteration SpMV
term is gather-only.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .stencils import Stencils


class ContactEll(NamedTuple):
    """Compact-row contact off-diagonals + per-vertex diagonal adds.

    Only rows that actually have contacts occupy slots (R = max_rows
    static cap), so the per-iteration SpMV term gathers R*Kc rows and
    scatters R rows — proportional to the contact set, not the mesh."""

    rows: jnp.ndarray     # i32[R] vertex of each compact row (n = padding)
    idx: jnp.ndarray      # i32[R, Kc] column vertex of each slot
    blocks: jnp.ndarray   # f32[R, Kc, 3, 3]
    mask: jnp.ndarray     # bool[R, Kc]
    diag: jnp.ndarray     # f32[N, 3, 3] contact diagonal contributions
    dropped: jnp.ndarray  # i32[] pairs beyond the Kc budget or R row cap


def _stencil_pairs_flat(st: Stencils, n: int):
    """All ordered vertex pairs (i != j) and diagonal terms of the stencils.

    Returns (row i32[P], col i32[P], mat f32[P,3,3], valid bool[P]) for the
    off-diagonals and (ids i32[Q], mat f32[Q,3,3], valid bool[Q]) for the
    diagonal w_i^2 terms.
    """
    w = st.weight                                         # [S,5]
    act = st.valid[:, None] & (jnp.arange(5)[None, :] < st.nverts[:, None])
    d = st.direction                                      # [S,3]
    ddt = st.stiff[:, None, None] * d[:, :, None] * d[:, None, :]  # [S,3,3]

    import numpy as np

    ii = np.arange(5)
    pi, pj = np.meshgrid(ii, ii, indexing="ij")
    off = pi.reshape(-1) != pj.reshape(-1)                # 25 -> 20 live combos
    pi = jnp.asarray(pi.reshape(-1)[off])
    pj = jnp.asarray(pj.reshape(-1)[off])                 # [20]

    row = jnp.take(st.idx, pi, axis=1).reshape(-1)        # [S*20]
    col = jnp.take(st.idx, pj, axis=1).reshape(-1)
    wij = (jnp.take(w, pi, axis=1) * jnp.take(w, pj, axis=1)).reshape(-1)
    pv = (jnp.take(act, pi, axis=1) & jnp.take(act, pj, axis=1)).reshape(-1)
    mat = wij[:, None, None] * jnp.repeat(ddt, 20, axis=0)

    dids = st.idx.reshape(-1)                             # [S*5]
    dw2 = (w * w).reshape(-1)
    dvalid = act.reshape(-1)
    dmat = dw2[:, None, None] * jnp.repeat(ddt, 5, axis=0)
    return (row, col, mat, pv & (row < n) & (col < n)), (dids, dmat, dvalid)


def build_contact_ell(
    st: Stencils, n: int, kc: int = 16, max_rows: int | None = None
) -> ContactEll:
    """Bucket stencil off-diagonals into a compact [R, kc] contact ELL.

    Sort pairs lexicographically, rank unique pairs within each row's run,
    densely number the active rows, scatter into slots; pairs beyond the
    kc or R budgets are counted in `dropped` (the reference's per-vertex
    stencil budget, cpp:187-188, plays the same role upstream). R defaults
    to 5x the stencil count (a row needs a stencil to be active).
    """
    (row, col, mat, valid), (dids, dmat, dvalid) = _stencil_pairs_flat(st, n)
    p = row.shape[0]
    rows_key = jnp.where(valid, row, n)
    cols_key = jnp.where(valid, col, n)
    # lexicographic (row, col) via two stable argsorts: duplicate pairs from
    # overlapping stencils form runs that MERGE into one slot (their blocks
    # accumulate), so kc budgets unique partners, not raw stencil pairs.
    o1 = jnp.argsort(cols_key, stable=True)
    o2 = jnp.argsort(jnp.take(rows_key, o1), stable=True)
    order = jnp.take(o1, o2)
    r_s = jnp.take(rows_key, order)
    c_s = jnp.take(cols_key, order)
    iota = jnp.arange(p, dtype=jnp.int32)
    pair_start = jnp.concatenate(
        [jnp.ones((1,), bool), (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])]
    )
    uid = jnp.cumsum(pair_start.astype(jnp.int32)) - 1    # unique-pair index
    row_start = jnp.concatenate([jnp.ones((1,), bool), r_s[1:] != r_s[:-1]])
    uid_base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(row_start, uid, 0)
    )
    rank = uid - uid_base                                  # unique rank in row
    # dense numbering of ACTIVE rows (compact-row layout)
    rid = jnp.cumsum((row_start & (r_s < n)).astype(jnp.int32)) - 1
    if max_rows is None:
        max_rows = min(n, 5 * st.idx.shape[0])
    r_cap = max_rows
    ok = (r_s < n) & (rank < kc) & (rid < r_cap)
    slot = jnp.where(ok, rid * kc + rank, r_cap * kc)
    idx = jnp.full((r_cap * kc + 1,), 0, jnp.int32)
    msk = jnp.zeros((r_cap * kc + 1,), bool)
    blk = jnp.zeros((r_cap * kc + 1, 9), jnp.float32)
    rows = jnp.full((r_cap + 1,), n, jnp.int32)
    ms = jnp.take(mat.reshape(-1, 9), order, axis=0)
    slot_b, cs_b, ms_b = jax.lax.optimization_barrier((slot, c_s, ms))
    idx = idx.at[slot_b].set(cs_b, mode="drop")
    msk = msk.at[slot_b].set(True, mode="drop")
    blk = blk.at[slot_b].add(ms_b, mode="drop")
    rows = rows.at[jnp.where(ok, rid, r_cap)].set(r_s.astype(jnp.int32), mode="drop")
    dropped = jnp.sum(pair_start & (r_s < n) & ((rank >= kc) | (rid >= r_cap)))

    diag = jnp.zeros((n + 1, 9), jnp.float32)
    tgt = jnp.where(dvalid & (dids < n), dids, n)
    tgt_b, dmat_b = jax.lax.optimization_barrier((tgt, dmat.reshape(-1, 9)))
    diag = diag.at[tgt_b].add(dmat_b, mode="drop")
    return ContactEll(
        rows=rows[:-1],
        idx=idx[:-1].reshape(r_cap, kc),
        blocks=blk[:-1].reshape(r_cap, kc, 3, 3),
        mask=msk[:-1].reshape(r_cap, kc),
        diag=diag[:n].reshape(n, 3, 3),
        dropped=dropped.astype(jnp.int32),
    )


def contact_forces(
    st: Stencils, x: jnp.ndarray, rest_gap: float | jnp.ndarray
) -> jnp.ndarray:
    """Gap-aware penalty forces of the collision stencils. -> f32[N,3].

    The reference leaves force assembly to its host simulator (SURVEY §1:
    the caller's rhs already carries it; the stencils only inform H and M).
    This is that host-side model, consistent with the rank-1 stencil
    Hessian (PrepareCollisionHessian, cpp:1212): penalty energy per stencil

        E = 1/2 * stiff * max(rest_gap - g, 0)^2,   g = d . sum_i w_i x_i

    where g is the signed separation along the repulsion direction (the
    signed weights make sum_i w_i x_i the primitive-A-minus-primitive-B
    closest-point difference, so g = distance at detection time). The
    force f_i = -dE/dx_i = stiff * max(rest_gap - g, 0) * w_i * d pushes
    the primitives apart while g < rest_gap and vanishes smoothly at the
    rest gap; its Gauss-Newton Hessian (freezing d, w) is exactly the
    stiff * w_i w_j * d d^T of collision_terms / build_contact_ell, so the
    solved system is consistent with the rhs. Weights of each primitive
    sum to +/-1, so sum_i f_i = 0 — contacts conserve momentum.
    """
    n = x.shape[0]
    act = st.valid[:, None] & (jnp.arange(5)[None, :] < st.nverts[:, None])
    w = jnp.where(act, st.weight, 0.0)                    # [S,5]
    xs = jnp.take(x, jnp.clip(st.idx, 0, n - 1).reshape(-1), axis=0)
    xs = xs.reshape(st.idx.shape + (3,))                  # [S,5,3]
    g = jnp.einsum("sv,svk,sk->s", w, xs, st.direction)   # [S]
    mag = st.stiff * jnp.maximum(rest_gap - g, 0.0)       # [S]
    fs = (mag[:, None] * w)[:, :, None] * st.direction[:, None, :]  # [S,5,3]
    tgt = jnp.where(act, st.idx, n).reshape(-1)
    tgt_b, fs_b = jax.lax.optimization_barrier((tgt, fs.reshape(-1, 3)))
    return jnp.zeros((n + 1, 3), jnp.float32).at[tgt_b].add(fs_b, mode="drop")[:n]


def stencil_contact_spmv(st: Stencils, x: jnp.ndarray) -> jnp.ndarray:
    """y = H_contact x via the rank-1 stencil factorization — the SpMV-time
    twin of contact_forces' Gauss-Newton Hessian.

    H_c = sum_s stiff_s (w w^T) (x) (d d^T), so per stencil
    t = d . (sum_i w_i x_i) and y_i += stiff * w_i * t * d: 5 gathered and
    5 scattered rows per stencil. The compact-row ELL (contact_spmv) pads
    to R*Kc static slots and gathered 2.6M rows/iter at the bench's 16k-
    stencil fold (~9.5 ms/iter on v5e); this form moves ~160k rows
    (~1-2 ms) and needs no per-step bucketing. Same operator (duplicate
    pairs merge by summation; fp order differs)."""
    n = x.shape[0]
    act = st.valid[:, None] & (jnp.arange(5)[None, :] < st.nverts[:, None])
    w = jnp.where(act, st.weight, 0.0)                    # [S,5]
    ids = jnp.clip(st.idx, 0, n - 1)
    xs = jnp.take(x, ids.reshape(-1), axis=0).reshape(st.idx.shape + (3,))
    t = jnp.einsum("sv,svk,sk->s", w, xs, st.direction)   # [S]
    ys = ((st.stiff * t)[:, None] * w)[:, :, None] * st.direction[:, None, :]
    tgt = jnp.where(act, st.idx, n).reshape(-1)
    tgt_b, ys_b = jax.lax.optimization_barrier((tgt, ys.reshape(-1, 3)))
    return jnp.zeros((n + 1, 3), jnp.float32).at[tgt_b].add(ys_b, mode="drop")[:n]


class ContactSlots(NamedTuple):
    """Prepare-time slot-sorted factorization of the rank-1 stencil SpMV.

    The P = S*5 flat (stencil, vert) slots are sorted by target row ONCE
    at prepare (the stencil set is static per prepare — the reference
    rebuilds its stencil tables per PreparePreconditioner the same way,
    cpp:304-413). The per-iteration apply then needs ZERO scatters: the
    scatter becomes one cumulative sum over row-sorted slot
    contributions plus segment differences at static prefix boundaries.

    Formulation chosen by head-to-head TPU measurement at the collide
    bench's 49k stencils / 245k slots (2026-08-20, in-fori chains):
    scatter-add 4.76 ms, THIS form 3.97 ms, a [P,3] permute-gather
    variant 4.75 ms, a per-component 15-skinny-gather variant 9.12 ms —
    gathers price per ROW (~8 ns at this scale), so the apply does ONE
    wide [P]-row gather of x, one scalar [P] gather of the per-stencil
    coefficients, and three flat cumsum/boundary passes. The remaining
    cost is gather issue rate, not bandwidth.

    All fields are prepare-time constants; the apply needs only x.
    """

    ids: jnp.ndarray     # i32[P] stencil-order clipped gather rows (S*5)
    w5: jnp.ndarray      # f32[S,5] signed weights (0 for inactive slots)
    d: jnp.ndarray       # f32[S,3] stencil directions
    stiff: jnp.ndarray   # f32[S]
    sid: jnp.ndarray     # i32[P] stencil id of each SORTED slot
    wd: jnp.ndarray      # f32[3,P] sorted slot (weight * direction) planes
    bounds: jnp.ndarray  # i32[N+1]: #sorted slots with target row < v


def build_contact_slots(st: Stencils, n: int) -> ContactSlots:
    """Sort the S*5 stencil slots by target row; precompute the gather
    tables and the per-row prefix boundaries (histogram + cumsum —
    searchsorted's binary search costs ~340 ms at 2M queries on TPU).
    Runs at prepare time (jittable, static shapes)."""
    act = st.valid[:, None] & (jnp.arange(5)[None, :] < st.nverts[:, None])
    w = jnp.where(act, st.weight, 0.0)                    # [S,5]
    rows = jnp.where(act, st.idx, n).reshape(-1)          # [P]
    order = jnp.argsort(rows, stable=True).astype(jnp.int32)
    sid = order // 5
    wsl = jnp.take(w.reshape(-1), order)
    dsl = jnp.take(jnp.transpose(st.direction), sid, axis=1)  # [3,P]
    counts = (
        jnp.zeros((n + 1,), jnp.int32)
        .at[rows]
        .add(1, mode="drop")[:n]
    )
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
    )
    return ContactSlots(
        ids=jnp.clip(st.idx, 0, n - 1).reshape(-1),
        w5=w,
        d=st.direction,
        stiff=st.stiff,
        sid=sid,
        wd=wsl[None, :] * dsl,
        bounds=bounds,
    )


def _slot_apply(cs: ContactSlots, x: jnp.ndarray) -> jnp.ndarray:
    """Core wide-gather apply: x f32[N,3] -> y planes f32[3,N].

    fp note: the per-row segments are read off a GLOBAL cumsum as
    boundary differences, whose error is absolute in the running-sum
    magnitude (~|prefix| * eps). That was fatal for the PREPARE-side
    placement (it feeds a factorization — see assembly.segment_place9's
    segmented scan); here the error is remade fresh each iteration and
    perturbs only the SpMV product: measured identical CG iteration
    counts vs the scatter form up to contact stiffness 1e4. Revisit with
    the segmented scan if ever used at penalty stiffness >> 1e5."""
    s = cs.w5.shape[0]
    xs = jnp.take(x, cs.ids, axis=0).reshape(s, 5, 3)     # ONE wide gather
    t = jnp.einsum("sv,svk,sk->s", cs.w5, xs, cs.d)
    a = cs.stiff * t                                      # [S]
    base = jnp.take(a, cs.sid)                            # [P] scalar gather
    outs = []
    for c in range(3):
        ys = base * cs.wd[c]
        csum = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(ys)])
        cb = jnp.take(csum, cs.bounds)
        outs.append(cb[1:] - cb[:-1])
    return jnp.stack(outs)                                # [3,N]


def slot_contact_spmv_t(cs: ContactSlots, xt: jnp.ndarray) -> jnp.ndarray:
    """y^T = H_contact x^T on comp-major [3,N] planes, scatter-free.

    Same operator as stencil_contact_spmv (duplicate pairs merge by
    summation; fp accumulation order differs: segments add in row-sorted
    slot order). The input transposes once to row-major for the wide
    x gather; the output planes are native."""
    return _slot_apply(cs, jnp.transpose(xt))


def slot_contact_spmv(st: Stencils, cs: ContactSlots, x: jnp.ndarray) -> jnp.ndarray:
    """Row-major wrapper ([N,3] in/out).

    `st` is unused (the slots carry everything) and kept for signature
    stability with stencil_contact_spmv."""
    del st
    return jnp.transpose(_slot_apply(cs, x))


def contact_diag(st: Stencils, n: int) -> jnp.ndarray:
    """f32[N,3,3] contact diagonal blocks (for block-Jacobi of the full
    system), without building the off-diagonal ELL."""
    act = st.valid[:, None] & (jnp.arange(5)[None, :] < st.nverts[:, None])
    w = jnp.where(act, st.weight, 0.0)
    d = st.direction
    ddt = st.stiff[:, None, None] * d[:, :, None] * d[:, None, :]
    dmat = (w * w).reshape(-1)[:, None, None] * jnp.repeat(ddt, 5, axis=0)
    tgt = jnp.where(act, st.idx, n).reshape(-1)
    tgt_b, dmat_b = jax.lax.optimization_barrier((tgt, dmat.reshape(-1, 9)))
    out = jnp.zeros((n + 1, 9), jnp.float32).at[tgt_b].add(dmat_b, mode="drop")
    return out[:n].reshape(n, 3, 3)


def contact_spmv(ce: ContactEll, x: jnp.ndarray) -> jnp.ndarray:
    """y += H_contact x: R*Kc-row gather + R-row scatter + diagonal term."""
    n = x.shape[0]
    xg = jnp.take(x, ce.idx.reshape(-1), axis=0).reshape(ce.idx.shape + (3,))
    off = jnp.einsum(
        "rkij,rkj->ri",
        jnp.where(ce.mask[:, :, None, None], ce.blocks, 0.0), xg,
        preferred_element_type=jnp.float32,
    )
    rows_b, off_b = jax.lax.optimization_barrier((ce.rows, off))
    y = jnp.zeros((n + 1, 3), jnp.float32).at[rows_b].add(off_b, mode="drop")[:n]
    dg = jnp.einsum("nij,nj->ni", ce.diag, x, preferred_element_type=jnp.float32)
    return y + dg
