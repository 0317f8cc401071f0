"""Scatter-free banked-Hessian assembly for structured power-of-two grids.

Reference semantics (PrepareHessian cpp:1229-1345 + the level-(λ+1)..top
diagonal compensation, cpp:1297-1343): a neighbor pair merges at the first
level λ where both ancestors share a 32-node bank; its off-diagonal block
lands symmetrically in that bank, its value is also added to the climbing
vertex's DIAGONAL at every level above λ, and the self diagonal lands at
every level. The general path (ops/assembly.py) resolves λ per pair with
gathered ancestor tables and places rows with one-hot chain reductions.

On a tile-ordered grid (utils/gridmorton.py) every quantity above is a
STATIC function of the vertex's grid position and the spring's (di, dj)
offset — the hierarchy is the arithmetic progression ops/gridapply.py
proves, node ids at level m are trank >> 5(m-1), and the merge level of a
pair is the first m with trank_v >> 5m == trank_u >> 5m. So assembly
becomes, per direction:

  * level 0: a static [32,32] lane band mask times the block values —
    one fused broadcast-multiply over the fine [B0,96,96] output;
  * level m >= 1: the vertices crossing a level-m region boundary in a
    given direction form a static mask, all of a region's crossers meet
    the SAME neighbor node, so the contribution is a masked reshape-sum
    placed at one static column lane per node;
  * diagonal chains: running masked sums of block values, reshape-summed
    per level and placed on static diagonal lanes.

No gathers, no scatters, no index arrays at runtime beyond [D,N] int8
masks; everything streams. The pattern is precomputed host-side once per
(k, offsets, config) and cached.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SchwarzConfig
from ..utils import gridmorton as gm
from .hierarchy import BANK


class GridPattern(NamedTuple):
    """Static assembly pattern (host numpy; moved to device by the caller)."""

    band: np.ndarray        # f32[D,32,32]  level-0 in-tile lane bands
    lam: np.ndarray         # i8[D,N]  merge level per (direction, vertex); -1 invalid
    sc: np.ndarray          # i8[D,N]  crossing-subcase code (3*(si+1)+(sj+1)); -1 none
    # (d, m, sc_code, col i32[s_m]) one entry per nonempty off-diag reduction
    offdiag: Tuple[Tuple[int, int, int, np.ndarray], ...]
    sizes: Tuple[int, ...]  # active nodes per level
    fill: np.ndarray        # f32[B,96] 1 where the node row is padding (identity fill)


def _pattern_nd(dims, s2o, o2s, offsets, cfg: SchwarzConfig) -> GridPattern:
    """Dimension-generic static pattern over any analytic tile ordering.

    dims: vertex extents per axis (row-major flattening). s2o/o2s: tile
    slot <-> row-major vertex maps whose rank interleave yields nested
    dyadic boxes (utils/gridmorton.py 2-D, utils/boxmorton.py 3-D).
    """
    nd = len(dims)
    n = int(np.prod(dims))
    levels = cfg.num_levels(n)
    caps = cfg.level_capacities(n)
    strides = [int(np.prod(dims[a + 1 :])) for a in range(nd)]
    coords = [(s2o // strides[a]) % dims[a] for a in range(nd)]   # [nd][N]
    trank = np.arange(n, dtype=np.int64) // BANK   # tile rank per slot
    lane = np.arange(n, dtype=np.int64) % BANK

    sizes = [n]
    for _ in range(1, levels):
        sizes.append(max(sizes[-1] // BANK, 1))

    D = len(offsets)
    band = np.zeros((D, BANK, BANK), np.float32)
    lam8 = np.full((D, n), -1, np.int8)
    sc8 = np.full((D, n), -1, np.int8)
    offdiag = []

    for d, off in enumerate(offsets):
        u = [coords[a] + off[a] for a in range(nd)]
        valid = np.ones(n, bool)
        for a in range(nd):
            valid &= (u[a] >= 0) & (u[a] < dims[a])
        uc = [np.clip(u[a], 0, dims[a] - 1) for a in range(nd)]
        u_flat = sum(uc[a] * strides[a] for a in range(nd))
        u_slot = o2s[u_flat].astype(np.int64)
        tu, lu = u_slot // BANK, u_slot % BANK

        # merge level: first m >= 0 with trank >> 5m == tu >> 5m
        lam = np.full(n, -1, np.int64)
        for m in range(levels - 1, -1, -1):
            lam = np.where((trank >> (5 * m)) == (tu >> (5 * m)), m, lam)
        assert np.all(lam[valid] >= 0), "pair fails to merge"
        lam8[d] = np.where(valid, lam, -1).astype(np.int8)

        sel0 = valid & (lam == 0)
        band[d][lane[sel0], lu[sel0]] = 1.0
        # the band must be a pure function of the lane (same across tiles)
        assert band[d].sum() * (n // BANK) >= sel0.sum()

        for m in range(1, levels):
            shift = 5 * (m - 1)
            p = trank >> shift                     # level-m within-level id
            cv = (tu >> shift) % BANK              # neighbor node's lane
            selm = valid & (lam == m)
            if not selm.any():
                continue
            # crossing direction measured at THIS level's region geometry
            # (regions are aligned dyadic boxes; node 0 starts at the
            # origin, so its extents give the uniform region size)
            node0 = p == 0
            r_ext = [int(coords[a][node0].max()) + 1 for a in range(nd)]
            code = np.zeros(n, np.int64)
            for a in range(nd):
                sa = np.sign(uc[a] // r_ext[a] - coords[a] // r_ext[a])
                code = code * 3 + (sa + 1)
            code = code.astype(np.int8)
            sc8[d] = np.where(selm, code, sc8[d])
            for c in np.unique(code[selm]):
                sel = selm & (code == c)
                ps, cs = p[sel], cv[sel]
                # each region meets exactly one neighbor node per subcase
                cmin = np.full(sizes[m], BANK, np.int64)
                cmax = np.full(sizes[m], -1, np.int64)
                np.minimum.at(cmin, ps, cs)
                np.maximum.at(cmax, ps, cs)
                assert np.all(cmin[ps] == cmax[ps]), (d, m, c)
                col = np.zeros(sizes[m], np.int32)
                col[ps] = cs
                offdiag.append((d, m, int(c), col))

    offs = [0]
    for c in caps:
        offs.append(offs[-1] + c)
    nodes = np.arange(offs[-1])
    inactive = np.zeros(offs[-1], bool)
    for l in range(levels):
        seg = nodes[offs[l] : offs[l + 1]] - offs[l]
        inactive[offs[l] : offs[l + 1]] = seg >= sizes[l]
    fill = np.repeat(inactive.reshape(-1, BANK), 3, axis=1).astype(np.float32)

    return GridPattern(band, lam8, sc8, tuple(offdiag), tuple(sizes), fill)


@functools.lru_cache(maxsize=8)
def grid_pattern(k: int, offsets: Tuple[Tuple[int, int], ...], cfg: SchwarzConfig) -> GridPattern:
    side = 1 << k
    assert gm.supported(side, side)
    s2o, o2s = gm.sort_maps(k)                     # tile slot <-> grid vertex
    return _pattern_nd((side, side), s2o, o2s, offsets, cfg)


@functools.lru_cache(maxsize=8)
def box_pattern(dims: Tuple[int, int, int],
                offsets: Tuple[Tuple[int, int, int], ...],
                cfg: SchwarzConfig) -> GridPattern:
    from ..utils import boxmorton as bm

    assert bm.supported(*dims)
    s2o, o2s = bm.sort_maps(*dims)
    return _pattern_nd(dims, s2o, o2s, offsets, cfg)


def arith_parent(x: jnp.ndarray, cfg: SchwarzConfig, n: int) -> jnp.ndarray:
    """going_next as pure arithmetic (the grid hierarchy, no table gather).

    Level-l node j's parent is offs[l+1] + j//32 while j is active; padded
    and top-level nodes map to the `total` sentinel (ops/gridapply.py)."""
    from .gridapply import grid_level_sizes

    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    sizes = grid_level_sizes(n, cfg)
    total = offs[-1]
    out = jnp.full(x.shape, total, x.dtype)
    for l in range(levels - 1):
        j = x - offs[l]
        ok = (x >= offs[l]) & (x < offs[l + 1]) & (j < sizes[l])
        out = jnp.where(ok, offs[l + 1] + j // BANK, out)
    return out


def grid_collision_terms(
    collisions, cfg: SchwarzConfig, n: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collision contributions on the arithmetic grid hierarchy.

    On a tile-ordered grid every bank is already ONE fully-merged cluster,
    so stencil-induced connectivity cannot change clustering — the
    hierarchy stays arithmetic with contacts (tests/test_gridprep.py) and
    only the Hessian entries move: symmetric pair blocks at the first
    common bank, parent-diagonal compensation one level up
    (AdditionalSchwarzHessian2, cpp:1164-1199), w² diagonals along the
    full ancestor chain (cpp:1201-1252). All climbs are arithmetic.

    Returns (rows f32[total, 288] of sparse row payloads to add after the
    static assembly, dg_add f32[n, 3, 3] extra fine diagonals to fold into
    the streaming diagonal before it)."""
    from .assembly import ROW, _scalar_scatter9, segment_place9

    levels = cfg.num_levels(n)
    offs = cfg.level_offsets(n)
    total = offs[-1]

    # climb both pair endpoints to the first common bank (arithmetic)
    my, ot = collisions.pair_a, collisions.pair_b
    lam = jnp.zeros(my.shape, jnp.int32)
    for _ in range(levels):
        same = (my // BANK) == (ot // BANK)
        step = (~same) & (lam < levels)
        my = jnp.where(step, arith_parent(my, cfg, n), my)
        ot = jnp.where(step, arith_parent(ot, cfg, n), ot)
        lam = lam + step.astype(jnp.int32)
    merged = ((my // BANK) == (ot // BANK)) & (lam < levels) & (my < total)
    okc = merged & collisions.pair_valid
    pm9 = collisions.pair_mat.reshape(-1, 9)
    from .assembly import BIG_PAIR_THRESHOLD

    big = int(collisions.pair_a.shape[0]) > BIG_PAIR_THRESHOLD

    def scat(h, node, lane, m9, ok):
        tgt = jnp.where(ok, node * BANK + lane, total * BANK)
        t, v = jax.lax.optimization_barrier((tgt, m9))
        return h.at[t].add(v, mode="drop")

    if big:
        # Scatter-free placement (assembly.segment_place9): the 9-wide
        # slot scatters below price per element (~11 ns) and cost 236 ms
        # of the collide-256 prepare at ~1M pairs; the sorted-cumsum
        # dense form is ~3x cheaper (scripts/probe_scatter_cost.py).
        diag_dense = segment_place9(
            collisions.diag_ids, collisions.diag_mat.reshape(-1, 9),
            collisions.diag_valid, total,
        )                                                 # [total, 9]
        slots = jnp.concatenate(
            [my * BANK + ot % BANK, ot * BANK + my % BANK]
        )
        pair_dense = segment_place9(
            slots, jnp.concatenate([pm9, pm9]),
            jnp.concatenate([okc, okc]), total * BANK,
        )                                                 # [total*32, 9]
        # parent diagonal compensation one level further up
        # (cpp:1184-1198): on the ARITHMETIC hierarchy, parent(x) =
        # offs[l+1] + (x-offs[l])//32, so "sum each node's pair blocks
        # and push to its parent" is a lane reduce + per-level 32-child
        # reshape-sum — no scatters at all. Padded nodes hold zero
        # pairsum, so summing every capacity group is exact.
        pairsum = pair_dense.reshape(total, BANK, 9).sum(axis=1)
        comp = jnp.zeros((total, 9), jnp.float32)
        for l in range(levels - 1):
            seg = pairsum[offs[l] : offs[l + 1]]
            red = seg.reshape(-1, BANK, 9).sum(axis=1)    # [cap_l/32, 9]
            take = min(red.shape[0], offs[l + 2] - offs[l + 1])
            comp = comp.at[offs[l + 1] : offs[l + 1] + take].add(red[:take])
        hb9 = jnp.pad(pair_dense, ((0, BANK), (0, 0)))    # + dump bank
        addl = diag_dense + comp                          # [total, 9]
        addl9 = addl.reshape(-1)
    else:
        addl9 = jnp.zeros((total * 9,), jnp.float32)
        addl9 = _scalar_scatter9(
            addl9, collisions.diag_ids, collisions.diag_mat.reshape(-1, 9),
            collisions.diag_valid, total,
        )
        # 9-wide slot scatters: slot = node*32 + column lane. The 288-wide
        # row payloads of the general path write 32x the elements — at the
        # bench fold's 16k stencils (327k pairs) the row form alone was
        # ~200 ms of collide-config prepare.
        hb9 = jnp.zeros(((total + 1) * BANK, 9), jnp.float32)
        hb9 = scat(hb9, my, ot % BANK, pm9, okc)
        hb9 = scat(hb9, ot, my % BANK, pm9, okc)
        # parent diagonal compensation one level further up (cpp:1184-1198)
        pmy = arith_parent(jnp.minimum(my, total), cfg, n)
        pot = arith_parent(jnp.minimum(ot, total), cfg, n)
        ok_up = okc & (pmy < total)
        addl9 = _scalar_scatter9(addl9, pmy, pm9, ok_up, total)
        addl9 = _scalar_scatter9(addl9, pot, pm9, ok_up, total)

    # coarse-node additional pushed along the full ancestor chain
    # (cpp:1236-1252); fine part folds into the streaming diagonal
    coarse_off = offs[1] if levels > 1 else total
    if coarse_off < total:
        ids = jnp.arange(coarse_off, total, dtype=jnp.int32)
        cmat9 = addl9[coarse_off * 9 : total * 9].reshape(-1, 9)
        for _ in range(levels):
            hb9 = scat(hb9, ids, ids % BANK, cmat9, ids < total)
            ids = arith_parent(jnp.minimum(ids, total), cfg, n)
    # [total*32, 9] slots -> [total, 288] node rows (ci major, then j, cj)
    hb2 = (
        hb9[: total * BANK]
        .reshape(total, BANK, 3, 3)
        .transpose(0, 2, 1, 3)
        .reshape(total, ROW)
    )
    dg_add = addl9[: n * 9].reshape(n, 3, 3)
    return hb2, dg_add


def pin_grid_blocks(
    diag_rows: jnp.ndarray,
    dirs_rows: jnp.ndarray,
    offsets: Tuple[Tuple[int, int], ...],
    grid: Tuple[int, int],
    pinned: jnp.ndarray,
    big_diag: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-major twin of gridstencil.pin_vertices: zero every direction
    block with a pinned endpoint, big SPD mass diagonal on pinned rows."""
    nx, ny = grid
    pad = max(max(abs(di), abs(dj)) for di, dj in offsets) if offsets else 0
    pg = jnp.pad(pinned.reshape(nx, ny), ((pad, pad), (pad, pad)))
    masks = []
    for di, dj in offsets:
        src = pg[pad + di : pad + di + nx, pad + dj : pad + dj + ny].reshape(-1)
        masks.append(~(pinned | src))
    dirs = dirs_rows * jnp.stack(masks).astype(dirs_rows.dtype)[:, :, None, None]
    eye = jnp.eye(3, dtype=diag_rows.dtype)
    diag = jnp.where(pinned[:, None, None], big_diag * eye[None], diag_rows)
    return diag, dirs


def assemble_grid_hessian(
    diag_rows: jnp.ndarray,   # f32[N,3,3] grid (row-major) vertex order
    dirs_rows: jnp.ndarray,   # f32[D,N,3,3] grid order, per canonical direction
    offsets: Tuple[Tuple[int, int], ...],
    k: int,
    cfg: SchwarzConfig,
    collisions=None,          # Optional CollisionTerms in TILE-order ids
) -> jnp.ndarray:
    """All domain Hessians f32[B,96,96]; bit-compatible with the general
    assemble_banked_hessian on grid meshes (tests/test_gridprep.py)."""
    n = diag_rows.shape[0]
    pat = grid_pattern(k, tuple(map(tuple, offsets)), cfg)
    D = len(offsets)
    A = [gm.grid_to_morton(dirs_rows[d].reshape(n, 9), k) for d in range(D)]
    dg = gm.grid_to_morton(diag_rows.reshape(n, 9), k)
    return _assemble_core(dg, A, pat, cfg, collisions)


def assemble_box_hessian(
    diag_rows: jnp.ndarray,   # f32[N,3,3] box (row-major) vertex order
    dirs_rows: jnp.ndarray,   # f32[D,N,3,3] box order, per direction
    offsets: Tuple[Tuple[int, int, int], ...],
    dims: Tuple[int, int, int],
    cfg: SchwarzConfig,
    collisions=None,
) -> jnp.ndarray:
    """3-D twin of assemble_grid_hessian for tet boxes (utils/boxmorton.py);
    bit-compatible with the general path (tests/test_boxprep.py)."""
    from ..utils import boxmorton as bm

    n = diag_rows.shape[0]
    pat = box_pattern(tuple(dims), tuple(map(tuple, offsets)), cfg)
    D = len(offsets)
    A = [bm.box_to_morton(dirs_rows[d].reshape(n, 9), *dims) for d in range(D)]
    dg = bm.box_to_morton(diag_rows.reshape(n, 9), *dims)
    return _assemble_core(dg, A, pat, cfg, collisions)


def _assemble_core(dg, A, pat: GridPattern, cfg: SchwarzConfig, collisions=None):
    """Static assembly from tile-order per-direction blocks (any dims)."""
    n = dg.shape[0]
    levels = cfg.num_levels(n)
    caps = cfg.level_capacities(n)
    D = len(A)
    B0 = n // BANK

    crows = None
    if collisions is not None:
        crows, dg_add = grid_collision_terms(collisions, cfg, n)
        dg = dg + dg_add.reshape(n, 9)
    # Materialize the tile-order crossings ONCE as a single stacked buffer
    # at its natural layout before fan-out: the fine dot_general and the
    # coarse mask-multiply sweeps pull the shared A operands toward
    # incompatible layouts, and letting XLA relayout inside the fused
    # consumers measured +1.0 ms at 65k on v5e. Stacking before the
    # barrier (instead of keeping 13 separate arrays AND a stacked copy)
    # also halves the live assembly footprint — at 1M block counts the
    # duplicate 1.2GB OOMs the bench's two-prepare chain on 16GB.
    aa = jax.lax.optimization_barrier(
        jnp.concatenate([dg[None], jnp.stack(A)], axis=0)
    )
    dg = aa[0]
    A = [aa[1 + d] for d in range(D)]
    lam = jnp.asarray(pat.lam)
    sc = jnp.asarray(pat.sc)

    # ---- fine level: ONE selector dot_general over the direction axis -----
    # h0[b,i,x,j,y] = sum_d allb[d,i,j] * aa[d,b,i,x,y] with allb the 0/1
    # in-tile lane bands (diag as direction 0, identity band). Expressing
    # the placement as a contraction instead of a sum of broadcast products
    # matters in COMPOSITION: the coarse sweeps below also read A, and the
    # multi-consumer fusion materialized every [B0,32,3,32,3] broadcast in a
    # T(4,128) layout + relayout-reshape (measured 4.1 ms at 65k on v5e vs
    # 0.70 ms for this form, bit-identical — HIGHEST keeps the one-hot
    # selection exact in f32).
    eye_band = jnp.eye(BANK, dtype=jnp.float32)
    allb = jnp.concatenate([eye_band[None], jnp.asarray(pat.band)], axis=0)
    aa = aa.reshape(D + 1, B0, BANK, 3, 3)

    def fine_dot(chunk):
        return jnp.einsum(
            "dbixy,dij->bixjy", chunk, allb,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(-1, 3 * BANK, 3 * BANK)

    # chunk the dot over banks at 1M-scale block counts: the [B0,32,3,32,3]
    # dot output plus its operand would otherwise hold ~2.4GB live inside
    # the bench's two-prepare measurement chain (OOM on 16GB)
    C = 8192
    if B0 <= C:
        h0 = fine_dot(aa)
    else:
        nc = (B0 + C - 1) // C
        padb = nc * C - B0
        aap = jnp.pad(aa, ((0, 0), (0, padb), (0, 0), (0, 0), (0, 0)))

        def step(i, out):
            chunk = jax.lax.dynamic_slice_in_dim(aap, i * C, C, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(
                out, fine_dot(chunk), i * C, axis=0
            )

        h0 = jax.lax.fori_loop(
            0, nc, step, jnp.zeros((nc * C, 3 * BANK, 3 * BANK), jnp.float32)
        )[:B0]
    parts = [h0]

    # ---- coarse levels --------------------------------------------------
    # All of a level's row placements (the node diagonal + every crossing
    # subcase) batch into ONE selector contraction over the entry axis —
    # sequential `rows + _place(...)` accumulation materialized a
    # [s_m,3,32,3] copy per entry in composition (~0.8 ms at 65k).
    iota = jnp.arange(BANK, dtype=jnp.int32)
    chain = None  # sum of blocks resolved below the current level
    for m in range(1, levels):
        group = BANK ** m
        s_m = pat.sizes[m]
        prev = jnp.zeros((n, 9), jnp.float32) if chain is None else chain
        em = jnp.zeros((n, 9), jnp.float32)
        for d in range(D):
            em = em + A[d] * (lam[d] == (m - 1))[:, None]
        chain = prev + em
        diagpay = chain + dg
        p_lane = (jnp.arange(s_m, dtype=jnp.int32) % BANK)
        S_list = [diagpay.reshape(s_m, group, 9).sum(axis=1)]    # [s_m,9]
        C_list = [(iota[None, :] == p_lane[:, None]).astype(jnp.float32)]
        for d, lm, c, col in pat.offdiag:
            if lm != m:
                continue
            w = ((lam[d] == m) & (sc[d] == c)).astype(jnp.float32)
            S_list.append((A[d] * w[:, None]).reshape(s_m, group, 9).sum(axis=1))
            C_list.append(
                (iota[None, :] == jnp.asarray(col)[:, None]).astype(jnp.float32)
            )
        rows = jnp.einsum(
            "epw,epj->pwj", jnp.stack(S_list), jnp.stack(C_list),
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # [s_m,9,32]
        rows = rows.reshape(s_m, 3, 3, BANK).transpose(0, 1, 3, 2)
        pad = (BANK - s_m % BANK) % BANK
        rows = jnp.pad(rows, ((0, pad), (0, 0), (0, 0), (0, 0)))
        hm = rows.reshape(-1, BANK, 3, BANK, 3).reshape(-1, 3 * BANK, 3 * BANK)
        hm = jnp.pad(hm, ((0, caps[m] // BANK - hm.shape[0]), (0, 0), (0, 0)))
        parts.append(hm)

    h96 = jnp.concatenate(parts, axis=0)
    if crows is not None:
        h96 = h96 + crows.reshape(-1, 3 * BANK, 3 * BANK)
    fill = jnp.asarray(pat.fill)
    eye96 = jnp.eye(3 * BANK, dtype=jnp.float32)
    return h96 + eye96[None] * fill[:, :, None]
