"""Hand-sharded iteration path: halo SpMV + psum CG + split Schwarz apply.

The GSPMD path (parallel/sharded.py) lets XLA infer collectives; this
module is the explicitly-scheduled shard_map version of the HOT LOOP for
pod-scale runs (SURVEY.md §2.3, §7.2 step 6):

  * fine (level-0) rows are contiguous Morton-sorted shards, multiples of
    the 32-node bank, so domains never straddle shards;
  * SpMV exchanges only a halo of boundary rows with ring neighbors via
    ppermute (Morton contiguity keeps the halo thin), overlapping the
    local contraction;
  * coarse levels (<= N/32 nodes) are replicated; their residual assembly
    is one psum of a small vector;
  * CG dot products are jax.lax.psum reductions.

Everything runs in SORTED vertex order (the solve permutes b once on entry
and x once on exit), so the apply needs no per-iteration permutation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import SchwarzConfig
from ..ops.apply import ApplyState
from ..ops.batched_inverse import apply_block_inverse
from ..ops.blockcsr import BlockEll
from ..ops.hierarchy import BANK
from .pcg import PcgResult, pcg


class HaloSystem(NamedTuple):
    """Sorted-order ELL system with halo-local column indices.

    Contiguous mode (halo >= 0): idx_ext[v, k] indexes into the
    halo-extended local x of v's shard: [halo left | own | halo right].

    Sparse mode (halo == -1, wide Morton jumps): idx_ext[v, k] indexes
    [own rows | remote rows in this shard's need-list order]; the
    send/recv tables drive one all_to_all of exactly the off-shard rows
    each shard consumes — comm volume O(boundary), never O(N).
    """

    diag: jnp.ndarray     # f32[N,3,3] (sorted order)
    idx_ext: jnp.ndarray  # i32[N,K] halo-local columns
    blocks: jnp.ndarray   # f32[N,K,3,3]
    halo: int
    shard_rows: int
    # sparse-mode exchange tables (empty in contiguous mode)
    send_idx: jnp.ndarray   # i32[nsh, nsh, S]: src-local rows to send to each dst
    recv_perm: jnp.ndarray  # i32[nsh, R]: need-slot -> flat (src, slot) in the received block


class ShardedApply(NamedTuple):
    """ApplyState split into sharded fine part + replicated coarse part.

    inv_fine / inv_coarse are either dense [B,96,96] tables or
    PackedInverse containers (4704 floats/block, ops/pallas/packed_symv):
    shard_map runs one pallas_call PER SHARD, so — unlike GSPMD, which
    cannot partition a pallas_call — the packed two-sided symv that wins
    the single-chip flagship also runs on the multi-chip hot path
    (VERDICT r4 missing #1; reference apply kernel cpp:1600-1696).
    """

    going_next_fine: jnp.ndarray  # i32[cap0] parent (coarse-vector index) per fine node
    anc1: jnp.ndarray             # i32[N] level-1 ancestor (coarse-vector index)
    inv_fine: object              # f32[B0,96,96] | PackedInverse (batch sharded)
    inv_coarse: object            # f32[Bc,96,96] | PackedInverse (replicated)
    going_next_coarse: jnp.ndarray  # i32[total_coarse+1] parent within coarse vector
    n: int
    total_coarse: int
    # LIVE level-1 node count (1 + max fine parent): the restriction psum
    # covers only [0, l1_live) + a dump slot instead of the whole padded
    # coarse vector. At 4M verts this halves the dominant comm term of
    # the iteration (the capacity-padded psum was 6.7 MB/iter and capped
    # the projected scaling efficiency at 77%, scripts/scaling_model.py —
    # below the >=80% BASELINE.json:11 target; trimmed it clears it).
    l1_live: int = 0


def _empty_tables(num_shards: int):
    return (
        jnp.zeros((num_shards, num_shards, 0), jnp.int32),
        jnp.zeros((num_shards, 0), jnp.int32),
    )


def build_halo_system(ell_sorted: BlockEll, num_shards: int) -> HaloSystem:
    """Convert a sorted-order ELL matrix to halo-local column indexing.

    Host-side (NumPy). Two modes:

    * contiguous halo — when every off-shard column lies within one shard
      width of its row's shard, columns become halo-buffer offsets and the
      runtime exchange is two ring ppermutes of `halo` rows;
    * sparse remote lists — wide Morton quadrant jumps can reference rows
      arbitrarily far away. Each shard's exact off-shard column set is
      precomputed, send lists are built per (src, dst) pair, and the
      runtime exchange is one all_to_all of exactly those rows. Comm
      volume stays O(boundary); the round-1 fallback (all-gather of the
      whole x per SpMV) is gone.

    N must divide evenly into bank-aligned shards.
    """
    n, k = ell_sorted.idx.shape
    assert n % (num_shards * BANK) == 0, "pad N to num_shards*32 first"
    rows_per = n // num_shards
    idx = np.asarray(ell_sorted.idx)
    mask = np.asarray(ell_sorted.mask)
    row = np.arange(n)[:, None]
    base = (row // rows_per) * rows_per
    off = np.where(mask, idx - base, 0)
    halo = int(max(0, max(-off.min(), off.max() - rows_per + 1)))
    halo = -(-halo // BANK) * BANK  # bank-align
    if halo <= rows_per:
        own = np.tile((np.arange(n) % rows_per + halo)[:, None], (1, k))
        idx_ext = np.where(mask, off + halo, own).astype(np.int32)
        return HaloSystem(
            diag=ell_sorted.diag,
            idx_ext=jnp.asarray(idx_ext),
            blocks=ell_sorted.blocks,
            halo=halo,
            shard_rows=rows_per,
            send_idx=_empty_tables(num_shards)[0],
            recv_perm=_empty_tables(num_shards)[1],
        )

    # ---- sparse remote-column exchange tables ---------------------------
    shard_of = idx // rows_per
    my_shard = row // rows_per
    remote = mask & (shard_of != my_shard)
    needs = []  # per dst shard: sorted unique global rows it reads remotely
    for s in range(num_shards):
        rows_s = slice(s * rows_per, (s + 1) * rows_per)
        needs.append(np.unique(idx[rows_s][remote[rows_s]]))
    r_cap = max((len(x) for x in needs), default=0)
    r_cap = max(1, -(-r_cap // 8) * 8)  # sublane-align
    per_pair = [
        [needs[d][(needs[d] // rows_per) == s] for d in range(num_shards)]
        for s in range(num_shards)
    ]
    s_cap = max(
        max((len(p) for p in row_), default=0) for row_ in per_pair
    )
    s_cap = max(1, -(-s_cap // 8) * 8)
    send = np.zeros((num_shards, num_shards, s_cap), np.int32)
    recv_perm = np.zeros((num_shards, r_cap), np.int32)
    for s in range(num_shards):
        for d in range(num_shards):
            rows_sd = per_pair[s][d] - s * rows_per  # src-local
            send[s, d, : len(rows_sd)] = rows_sd
    for d in range(num_shards):
        # need-slot -> flat (src, slot) position in the received [nsh*s_cap]
        pos = {}
        for s in range(num_shards):
            for j, g in enumerate(per_pair[s][d]):
                pos[int(g)] = s * s_cap + j
        for r_slot, g in enumerate(needs[d]):
            recv_perm[d, r_slot] = pos[int(g)]
    # columns: own rows -> [0, rows_per); remote -> rows_per + need slot
    idx_ext = (idx - base).astype(np.int32)
    for d in range(num_shards):
        rows_d = slice(d * rows_per, (d + 1) * rows_per)
        slot_of = {int(g): rows_per + j for j, g in enumerate(needs[d])}
        blk_idx = idx[rows_d]
        blk_rem = remote[rows_d]
        if blk_rem.any():
            mapped = np.asarray(
                [slot_of[int(g)] for g in blk_idx[blk_rem]], np.int32
            )
            sub = idx_ext[rows_d]
            sub[blk_rem] = mapped
            idx_ext[rows_d] = sub
    own = np.arange(n)[:, None] % rows_per
    idx_ext = np.where(mask, idx_ext, own).astype(np.int32)
    return HaloSystem(
        diag=ell_sorted.diag,
        idx_ext=jnp.asarray(idx_ext),
        blocks=ell_sorted.blocks,
        halo=-1,
        shard_rows=rows_per,
        send_idx=jnp.asarray(send),
        recv_perm=jnp.asarray(recv_perm),
    )


def _packed_block_b(nblocks: int, cap: int) -> int:
    """Largest pallas batch-block <= cap that divides nblocks exactly."""
    bb = max(1, min(cap, nblocks))
    while nblocks % bb:
        bb -= 1
    return bb


def _pad_packed(pk, mult: int):
    """Pad a PackedInverse's batch (minor) axis to a multiple of `mult`.
    Padded blocks are zero, which the two-sided symv maps to zero output —
    they never meet a live rhs row."""
    from ..ops.pallas.packed_symv import PackedInverse

    bp = pk.f.shape[2]
    pad = (-bp) % mult
    if not pad:
        return pk
    return PackedInverse(
        f=jnp.pad(pk.f, ((0, 0), (0, 0), (0, pad))),
        dg=jnp.pad(pk.dg, ((0, 0), (0, pad))),
        nb=pk.nb,
    )


def split_apply_state(
    state: ApplyState, cfg: SchwarzConfig, n: int, num_shards: int = 1
) -> ShardedApply:
    """Split prepare() output into fine-sharded / coarse-replicated parts.

    Dense [B,96,96] inverses split by block slicing. PackedInverse splits
    by slicing the batch-minor axis: the fine part's batch is padded so
    every one of `num_shards` shards holds an equal, pallas-tileable
    block count (pass the mesh size used for the solve). PackedInverseCM
    is rejected — the halo path's vectors are row-major [N,3] and a
    comp-major-permuted inverse would silently apply the wrong DOF
    convention.
    """
    from ..ops.pallas.packed_symv import PackedInverse, PackedInverseCM

    if isinstance(state.inv96, PackedInverseCM):
        raise ValueError(
            "halo path vectors are row-major; a comp-major PackedInverseCM "
            "cannot be applied here (prepare with solve_layout='rows')"
        )
    offs = cfg.level_offsets(n)
    cap0, total = offs[1], offs[-1]
    total_coarse = total - cap0
    gn = np.asarray(state.going_next)
    # fine parents as indices into the coarse vector (sentinel -> dump slot)
    gnf = gn[:cap0]
    gnf = np.where(gnf >= total, total_coarse, gnf - cap0).astype(np.int32)
    gnc = gn[cap0 : total + 1]
    gnc = np.where(gnc >= total, total_coarse, gnc - cap0).astype(np.int32)
    anc = np.asarray(state.ancestors)
    anc1 = (anc[:, 0] - cap0).astype(np.int32) if anc.shape[1] else np.zeros(n, np.int32)
    live = gnf[gnf < total_coarse]
    l1_live = int(live.max()) + 1 if live.size else 0
    l1_live = min(-(-l1_live // 8) * 8, total_coarse)
    b0 = cap0 // BANK
    if isinstance(state.inv96, PackedInverse):
        bc = total // BANK - b0
        fine = PackedInverse(
            f=state.inv96.f[:, :, :b0], dg=state.inv96.dg[:, :b0],
            nb=jnp.int32(b0),
        )
        coarse = PackedInverse(
            f=state.inv96.f[:, :, b0 : b0 + bc],
            dg=state.inv96.dg[:, b0 : b0 + bc],
            nb=jnp.int32(bc),
        )
        # equal, 8-aligned per-shard batches for the fine table. Padding
        # must be INTERLEAVED per shard (each shard's slice = its own
        # blocks + local zero padding), not appended globally — sharding
        # a tail-padded axis would misalign every shard's blocks.
        t = b0 // num_shards
        assert t * num_shards == b0, (b0, num_shards)
        per = -(-t // 8) * 8
        if per != t:
            f4 = fine.f.reshape(48, 96, num_shards, t)
            f4 = jnp.pad(f4, ((0, 0), (0, 0), (0, 0), (0, per - t)))
            d3 = jnp.pad(
                fine.dg.reshape(96, num_shards, t),
                ((0, 0), (0, 0), (0, per - t)),
            )
            fine = PackedInverse(
                f=f4.reshape(48, 96, num_shards * per),
                dg=d3.reshape(96, num_shards * per),
                nb=fine.nb,
            )
        coarse = _pad_packed(coarse, 8)
        inv_fine, inv_coarse = fine, coarse
    else:
        inv_fine, inv_coarse = state.inv96[:b0], state.inv96[b0:]
    return ShardedApply(
        going_next_fine=jnp.asarray(gnf),
        anc1=jnp.asarray(anc1),
        inv_fine=inv_fine,
        inv_coarse=inv_coarse,
        going_next_coarse=jnp.asarray(gnc),
        n=n,
        total_coarse=total_coarse,
        l1_live=l1_live,
    )


def local_contact_spmv(st, x_l: jnp.ndarray, axis: str, rows_per: int) -> jnp.ndarray:
    """Sharded rank-1 stencil contact SpMV (ops/contact.stencil_contact_spmv).

    The stencil set is REPLICATED per shard (contact coupling is the
    algorithm's point — cpp:514-563, 1201-1227 — and the set is O(contacts),
    tiny next to the system). Each shard contributes the stencil-vertex x
    rows it owns to one psum of the compact [S,5,3] gather payload —
    comm is O(stencils), never O(N) — then computes every stencil's rank-1
    product and scatter-adds only into its own rows. Stencil ids are in
    SORTED space (the halo solve's ordering).
    """
    s0 = jax.lax.axis_index(axis) * rows_per
    act = st.valid[:, None] & (jnp.arange(5)[None, :] < st.nverts[:, None])
    loc = st.idx - s0
    own = act & (loc >= 0) & (loc < rows_per)
    xg = jnp.take(
        x_l, jnp.clip(loc, 0, rows_per - 1).reshape(-1), axis=0
    ).reshape(st.idx.shape + (3,))
    xs = jax.lax.psum(jnp.where(own[..., None], xg, 0.0), axis)  # [S,5,3]
    w = jnp.where(act, st.weight, 0.0)
    t = jnp.einsum("sv,svk,sk->s", w, xs, st.direction)
    ys = ((st.stiff * t)[:, None] * w)[:, :, None] * st.direction[:, None, :]
    tgt = jnp.where(own, loc, rows_per).reshape(-1)
    tgt_b, ys_b = jax.lax.optimization_barrier((tgt, ys.reshape(-1, 3)))
    return jnp.zeros((rows_per + 1, 3), jnp.float32).at[tgt_b].add(
        ys_b, mode="drop"
    )[:rows_per]


def halo_pcg_solver(mesh: Mesh, cfg: SchwarzConfig, n: int, halo: int,
                    levels: int, total_coarse: int, axis: str = "x",
                    tol: float = 1e-4, max_iters: int = 400,
                    with_contact: bool = False, packed: bool = False,
                    l1_live: int | None = None):
    """Build the jitted shard_map PCG solve (sorted-order b -> sorted x).

    with_contact=True adds a replicated Stencils argument to the solve
    (sorted-space vertex ids) whose rank-1 terms join the local SpMV —
    the contact-heavy regime the preconditioner exists for can then run
    on the explicitly-scheduled pod path, not only on GSPMD grids.

    packed=True declares the ShardedApply's inverse containers as
    PackedInverse pytrees (fine batch-minor axis sharded, coarse
    replicated); the apply then runs the Pallas two-sided packed symv
    per shard (solve_sorted sets this from the state's actual type).
    """
    nsh = mesh.shape[axis]
    rows_per = n // nsh
    cap0 = cfg.level_offsets(n)[1]
    coffs = [o - cap0 for o in cfg.level_offsets(n)[1:]]  # coarse-vector level bounds

    def local_spmv(diag_l, idxext_l, blocks_l, send_l, recv_l, x_l):
        if halo < 0:
            # sparse remote-column exchange: gather exactly the rows each
            # peer needs from us, one all_to_all, then arrange into this
            # shard's need-list order. Comm = O(boundary rows), not O(N).
            s_cap = send_l.shape[2]
            xs = jnp.take(x_l, send_l[0].reshape(-1), axis=0)      # [nsh*S,3]
            received = jax.lax.all_to_all(
                xs.reshape(nsh, s_cap, 3), axis, split_axis=0, concat_axis=0
            )                                                      # [nsh,S,3]
            x_halo = jnp.take(received.reshape(-1, 3), recv_l[0], axis=0)
            xext = jnp.concatenate([x_l, x_halo], axis=0)
        else:
            fwd = [(s, (s + 1) % nsh) for s in range(nsh)]
            bwd = [(s, (s - 1) % nsh) for s in range(nsh)]
            left = jax.lax.ppermute(x_l[-halo:], axis, perm=fwd) if halo else x_l[:0]
            right = jax.lax.ppermute(x_l[:halo], axis, perm=bwd) if halo else x_l[:0]
            xext = jnp.concatenate([left, x_l, right], axis=0)
        xg = jnp.take(xext, idxext_l, axis=0)
        return jnp.einsum("nkij,nkj->ni", blocks_l, xg) + jnp.einsum(
            "nij,nj->ni", diag_l, x_l
        )

    def block_apply(inv, rhs96):
        """Dense einsum or per-shard Pallas packed symv (legal under
        shard_map — each shard's block batch is local; cpp:1600-1696)."""
        from ..ops.pallas.packed_symv import PackedInverse, packed_symv

        if isinstance(inv, PackedInverse):
            bb = _packed_block_b(inv.f.shape[2], cfg.packed_symv_block_b)
            return packed_symv(inv, rhs96, block_b=bb)
        return apply_block_inverse(inv, rhs96)

    def local_apply(sap_gnf_l, anc1_l, invf_l, invc, gnc, r_l):
        # restriction: local fine -> partial LEVEL-1 vector, psum to
        # replicate. Fine parents are level-1 nodes only, so the psum
        # needs just the live level-1 span (+ dump slot), not the whole
        # capacity-padded coarse vector: at 4M verts the full-vector psum
        # was 6.7 MB/iter — the dominant comm term of the iteration and
        # what capped projected multi-host scaling at 77%
        # (scripts/scaling_model.py); the trimmed span clears >=80%.
        nf = r_l.shape[0]
        l1 = total_coarse if l1_live is None else l1_live
        partial = jnp.zeros((l1 + 1, 3), r_l.dtype)
        gnf_l, vals = jax.lax.optimization_barrier(
            (jnp.minimum(sap_gnf_l, l1), r_l)
        )
        partial = partial.at[gnf_l].add(vals, mode="drop")
        psummed = jax.lax.psum(partial, axis)
        coarse = jnp.zeros((total_coarse + 1, 3), r_l.dtype)
        coarse = jax.lax.dynamic_update_slice(coarse, psummed[:l1], (0, 0))
        for l in range(1, levels - 1):
            seg = slice(coffs[l - 1], coffs[l])
            parents, v = jax.lax.optimization_barrier((gnc[seg], coarse[seg]))
            coarse = coarse.at[parents].add(v, mode="drop")
        coarse = coarse[:total_coarse]
        # local fine blocks + replicated coarse blocks
        zf = block_apply(invf_l, r_l.reshape(-1, 3 * BANK)).reshape(-1, 3)
        zc = block_apply(invc, coarse.reshape(-1, 3 * BANK)).reshape(-1, 3)
        # top-down pre-sum over applied coarse levels, then one local gather
        top = min(levels, cfg.max_applied_levels)
        pz = zc
        for l in range(top - 2, 0, -1):
            seg = slice(coffs[l - 1], coffs[l])
            pz = pz.at[seg].add(
                jnp.take(pz, gnc[seg], axis=0, mode="fill", fill_value=0)
            )
        if top > 1:
            coarse_term = jnp.take(pz, anc1_l, axis=0)
            if cfg.coarse_damping != 1.0:
                coarse_term = coarse_term * cfg.coarse_damping
            zf = zf + coarse_term
        return zf

    row = P(axis)
    rep = P()

    from ..ops.pallas.packed_symv import PackedInverse
    from ..ops.stencils import Stencils

    st_spec = Stencils(*([rep] * len(Stencils._fields)))
    if packed:
        invf_spec = PackedInverse(f=P(None, None, axis), dg=P(None, axis), nb=rep)
        invc_spec = PackedInverse(f=rep, dg=rep, nb=rep)
    else:
        invf_spec, invc_spec = row, rep
    in_specs = (
        (row, row, row, row, row),           # diag, idx_ext, blocks, send, recv
        (row, row, invf_spec, invc_spec, rep),  # gnf, anc1, invf, invc, gnc
        row,                                 # b
    ) + ((st_spec,) if with_contact else ())

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=PcgResult(x=row, iterations=rep, rel_residual=rep),
        check_vma=False,
    )
    def solve(ell_parts, sap_parts, b_l, *rest):
        diag_l, idxext_l, blocks_l, send_l, recv_l = ell_parts
        gnf_l, anc1_l, invf_l, invc, gnc = sap_parts

        def spmv_op(v):
            q = local_spmv(diag_l, idxext_l, blocks_l, send_l, recv_l, v)
            if with_contact:
                q = q + local_contact_spmv(rest[0], v, axis, rows_per)
            return q

        return pcg(
            spmv_op,
            lambda r: local_apply(gnf_l, anc1_l, invf_l, invc, gnc, r),
            b_l,
            tol=tol,
            max_iters=max_iters,
            reduce_sum=lambda s: jax.lax.psum(s, axis),
        )

    return jax.jit(solve)


def solve_sorted(mesh: Mesh, cfg: SchwarzConfig, halo_sys: HaloSystem,
                 sap: ShardedApply, b_sorted: jnp.ndarray, axis: str = "x",
                 tol: float = 1e-4, max_iters: int = 400,
                 stencils=None) -> PcgResult:
    """Convenience wrapper: sorted-order solve over the mesh.

    `stencils` (optional): sorted-space collision Stencils whose rank-1
    contact terms join the sharded SpMV (replicated per shard).
    """
    from ..ops.pallas.packed_symv import PackedInverse

    n = b_sorted.shape[0]
    levels = cfg.num_levels(n)
    cap0 = cfg.level_offsets(n)[1]
    # pad fine going_next/anc arrays to exactly n rows for row-sharding
    gnf = sap.going_next_fine[:n]
    solver = halo_pcg_solver(mesh, cfg, n, halo_sys.halo, levels,
                             sap.total_coarse, axis, tol, max_iters,
                             with_contact=stencils is not None,
                             packed=isinstance(sap.inv_fine, PackedInverse),
                             l1_live=sap.l1_live or None)
    extra = () if stencils is None else (stencils,)
    with mesh:
        return solver(
            (halo_sys.diag, halo_sys.idx_ext, halo_sys.blocks,
             halo_sys.send_idx, halo_sys.recv_perm),
            (gnf, sap.anc1, sap.inv_fine, sap.inv_coarse, sap.going_next_coarse),
            b_sorted,
            *extra,
        )
