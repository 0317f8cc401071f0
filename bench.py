"""Benchmark: PCG iteration throughput (SpMV + multilevel Schwarz apply).

Prints one JSON line PER CONFIG: {"metric", "value", "unit",
"vs_baseline", ...extras}; the headline cloth config is printed LAST so a
last-line parse lands on it. BENCH_CONFIGS selects the list (default
"collide:256,tet:32,general:256,cloth:1024,cloth:256"); BENCH_CONFIG=X
with BENCH_GRID=N runs a single config the round-3 way.

Definitions
-----------
* metric value = scalar nonzeros processed per second by one PCG iteration:
  nnz(H) (the block-ELL SpMV) + the dense bytes-equivalent nonzeros of the
  banked inverse (the batched 96x96 symv of the preconditioner apply),
  matching BASELINE.json's "nnz/s for SpMV + preconditioner apply". The
  two terms are also emitted separately (nnz_spmv / nnz_apply) so the
  combined number cannot be misread as a conventional sparse-SpMV rate.
* vs_baseline = wall-clock speedup of the full Schwarz-PCG solve to 1e-4
  relative residual vs. block-Jacobi PCG on the identical system (the
  reference repo publishes no numbers — BASELINE.md — so the Jacobi solve
  is the measurable stand-in for an unpreconditioned production baseline).
  Per-rep ratios across the interleaved repeats are summarized as
  vs_baseline_min/median; vs_baseline itself uses the min walls (the
  round-2/3 definition, kept comparable).
* vs_baseline_frames = the same ratio with prepare amortized over
  BENCH_FRAME_SOLVES solves per prepare (default 4) — the reference's
  production cadence is one prepare per Newton step re-used across a
  frame's PCG solves (cpp:49 re-sorts only every 17th frame).

Env knobs: BENCH_CONFIGS / BENCH_CONFIG+BENCH_GRID, BENCH_ITERS (50).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run_config(config, grid):
    """Measure one config; returns the JSON-able result dict.

    config: cloth | collide | tet | general. grid = grid side (tet: box
    side). "general" is the cloth system forced down the unstructured
    path — runtime Morton sort, build_hierarchy, banked assembly, ELL
    permute, gather SpMV — i.e. the reference's arbitrary-mesh contract
    (SeSchwarzPreconditioner.h:44-51) with no analytic-ordering shortcut.
    """
    import jax

    # honor JAX_PLATFORMS even when a platform plugin (axon) outranks the
    # env var — otherwise a "CPU" run silently grabs (or hangs on) the
    # tunneled TPU. A non-cpu platform gets ",cpu" appended (first entry
    # stays the default backend) so host-side system assembly can run on
    # the CPU backend — the 64^3 tet element blocks pick a 32x-padded
    # device layout that exceeds HBM (see the tet branch below).
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        if "cpu" not in plats.split(","):
            plats = plats + ",cpu"
        try:
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass
    import jax.numpy as jnp

    from precond_tpu.config import SchwarzConfig
    from precond_tpu.models import cloth
    from precond_tpu.ops import blockcsr, gridstencil
    from precond_tpu.ops.apply import precondition, precondition_sorted
    from precond_tpu.ops.gridapply import precondition_grid
    from precond_tpu.parallel.pcg import jacobi_preconditioner, pcg
    from precond_tpu.solver import compute_sort_maps, prepare_grid, prepare_with_system

    general = config == "general"
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    cfg = SchwarzConfig(
        inverse_dtype=os.environ.get("BENCH_INV_DTYPE", "float32"),
        # "auto" engages the packed-symmetric Pallas symv (half the apply
        # HBM read) once the inverse table outgrows VMEM residency
        symv_kernel=os.environ.get("BENCH_SYMV", "auto"),
        # comp-major [3,N] solve layout on the grid path ("auto": engages
        # with the packed symv); BENCH_LAYOUT=rows|cm forces either
        solve_layout=os.environ.get("BENCH_LAYOUT", "auto"),
        # damped additive apply for the contact config: stiff cross-bank
        # rank-1 constraints over-correct in the plain additive sum;
        # theta=0.25 measured 376 -> 320 Schwarz iters on the folded
        # sheet with no effect on the contact-free configs
        # (scripts/probe_damping.py; reference semantics at 1.0)
        coarse_damping=float(
            os.environ.get(
                "BENCH_COARSE_DAMPING", "0.25" if config == "collide" else "1.0"
            )
        ),
    )

    from precond_tpu.ops.pallas.packed_symv import (
        DenseInverseCM, PackedInverse, PackedInverseCM,
    )

    def inv_leaf(x):
        if isinstance(x, (PackedInverse, PackedInverseCM)):
            return x.f
        return x.m if isinstance(x, DenseInverseCM) else x

    # Light vertices + stiff springs: the stiffness-dominated, genuinely
    # ill-conditioned regime real cloth sims operate in (this is where the
    # multilevel preconditioner earns its keep). mass is per-vertex (a
    # ~0.1kg sheet at this resolution), overridable via BENCH_MASS.
    mass = float(os.environ.get("BENCH_MASS", "0.001"))
    stencils = None
    contact = None
    cslots = None
    collide_m = None
    analytic_hier = False
    box_maps = None
    bsys = None
    boxblocks = None
    if config == "tet":
        # deformable tet body (BASELINE.json generality config); power-of-
        # two sides ride the 3-D analytic box ordering: no runtime sort, no
        # hierarchy build (arithmetic), static-transfer apply.
        from precond_tpu.models import tetmesh
        from precond_tpu.utils import boxmorton as bm

        side = int(os.environ.get("BENCH_TET", str(grid)))
        # stiff-rubber regime (E ~ 5 MPa) — at the soft default (5e4) the
        # compact elastic block is so well-conditioned Jacobi converges in
        # ~50 iterations and the config measures nothing. A volumetric
        # block stays far better conditioned than cloth at any stiffness
        # (its vs_baseline is the method's honest worst case; the
        # preconditioner's regime is thin shells, contact, and scale).
        # tet:48 (non-2^k side) rides the GENERAL path; tet:64 rides the
        # STATIC box path — much faster absolutely (3.7 vs 8.0 ms/iter
        # at 2.4x the vertices, r5) but vs_baseline COMPRESSES toward
        # iters_j/iters_s because block-Jacobi shares the fast
        # boxstencil SpMV: on this well-conditioned volumetric block the
        # ratio can dip below 1 end-to-end. Both lines are recorded; the
        # box path is what a production user would run.
        youngs = float(os.environ.get("BENCH_YOUNGS", "5e6"))
        tmesh = tetmesh.make_box(side, side, side, mass=mass * 50, youngs=youngs)
        n = tmesh.num_verts
        # BENCH_MATERIAL selects the constitutive model that assembles the
        # system handed to prepare (assembly is the host's job in the
        # reference — cpp:67-72 — so it stays outside the timed phase):
        # linear (rest K), corotational (warped stiffness at a twisted
        # state), neohookean (eig-projected SPD Hessian at that state).
        bmat = os.environ.get("BENCH_MATERIAL", "linear")

        # System assembly is the HOST's job in the reference (cpp:67-72)
        # and sits outside the timed phases; at 64^3 (1.25M tets) the
        # [T,4,4,3,3] per-element blocks pick a (4,128)-tiled device
        # layout that pads ~32x (23 GB > HBM), so assemble on the CPU
        # backend and ship only the compact ELL to the chip.
        import contextlib

        try:
            cpu_dev = jax.devices("cpu")
        except RuntimeError:
            cpu_dev = []
        asm_ctx = (
            jax.default_device(cpu_dev[0])
            if (cpu_dev and n > (1 << 17) and jax.default_backend() != "cpu")
            else contextlib.nullcontext()
        )
        if bmat == "linear":
            with asm_ctx:
                ell = tetmesh.assemble_system(tmesh)
            ell = jax.device_put(ell, jax.devices()[0])
        else:
            rest = jnp.asarray(tmesh.positions)
            tets = jnp.asarray(tmesh.tets)
            th = 0.3 * rest[:, 2] / rest[:, 2].max()  # twist about z
            xd = jnp.stack(
                [
                    jnp.cos(th) * rest[:, 0] - jnp.sin(th) * rest[:, 1],
                    jnp.sin(th) * rest[:, 0] + jnp.cos(th) * rest[:, 1],
                    rest[:, 2],
                ],
                axis=1,
            )
            estruct = tetmesh.ell_structure_from_tets(n, tmesh.tets)
            if bmat == "corotational":
                ke0 = tetmesh.element_blocks(rest, tets, tmesh.lam, tmesh.mu)
                r = tetmesh.corot_rotations(xd, rest, tets)
                ke = tetmesh.element_blocks_corot(ke0, r)
            else:
                ke = tetmesh.snh_element_blocks(xd, rest, tets, tmesh.lam, tmesh.mu)
            ell = jax.jit(tetmesh.fill_ell_from_ke)(
                *map(jnp.asarray, estruct), ke, tmesh.mass / tmesh.dt**2
            )
        positions = tmesh.positions
        if bm.supported(side, side, side) and os.environ.get("BENCH_BOXMORTON", "1") != "0":
            s2o, o2s = bm.sort_maps(side, side, side)
            box_maps = (s2o, o2s)
            analytic_hier = True
        if analytic_hier and os.environ.get("BENCH_BOXSTENCIL", "1") != "0":
            from precond_tpu.ops import boxstencil

            bsys = jax.jit(
                lambda e: boxstencil.from_ell(e, (side, side, side))
            )(ell)
            # planes ARE the system assembly (host CSR analogue) — the
            # timed prepare is then static assembly + factorization only
            boxblocks = jax.jit(
                lambda e: boxstencil.planes_from_ell(e, (side, side, side))
            )(ell)
    elif config == "collide":
        # a folded self-colliding sheet: the overlapped half produces real
        # VF/EE/EF stencils across the fold gap (0.5 grid spacings, under
        # the 0.75-spacing threshold; same-side non-neighbors sit >= 2
        # spacings away so the contact set is the fold, not noise). The
        # mesh stays a grid, so this config rides the static grid path
        # with arithmetic-climb collision terms.
        from precond_tpu.models import collision as coll
        from precond_tpu.ops.stencils import build_stencils

        mesh = cloth.make_grid(grid, grid, z_wave=0.0, mass=mass, dt=1.0 / 60.0)
        n = mesh.num_verts
        h = 1.0 / max(grid - 1, 1)
        p = np.asarray(mesh.positions).copy()
        fold = p[:, 0] > 0.5
        p[:, 2] = np.where(fold, 0.5 * h, 0.0)
        p[:, 0] = np.where(fold, 1.0 - p[:, 0], p[:, 0]).astype(np.float32)
        positions = p.astype(np.float32)
        ell = cloth.assemble_system(mesh, positions=positions)
        # Representative contact density (~0.75 stencils/vertex across the
        # fold). Unbudgeted face-to-face overlap stacks ~6 stencils/vertex
        # of rank-1 penalties — a nearly-constrained degenerate system
        # where even a contact-tracking M needs 500+ iterations.
        budget = int(os.environ.get("BENCH_COLLISION_BUDGET", str(n // 4)))
        cap = int(os.environ.get("BENCH_COLLISION_CAP", "2"))
        # Penalty stiffness 1e3 (default): the regime where the 65k fold
        # CONVERGES for all solvers. At spring-stiff 1e4+ penalties even
        # the contact-tracking M exceeds 2000 PCG iterations at 65k
        # (measured r5; at that stiffness the isotropic-sort general M
        # is the only configuration that improves the count —
        # scripts/probe_isosort.py, 504 vs 1160 at 16k verts — but no
        # 65k configuration converges inside the bench budget).
        # BENCH_COLLIDE_M selects the preconditioner build: "static"
        # (default — measured best END-TO-END: the general path's
        # position sort buys ~13% fewer iterations at 1e3 but pays
        # per-iteration permutes + one-hot transfers and ~3x the
        # prepare) or "general" (the reference's actual pipeline:
        # position-Morton sort + contact connectivity in clustering).
        thresh = 0.75 * h
        stiff = float(os.environ.get("BENCH_CONTACT_STIFF", "1e3"))
        collide_m = os.environ.get("BENCH_COLLIDE_M", "static")
        pj = jnp.asarray(positions)
        fj, ej = jnp.asarray(mesh.faces), jnp.asarray(mesh.edges)
        vf, _ = coll.detect_vf_grid(pj, fj, thresh, stiff, budget, per_vertex_cap=cap)
        ee, _ = coll.detect_ee_grid(pj, ej, thresh, stiff, budget, per_edge_cap=cap)
        ef, _ = coll.detect_ef_grid(pj, ej, fj, thresh, stiff, budget, per_edge_cap=cap)
        stencils = build_stencils(ej, fj, ef=ef, ee=ee, vf=vf)
        # compact away the detection budgets' invalid padding (host-side,
        # like the reference host sizing its EF/EE/VF arrays to the found
        # counts, cpp:306-308): the rank-1 contact SpMV moves 5 rows per
        # STENCIL SLOT each iteration, valid or not
        keep = np.flatnonzero(np.asarray(stencils.valid))
        pad8 = (-keep.size) % 8
        keep = np.concatenate([keep, np.zeros(pad8, np.int64)])
        stencils = type(stencils)(
            *(jnp.asarray(np.asarray(f)[keep]) for f in stencils)
        )
        if pad8:
            stencils = stencils._replace(
                valid=stencils.valid.at[-pad8:].set(False)
            )
        # contacts belong IN the system (the reference host's CSR carries
        # the fill-in; the stencils exist so M can track it) — an M with
        # terms H lacks is actively harmful (632 vs 448 Jacobi iters).
        from precond_tpu.ops.contact import build_contact_ell, build_contact_slots

        kc = int(os.environ.get("BENCH_CONTACT_KC", "32"))
        contact = jax.jit(
            lambda s: build_contact_ell(s, n, kc=kc)
        )(stencils)
        # slot-sorted scatter-free apply tables (ops/contact.ContactSlots)
        cslots = jax.jit(build_contact_slots, static_argnums=1)(stencils, n)
    else:
        mesh = cloth.make_grid(grid, grid, z_wave=0.02, mass=mass, dt=1.0 / 60.0)
        n = mesh.num_verts
        # built AFTER the prepare-chain measurement (below): at 1M the two
        # chained prepares sit within ~1GB of HBM capacity and the block
        # arrays (~1.1GB with the stencil system) tip them over
        ell = None
        positions = mesh.positions
    # Structured-grid stencil SpMV fast path (zero gathers; ~5x the gather
    # ELL on v5e). The Schwarz solve then runs in ORIGINAL (grid) order and
    # crosses into Morton order inside the apply. For power-of-two square
    # grids the Morton permutation is an analytic bit interleave, so the
    # crossing is a reshape/transpose (~0.2 ms at 1M) instead of two N-row
    # permute gathers (~8.8 ms at 1M).
    ssys = None
    gmk = None
    gridblocks = None
    if config in ("cloth", "collide") and os.environ.get("BENCH_STENCIL", "1") != "0":
        from precond_tpu.utils import gridmorton as gm

        ssys = "deferred" if ell is None else cloth.assemble_system_stencil(
            mesh, positions=positions,
            sym=os.environ.get("BENCH_SPMV_SYM", "0") == "1",
        )
        # collide with the general-M build skips the analytic tile order
        # entirely: its maps must be the position-based (isotropic) Morton
        # sort so contact pairs cluster together (see BENCH_COLLIDE_M
        # above); the solve then runs grid-order with the orig-order
        # precondition() (two data-permutes per iteration).
        skip_gm = config == "collide" and collide_m == "general"
        if (gm.supported(grid, grid) and not skip_gm
                and os.environ.get("BENCH_GRIDMORTON", "1") != "0"):
            gmk = grid.bit_length() - 1
            if os.environ.get("BENCH_GRIDPREP", "1") != "0":
                # static-pattern grid prepare (no sort/permute/hierarchy)
                gridblocks = cloth.assemble_system_grid(mesh, positions=positions)
    if gmk is not None:
        from precond_tpu.solver import SortMaps

        s2o, o2s = gm.sort_maps(gmk)
        maps = SortMaps(jnp.asarray(s2o), jnp.asarray(o2s))
    elif box_maps is not None:
        from precond_tpu.solver import SortMaps

        maps = SortMaps(jnp.asarray(box_maps[0]), jnp.asarray(box_maps[1]))
    else:
        maps = compute_sort_maps(jnp.asarray(positions))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    def sync(a):
        # On the tunneled axon backend block_until_ready can return before
        # compute completes; a value fetch is the only reliable barrier.
        return float(np.asarray(a).ravel()[0])

    # ---- prepare (hierarchy + assembly + factorization) ------------------
    # Dispatch-cancelling measurement (VERDICT r1 item 2: "measure prepare
    # inside a small in-jit repeat chain"): the shared chip's per-dispatch
    # + fetch floor varies 0.03-30+ ms per session, so time a 1-prepare
    # dispatch and a k-prepare dispatch and difference them; min-of-3.
    # The k-chain is a LOOP-CARRIED fori_loop, not a Python unroll: the
    # compile is then the size of ONE prepare (the unrolled 5-chain at
    # 262k reproducibly exceeded the remote compiler's limits) and only
    # one prepare's buffers are live at a time, so longer chains average
    # more noise without HBM pressure. Every input rides through an
    # IN-LOOP optimization_barrier tied to the loop-carried tap: without
    # it, XLA hoists any stage whose true inputs are loop-invariant out
    # of the loop (measured: a tap-on-diag-only chain at 1M reported
    # ~209 ms/prepare because the 13 direction crossings and the coarse
    # mask sweeps — which consume only dirs — were hoisted; the honest
    # number is ~300). The (1 + 1e-30*tap) perturbation is bit-exact in
    # f32; the full-tensor sum per step consumes every block (no
    # dead-code slicing) at ~one inverse read of upward bias per
    # prepare. The sync is a SCALAR fetch — fetching a whole array would
    # drag ~100MB through the tunnel and pollute the timing by seconds.
    if boxblocks is not None:
        from precond_tpu.ops.boxstencil import BOX_OFFSETS
        from precond_tpu.solver import prepare_box

        bdims = (side, side, side)

        def prep_one(dg, dr):
            return prepare_box(dg, dr, BOX_OFFSETS, bdims, cfg)

        def prep_chain(k):
            # loop body: EVERY input rides through an in-loop barrier tied
            # to the loop-carried tap, so no stage (however loop-invariant
            # its true inputs) can be hoisted out of the loop
            def run(dg, dr):
                def step(dg_, dr_, tap):
                    d2, r2 = jax.lax.optimization_barrier(
                        (dg_ * (1.0 + 1e-30 * tap), dr_)
                    )
                    return prepare_box(d2, r2, BOX_OFFSETS, bdims, cfg)

                def body(_, tap):
                    return jnp.sum(inv_leaf(step(dg, dr, tap))).astype(
                        jnp.float32
                    )

                tap = jax.lax.fori_loop(0, k - 1, body, jnp.float32(0))
                return step(dg, dr, tap), tap

            return jax.jit(run)

        prep_args = boxblocks
        inv_of = inv_leaf
    elif gridblocks is not None:
        dgr, drr, goffsets = gridblocks

        def prep_one(dg, dr, s, o):
            return prepare_grid(dg, dr, goffsets, gmk, cfg, s, o)

        def prep_chain(k):
            # in-loop barrier over EVERY input (incl. stencils: their
            # collision placement must re-run per step, not hoist)
            def run(dg, dr, s, o):
                def step(tap):
                    d2, r2, s2, o2 = jax.lax.optimization_barrier(
                        (dg * (1.0 + 1e-30 * tap), dr, s, o)
                    )
                    return prepare_grid(d2, r2, goffsets, gmk, cfg, s2, o2)

                def body(_, tap):
                    return jnp.sum(inv_leaf(step(tap))).astype(jnp.float32)

                tap = jax.lax.fori_loop(0, k - 1, body, jnp.float32(0))
                return step(tap), tap

            return jax.jit(run)

        prep_args = (dgr, drr, stencils, maps.orig_to_sorted)
        inv_of = inv_leaf
    else:
        if ell is None:
            ell = cloth.assemble_system(mesh)   # general path needs it now

        def prep_one(e, m, s):
            return prepare_with_system(e, m, cfg, s, analytic_hier=analytic_hier)

        def prep_chain(k):
            # in-loop barrier over EVERY input: the hierarchy build and
            # index permutes consume only loop-invariant idx/mask and
            # would otherwise hoist out of the loop entirely
            def run(e, m, s):
                def step(tap):
                    e2, m2, s2 = jax.lax.optimization_barrier(
                        (e._replace(diag=e.diag * (1.0 + 1e-30 * tap)), m, s)
                    )
                    return prepare_with_system(
                        e2, m2, cfg, s2, analytic_hier=analytic_hier
                    )[0]

                def body(_, tap):
                    return jnp.sum(inv_leaf(step(tap).inv96)).astype(
                        jnp.float32
                    )

                tap = jax.lax.fori_loop(0, k - 1, body, jnp.float32(0))
                return step(tap), tap

            return jax.jit(run)

        prep_args = (ell, maps, stencils)
        inv_of = lambda out: inv_leaf(out.inv96)  # noqa: E731

    # prepare wall: difference a 1-prepare and a PK-prepare chained
    # dispatch and divide by PK-1 — a longer chain averages contention
    # over more device work than the old 1-vs-2 pair (the dominant noise
    # source in the recorded prepare_ms; the chip is shared)
    # chain length scales down with problem size: >2 chained 1M-vertex
    # prepares exceed 16GB HBM at buffer assignment
    # loop-carried chains compile at one-prepare size (the old unrolled
    # 5-chain at 262k reproducibly exceeded the remote compiler); large
    # configs still cap the chain so a timed dispatch stays well under
    # the tunnel worker's watchdog
    PK = int(os.environ.get("BENCH_PREP_CHAIN", "5" if n < (1 << 18) else "3"))
    prep = prep_chain(1)
    prepk = prep_chain(PK)

    def phase(msg):
        if os.environ.get("BENCH_DEBUG"):
            print(f"[bench] {msg}", file=sys.stderr, flush=True)

    phase("setup done; timing prepare")

    def run_chain(fn):
        out, acc = fn(*prep_args)
        sync(inv_of(out)[0, 0, :1])
        sync(acc)
        return out

    out = run_chain(prep)
    phase("prep chain1 compiled+ran")
    t_one = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = run_chain(prep)
        t_one = min(t_one, time.perf_counter() - t0)
    phase("prep chain1 timed; compiling chainK")
    run_chain(prepk)
    phase("prep chainK compiled+ran")
    t_k = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_chain(prepk)
        t_k = min(t_k, time.perf_counter() - t0)
    # the k-chain pays k prepares + (k-1) anti-DCE full-tensor sums; each
    # sum reads the inverse once (~0.1 ms at 65k), biasing prepare_ms UP
    # by one inverse read per prepare — conservative, never flattering
    prepare_s = max((t_k - t_one) / (PK - 1), 1e-9)
    dispatch_s = max(t_one - prepare_s, 0.0)
    if ell is None:
        ell = cloth.assemble_system(mesh)
    if ssys == "deferred":
        ssys = cloth.assemble_system_stencil(
            mesh, positions=positions,
            sym=os.environ.get("BENCH_SPMV_SYM", "0") == "1",
        )
    if gridblocks is not None or boxblocks is not None:
        inv96 = out
        state, ells, b_sorted = None, None, None
    else:
        state = out
        ells = prepare_with_system(ell, maps, cfg, stencils,
                                   analytic_hier=analytic_hier)[1]
        inv96 = state.inv96
        b_sorted = jnp.take(b, state.sorted_to_orig, axis=0)

    # ---- iteration throughput: k fused PCG iterations --------------------
    # NOTE: big arrays must be jit ARGUMENTS, not closures — closed-over
    # arrays are embedded as program constants and the remote-compile
    # request blows past the tunnel's size limit at 1M vertices.
    # Whole solve lives in Morton-sorted space (b permuted once above):
    # drops the two N-row permute gathers per iteration that the
    # original-order precondition() pays, and makes SpMV gathers local.
    cm_solve = False
    if gridblocks is not None and isinstance(inv96, (PackedInverseCM, DenseInverseCM)):
        # comp-major solve: [3,N] carries, spmv_t, MXU-oriented patch
        # crossings, comp-plane packed apply. Measured 8.53 -> 5.07 ms/iter
        # at 1M on v5e (scripts/probe_crossing_fix.py): the row-major
        # crossings' composed carry-relayout penalty is the difference.
        from precond_tpu.ops.gridapply import precondition_grid_cm

        cm_solve = True

        def pre_op(st, r):
            rs = gm.grid_to_morton_cm(r, gmk)
            return gm.morton_to_grid_cm(precondition_grid_cm(st, rs, cfg), gmk)

        spmv_op, b_iter, state = ssys, jnp.transpose(b), inv96
    elif gridblocks is not None:
        # grid-order solve; grid<->Morton crossings picked by size (selector
        # matmul <= 512 grids, streaming transpose above); static-transfer
        # apply (state is just inv96)
        _g2m, _m2g = gm.crossing_pair(gmk)

        def pre_op(st, r):
            return _m2g(precondition_grid(st, _g2m(r, gmk), cfg), gmk)

        spmv_op, b_iter, state = ssys, b, inv96
    elif ssys is not None and gmk is not None:
        # grid-order solve; grid<->Morton crossings picked by size
        _g2m, _m2g = gm.crossing_pair(gmk)

        def pre_op(st, r):
            return _m2g(precondition_sorted(st, _g2m(r, gmk), cfg), gmk)

        spmv_op, b_iter = ssys, b
    elif ssys is not None:
        # grid-order solve: stencil SpMV + orig-order precondition
        spmv_op, pre_op, b_iter = ssys, lambda st, r: precondition(st, r, cfg), b
    elif bsys is not None and analytic_hier:
        # box-order solve: 3-D stencil SpMV (zero gathers) + static-
        # transfer apply crossed via analytic box transforms (state is
        # just inv96 from prepare_box)
        def pre_op(st, r):
            rs = bm.box_to_morton(r, side, side, side)
            zs = precondition_grid(st, rs, cfg)
            return bm.morton_to_box(zs, side, side, side)

        spmv_op, b_iter, state = bsys, b, inv96
    elif analytic_hier:
        # sorted-space solve with the static-transfer apply (3-D box path)
        spmv_op, b_iter = ells, b_sorted
        pre_op = lambda st, r: precondition_grid(st.inv96, r, cfg)  # noqa: E731
    else:
        spmv_op, pre_op, b_iter = ells, lambda st, r: precondition_sorted(st, r, cfg), b_sorted
    if ssys is not None and contact is not None:
        # slot-sorted scatter-free rank-1 contact SpMV (ops/contact.py
        # ContactSlots): same operator as the compact-row ELL (which stays
        # for the nnz count + Jacobi diagonal); plane layout, zero
        # scatters, comp-major native
        from precond_tpu.ops.contact import slot_contact_spmv_t

        spmv_op = (spmv_op, cslots)

        if cm_solve:
            def spmv_fn(op, v):
                return gridstencil.spmv_t(op[0], v) + slot_contact_spmv_t(op[1], v)
        else:

            def spmv_fn(op, v):
                return gridstencil.spmv(op[0], v) + jnp.transpose(
                    slot_contact_spmv_t(op[1], jnp.transpose(v))
                )
    elif cm_solve:
        spmv_fn = gridstencil.spmv_t
    elif ssys is not None and os.environ.get("BENCH_SPMV_PALLAS", "0") == "1":
        # fused one-pass Pallas stencil SpMV (A/B hook vs the einsum form)
        from precond_tpu.ops.pallas.stencil_spmv import spmv_system

        interp = jax.default_backend() == "cpu"
        spmv_fn = lambda op, v: spmv_system(op, v, interpret=interp)  # noqa: E731
    elif ssys is not None:
        spmv_fn = gridstencil.spmv
    elif bsys is not None:
        from precond_tpu.ops import boxstencil as _bst

        spmv_fn = _bst.spmv
    else:
        spmv_fn = blockcsr.spmv

    def k_iterations(k):
        def run(op, state, b):
            def body(_, carry):
                x, r, p, z, rz = carry
                q = spmv_fn(op, p)
                alpha = rz / jnp.sum(p * q)
                x = x + alpha * p
                r = r - alpha * q
                z = pre_op(state, r)
                rz_new = jnp.sum(r * z)
                p = z + (rz_new / rz) * p
                return (x, r, p, z, rz_new)

            z0 = pre_op(state, b)
            init = (jnp.zeros_like(b), b, z0, z0, jnp.sum(b * z0))
            return jax.lax.fori_loop(0, k, body, init)[0][0, :1]

        return jax.jit(run)

    # Dispatch-cancelled per-iteration time: the tunnel's per-dispatch+fetch
    # floor (~20-40 ms some sessions) would otherwise be smeared across the
    # k iterations; run k and 3k chains and difference (same trick as
    # prepare above).
    t_k = {}
    for k in (iters, 3 * iters):
        phase(f"compiling k_iterations({k})")
        kit = k_iterations(k)
        sync(kit(spmv_op, state, b_iter))  # compile + warm
        phase(f"k_iterations({k}) ran")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(kit(spmv_op, state, b_iter))
            best = min(best, time.perf_counter() - t0)
        t_k[k] = best
    iter_s = max((t_k[3 * iters] - t_k[iters]) / (2 * iters), 1e-9)

    nnz_spmv = int(9 * (n + int(np.asarray(ell.mask).sum())))
    if contact is not None:
        nnz_spmv += int(9 * int(np.asarray(contact.mask).sum()))
    if isinstance(inv96, (PackedInverse, PackedInverseCM)):
        # packed-symmetric storage: 4704 stored floats per block (the
        # reference's packed count) — the honest per-iteration data volume
        nblocks = int(inv96.nb)
        nnz_apply = int(nblocks * 4704)
    elif isinstance(inv96, DenseInverseCM):
        nblocks = inv96.m.shape[-1]
        nnz_apply = int(nblocks * 96 * 96)
    else:
        nblocks = inv96.shape[0]
        nnz_apply = int(nblocks * 96 * 96)
    nnz_per_iter = nnz_spmv + nnz_apply
    nnz_per_s = nnz_per_iter / iter_s

    # ---- solve-time speedup vs block-Jacobi ------------------------------
    def schwarz_solve(e, st, bb):
        return pcg(lambda v: spmv_fn(e, v), lambda r: pre_op(st, r), bb,
                   tol=1e-4, max_iters=2000, check_every=8)

    # Jacobi gets the SAME (fastest available) SpMV — it benchmarks the
    # preconditioner, not the matrix representation. On the general path
    # that means the SORTED ELL (identical spectrum; the unsorted ELL's
    # random gathers cost ~2x per iteration, and 544 x ~95 ms unsorted
    # put the chained jacobi dispatch past the tunnel worker's watchdog
    # at 1M — reproducible "TPU worker crashed").
    jac_op = spmv_op if (ssys is not None or bsys is not None) else ells
    jb = (jnp.transpose(b) if cm_solve
          else (b if (ssys is not None or bsys is not None) else b_sorted))

    if cm_solve:
        # Jacobi rides the same comp-major carries (same SpMV, transpose-
        # free 3x3 apply) — the baseline gets the layout win too
        def jacobi_solve(e, dinv, bb):
            return pcg(lambda v: spmv_fn(e, v),
                       lambda r: jnp.einsum("nij,jn->in", dinv, r), bb,
                       tol=1e-4, max_iters=20000, check_every=8)
    else:
        def jacobi_solve(e, dinv, bb):
            return pcg(lambda v: spmv_fn(e, v),
                       lambda r: jnp.einsum("nij,nj->ni", dinv, r), bb,
                       tol=1e-4, max_iters=20000, check_every=8)

    # block-Jacobi of the FULL system (incl. contact diagonal fill-in);
    # diag follows the ordering jacobi actually solves in
    if ssys is None and bsys is None:
        jdiag = ells.diag
    else:
        jdiag = ell.diag if contact is None else ell.diag + contact.diag
    dinv = jnp.linalg.inv(jdiag)

    # Solve walls, dispatch-cancelled by PAIR DIFFERENCING (same trick as
    # prepare): time a one-solve dispatch and a chained two-solve dispatch
    # (second on a data-dependent perturbed rhs so CSE can't collapse it)
    # and difference. This removes the tunnel's variable per-dispatch floor
    # from the measurement itself instead of subtracting the separately
    # inferred dispatch_s (which the round-2 advisor flagged as fragile).
    # A real sim runs many steps per dispatch, so the floor is not part of
    # either solver's cost; raw one-solve walls stay in the JSON.
    # Solves chained per timed rep: at 65k a single ~40 ms cloth solve can
    # sink into the tunnel's 30-80 ms dispatch floor (r4 record: one
    # cloth-256 rep's ratio collapsed to 1.02 while the median was 1.72).
    # CH chained solves per rep make each rep's differenced wall CH x
    # larger than the floor. Only the fast cloth configs need it: the
    # collide/tet/general solves run hundreds of iterations (seconds) —
    # far above the floor — and a CH=5-solve jacobi chain at contact
    # stiffness would put minutes into ONE dispatch, which the tunnel's
    # worker watchdog kills ("TPU worker process crashed").
    # chain 4 for every config up to ~262k verts: 1-chain differencing of
    # ~1 s solves against the spiky floor swung tet:48 1.74 <-> 3.80
    # across same-code sessions (r5). The use_chain guard below falls
    # back to RAW walls whenever the chained dispatch would approach the
    # worker watchdog, so long-solve configs (collide, general:1024)
    # self-select out.
    ch_default = "4" if n <= (1 << 18) else "1"
    CH = int(os.environ.get("BENCH_SOLVE_CHAIN", ch_default))

    def solve_jits(solve_fn):
        def chain(op, st, b1):
            ra = solve_fn(op, st, b1)
            rb = ra
            for _ in range(CH):
                b2 = jax.lax.optimization_barrier(
                    b1 * (1.0 + 1e-6) + 0.0 * rb.x[0, 0]
                )
                rb = solve_fn(op, st, b2)
            return ra, rb

        return jax.jit(solve_fn), jax.jit(chain)

    def timed_once(fn, args, fetch):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(fetch(out))
        return out, time.perf_counter() - t0

    # The two solvers' reps are INTERLEAVED so a sustained noisy-neighbor
    # phase on the shared chip degrades both walls rather than whichever
    # solver happened to be measured during it (the ratio is the metric).
    s1, s2 = solve_jits(schwarz_solve)
    j1, j2 = solve_jits(jacobi_solve)
    sargs = (spmv_op, state, b_iter)
    jargs = (jac_op, dinv, jb)
    fetch1 = lambda r: r.x[0, :1]  # noqa: E731
    fetch2 = lambda r: r[1].x[0, :1]  # noqa: E731
    phase("compiling solves")
    rs, ts_warm = timed_once(s1, sargs, fetch1)  # warm/compile
    rs, ts_warm = timed_once(s1, sargs, fetch1)
    rj, tj_warm = timed_once(j1, jargs, fetch1)
    # Chained (dispatch-differencing) solves only when the singles are
    # small enough that (a) the dispatch floor matters (>2% of a 2 s
    # solve it does not) and (b) the chained dispatch stays well under
    # the tunnel worker's watchdog (a chained ~50 s jacobi at 1M-general
    # reproducibly killed the worker).
    use_chain = (ts_warm + tj_warm) * (CH + 1) < float(
        os.environ.get("BENCH_CHAIN_MAX_S", "30")
    )
    if use_chain:
        phase("single solves ran; compiling chained solves")
        timed_once(s2, sargs, fetch2)
        timed_once(j2, jargs, fetch2)
    phase("chained solves ran; timing reps")
    reps = int(os.environ.get("BENCH_SOLVE_REPS", "5"))
    rep_rows = []
    for _ in range(reps):
        rs, a = timed_once(s1, sargs, fetch1)
        rj, b_ = timed_once(j1, jargs, fetch1)
        if use_chain:
            _, c = timed_once(s2, sargs, fetch2)
            _, d = timed_once(j2, jargs, fetch2)
        else:
            # raw walls ARE the measurement: the floor is <2% here
            # (shaped so (c - a) / CH == a for any CH)
            c, d = (1 + CH) * a, (1 + CH) * b_
        rep_rows.append((a, b_, c, d))
    ts1 = min(r[0] for r in rep_rows)
    tj1 = min(r[1] for r in rep_rows)
    ts2 = min(r[2] for r in rep_rows)
    tj2 = min(r[3] for r in rep_rows)
    t_schwarz_raw, t_schwarz_iter = ts1, max((ts2 - ts1) / CH, 1e-9)
    t_jacobi_raw, t_jacobi = tj1, max((tj2 - tj1) / CH, 1e-9)
    t_schwarz = t_schwarz_iter + prepare_s
    # per-rep ratios: each interleaved rep yields its own pair-differenced
    # walls, so the spread across reps bounds the noise of the headline
    # ratio (VERDICT r3 weak #1: one recorded rep is a thin base)
    rep_ratios = sorted(
        max((d - b_) / CH, 1e-9) / (max((c - a) / CH, 1e-9) + prepare_s)
        for a, b_, c, d in rep_rows
    )
    ratio_median = rep_ratios[len(rep_ratios) // 2]

    # amortized-frame ratio: K solves per prepare (reference cadence:
    # hierarchy/inverse rebuilt per Newton step, re-sorted every 17 frames)
    frame_k = int(os.environ.get("BENCH_FRAME_SOLVES", "4"))
    vs_frames = (frame_k * t_jacobi) / (frame_k * t_schwarz_iter + prepare_s)

    # With pair differencing the dispatch floor no longer enters the
    # ratios; keep the flag for the (now informational) dispatch_ms field.
    dispatch_suspect = dispatch_s > 0.5 * min(t_schwarz_raw, t_jacobi_raw)

    return {
        "metric": "pcg_iteration_nnz_throughput",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(t_jacobi / t_schwarz, 3),
        "vs_baseline_min": round(rep_ratios[0], 3),
        "vs_baseline_median": round(ratio_median, 3),
        "vs_baseline_excl_prepare": round(t_jacobi / t_schwarz_iter, 3),
        "vs_baseline_frames": round(vs_frames, 3),
        "frame_solves": frame_k,
        "solve_reps": reps,
        "solve_chain": CH,
        "config": config,
        "grid": grid,
        "num_verts": n,
        "iter_ms": round(iter_s * 1e3, 4),
        "prepare_ms": round(prepare_s * 1e3, 2),
        "dispatch_ms": round(dispatch_s * 1e3, 2),
        "nnz_spmv": nnz_spmv,
        "nnz_apply": nnz_apply,
        "schwarz_iters": int(rs.iterations),
        "jacobi_iters": int(rj.iterations),
        # recorded so a numerically poisoned solve (NaN residual -> the
        # while_loop exits at its first check) can never read as a win
        "schwarz_rel": float(np.asarray(rs.rel_residual)),
        "jacobi_rel": float(np.asarray(rj.rel_residual)),
        "schwarz_solve_ms": round(t_schwarz * 1e3, 2),
        "jacobi_solve_ms": round(t_jacobi * 1e3, 2),
        "schwarz_solve_raw_ms": round(t_schwarz_raw * 1e3, 2),
        "jacobi_solve_raw_ms": round(t_jacobi_raw * 1e3, 2),
        **({"dispatch_suspect": True} if dispatch_suspect else {}),
        "device": str(jax.devices()[0]),
    }


def main():
    """Run the BENCH_CONFIGS list, one JSON line each, headline last.

    A failing config prints an error line and does not abort the rest —
    the driver's record should never be empty because one size OOMed.
    BENCH_CONFIG (+BENCH_GRID) runs exactly one config, as in round 3.
    """
    # persistent compilation cache: the tunneled remote-compile service is
    # slow and drops long-running compiles; caching lets a retried or
    # multi-config run reuse every program that ever compiled successfully
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if os.environ.get("BENCH_CONFIG"):
        specs = [
            (os.environ["BENCH_CONFIG"], int(os.environ.get("BENCH_GRID", "256")))
        ]
    else:
        # headline (last line, what the driver's parse lands on) is the
        # flagship 1M config: the BASELINE.json:9 scale target, and the
        # noise-robust one — its ~700 ms solves dwarf the tunnel's
        # 30-80 ms dispatch floor, where the 65k config's ~47 ms solves
        # do not (cloth-256 swung 1.15-1.45 across sessions on identical
        # code; cloth-1024 reproduced 1.930/1.935 across two runs)
        # tet at 48^3 = 110k verts: big enough that the ~600 ms solves
        # dwarf the dispatch floor (tet:32's 40 ms solves did not —
        # dispatch_suspect + a degenerate 0.0 rep in the r4 record).
        # tet:64 (2^k sides) rides the STATIC box path; general:1024 is
        # the arbitrary-mesh contract at flagship scale (VERDICT r4
        # missing #2).
        default = ("collide:256,tet:48,tet:64,general:256,general:1024,"
                   "cloth:256,cloth:1024")
        specs = []
        for part in os.environ.get("BENCH_CONFIGS", default).split(","):
            name, _, sz = part.strip().partition(":")
            specs.append((name, int(sz or "256")))
    retries = int(os.environ.get("BENCH_RETRIES", "2"))
    for name, sz in specs:
        # the tunneled remote-compile service intermittently drops
        # ~100s+ compiles (HTTP 500); every program that DID compile is
        # in the persistent cache, so a retry resumes where it failed
        for attempt in range(retries + 1):
            try:
                row = run_config(name, sz)
            except Exception as e:  # noqa: BLE001
                row = {
                    "metric": "pcg_iteration_nnz_throughput",
                    "config": name,
                    "grid": sz,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            transient = "remote_compile" in row.get("error", "") or (
                "UNAVAILABLE" in row.get("error", "")
            )
            if "error" not in row or not transient or attempt == retries:
                break
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
