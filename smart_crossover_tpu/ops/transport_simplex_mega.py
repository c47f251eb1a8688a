"""VMEM-resident Pallas megakernel transportation simplex.

Fifth-generation device simplex.  The anc/packed engines (see
ops/transport_simplex_anc.py — the readable correctness oracle this
kernel mirrors) run each pivot as a chain of small XLA HLOs; at 1024^2
the measured per-pivot cost is bounded by TPU pointer-op latency
(serialized gathers/scatters/one-hot materialisation, ~7 ns/element),
not HBM traffic — the engine sits at ~20% of the HBM roofline with the
remaining headroom unreachable from XLA (BENCH.md round 4).

This kernel holds the ENTIRE pivot state in VMEM for the whole solve —
costs M (S,D) f32, the root-path indicator matrix N (V,V) int8, the
pricing mask (S,D) int8 and the per-node vectors — and runs the complete
refresh/pricing/pivot loop inside ONE pallas_call (grid over the
instance batch).  Every per-pivot step is a blocked (128,V) VPU pass:

* pricing: Dantzig over M - u - v, blocked row minima (no argmin op);
* cycle/ratio test: two dynamic row slices of N + (1,V) lane algebra;
* N update: XOR row algebra with the per-row LCA extracted by the
  depth-compare trick, fused with subtree detection (column cl) and the
  path re-key reduce (the scatter in the XLA engines becomes a masked
  compare-reduce against the old parent vector);
* potential refresh: pot[v] = (-1)^dep[v] * sum_k N[v,k] (-1)^dep[k] w[k]
  (bipartite alternation makes the dual potential a signed path sum), a
  blocked masked matvec — no pointer jumping;
* the entering tree-cell cost is the EXACT M[ei,ej] (the XLA engines use
  the drifted-potential value u'+v'), so refreshed potentials are exact.

Scalar extraction from vectors uses masked sums throughout (TPU vector
dynamic-index extraction serializes).  Shapes are padded to multiples of
128; padded nodes hang as leaves off node 0 / column 0 with zero flow and
are baked into the pricing mask, so they can never enter or leave.

Replaces the capability the reference buys from vendor network simplex
(reference net_manager.py:211-222) for the OT/bipartite case at
reference-MNIST scale (784^2, reference scripts/mnist2ot.py:30-40) and
above.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_crossover_tpu.ops.transport_simplex_anc import (
    _tree_cells,
    build_ancestor_matrix,
)
from smart_crossover_tpu.ops.transport_simplex_parent import (
    build_parent_from_mask,
)

RB = 128   # padding granularity; also the default row-block size
# Mosaic register-allocator spill scales with the row-block size: at
# RB=128 the kernel needs ~119 MB of spill slots at V=1792 (compile
# fails); RB=64 compiles at 784^2 (measured).  Larger V uses the
# smaller block.
_RB_SPILL_CAP_V = 1024


def _pick_rb(V: int) -> int:
    return 128 if V <= _RB_SPILL_CAP_V else 64


def _rup(x: int, m: int = RB) -> int:
    return -(-x // m) * m


def _mega_kernel(S, D, tol, max_pivots, refresh, RB,
                 # SMEM scalars: [NBV, NBS] as RUNTIME values (see below)
                 counts_smem,
                 # ANY-space (HBM) inputs, full arrays
                 M_hbm, N_hbm, Bm_hbm,
                 # VMEM-blocked vector inputs (1, V)
                 parent_in, dep_in, w_in, Xv_in,
                 # outputs
                 parent_out, Xv_out, w_out, pot_out, Bm_out_hbm, stats_out,
                 # scratch
                 M_s, N_s, Bm_s, parent_s, dep_s, pot_s, w_s, Xv_s,
                 ax_s, ay_s, sems):
    V = S + D
    NBV = V // RB
    NBS = S // RB  # RB divides S and V (padded to 128 multiples)
    b = pl.program_id(0)
    f32 = jnp.float32
    inf = jnp.asarray(jnp.inf, f32)

    # ---- load instance state into VMEM ------------------------------------
    cp_m = pltpu.make_async_copy(M_hbm.at[b], M_s, sems.at[0])
    cp_n = pltpu.make_async_copy(N_hbm.at[b], N_s, sems.at[1])
    cp_b = pltpu.make_async_copy(Bm_hbm.at[b], Bm_s, sems.at[2])
    cp_m.start()
    cp_n.start()
    cp_b.start()
    cp_m.wait()
    cp_n.wait()
    cp_b.wait()

    parent_s[:, :] = parent_in[0, :, :].reshape(V, 1)
    dep_s[:, :] = dep_in[0, :, :].reshape(V, 1)
    w_s[:, :] = w_in[0, :, :].reshape(V, 1)
    Xv_s[:, :] = Xv_in[0, :, :].reshape(V, 1)
    pot_s[:, :] = jnp.zeros((V, 1), f32)

    # Block trip counts: static (concrete) bounds let Mosaic fully unroll
    # the scf.for bodies — fast, but the unrolled pivot loop needs ~119 MB
    # of register spill slots at V=1792 (measured — compile fails beyond
    # 512^2).  Large V therefore reads the counts from SMEM (a bound the
    # compiler cannot constant-fold forces real loops; an x*0 arithmetic
    # zero gets folded back to a constant and re-unrolled) at a measured
    # ~20x per-pivot serialization cost — the megakernel's documented
    # large-V disposition (BENCH.md round 5).
    if RB == 128:
        nbv_t, nbs_t = NBV, NBS          # static: unrolled, compilable here
    else:
        nbv_t = counts_smem[0]
        nbs_t = counts_smem[1]

    tid_sub = jax.lax.broadcasted_iota(jnp.int32, (RB, 1), 0)   # 0..RB-1
    vids_l = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)     # 0..V-1
    js_l = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)       # 0..D-1

    def _refresh_pot():
        """pot[v] = (-1)^dep[v] * sum_k N[v,k] (-1)^dep[k] w[k]."""
        dep_v = dep_s[:, :]
        par_sub = jnp.where((dep_v & 1) == 0, 1.0, -1.0).astype(f32)
        wh_l = (par_sub * w_s[:, :]).reshape(1, V)

        def blk(rb, _):
            rows = pl.ds(rb * RB, RB)
            nb = N_s[rows, :] != 0
            acc = jnp.sum(jnp.where(nb, wh_l, 0.0), axis=1, keepdims=True)
            par_b = jnp.where((dep_s[rows, :] & 1) == 0, 1.0,
                              -1.0).astype(f32)
            pot_s[rows, :] = acc * par_b
            return 0

        jax.lax.fori_loop(0, nbv_t, blk, 0)

    def _price():
        """Dantzig: (dmin, ei, ej) over non-basic cells (blocked)."""
        v_l = pot_s[S:V, :].reshape(1, D)

        def blk(rb, carry):
            dmin, ei, ej = carry
            r0 = rb * RB
            Mb = M_s[pl.ds(r0, RB), :]
            Bb = Bm_s[pl.ds(r0, RB), :] != 0
            ub = pot_s[pl.ds(r0, RB), :]
            delta = jnp.where(Bb, 0.0, Mb - ub - v_l)
            bmin = jnp.min(delta)
            rowmin = jnp.min(delta, axis=1, keepdims=True)
            rloc = jnp.min(jnp.where(rowmin <= bmin, tid_sub, RB))
            rowhit = tid_sub == rloc
            cloc = jnp.min(jnp.where(rowhit & (delta <= bmin), js_l, D))
            better = bmin < dmin
            return (jnp.where(better, bmin, dmin),
                    jnp.where(better, r0 + rloc, ei),
                    jnp.where(better, cloc, ej))

        return jax.lax.fori_loop(
            0, nbs_t, blk, (inf, jnp.int32(0), jnp.int32(0)))

    def _msum_f(vec_l, mask_l):
        return jnp.sum(jnp.where(mask_l, vec_l, 0.0))

    def _msum_i(vec_l, mask_l):
        return jnp.sum(jnp.where(mask_l, vec_l, 0))

    # TPU vector loads need tile-aligned sublane starts: fetch the aligned
    # row GROUP containing r and select the row by masked reduce.  All row
    # indicators are kept as int32 0/1 — Mosaic cannot select on i1
    # vector operands.
    sel8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    sel32 = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)

    def _row_i32(ref, r):
        base = pl.multiple_of((r // 32) * 32, 32)
        blk = ref[pl.ds(base, 32), :].astype(jnp.int32)
        return jnp.sum(jnp.where(sel32 == (r - base), blk, 0), axis=0,
                       keepdims=True)

    def _row_f32(ref, r):
        base = pl.multiple_of((r // 8) * 8, 8)
        blk = ref[pl.ds(base, 8), :]
        return jnp.sum(jnp.where(sel8 == (r - base), blk, 0.0), axis=0,
                       keepdims=True)

    def _set_i8(ref, r, col_mask_l, val):
        base = pl.multiple_of((r // 32) * 32, 32)
        blk = ref[pl.ds(base, 32), :]
        upd = jnp.where(col_mask_l, jnp.int8(val), blk)
        ref[pl.ds(base, 32), :] = jnp.where(sel32 == (r - base), upd, blk)

    def pivot_body(carry):
        it, done = carry
        dmin, ei, ej = _price()
        now_done = dmin >= -tol

        @pl.when(jnp.logical_not(now_done))
        def _():
            x_end = ei
            y_end = S + ej
            anc_xi = _row_i32(N_s, x_end)                  # (1, V) 0/1
            anc_yi = _row_i32(N_s, y_end)
            onc_i = anc_xi ^ anc_yi
            is_row_l = vids_l < S
            sign_l = jnp.where(onc_i > 0,
                               jnp.where(anc_xi > 0,
                                         jnp.where(is_row_l, -1.0, 1.0),
                                         jnp.where(is_row_l, 1.0, -1.0)),
                               0.0).astype(f32)

            Xv_l = Xv_s[:, :].reshape(1, V)
            dep_l = dep_s[:, :].reshape(1, V)
            parent_l = parent_s[:, :].reshape(1, V)
            w_l = w_s[:, :].reshape(1, V)

            # sign < 0 implies on-cycle (off-cycle sign is exactly 0)
            ratios = jnp.where(sign_l < -0.5, Xv_l, inf)
            theta = jnp.min(ratios)
            cl = jnp.min(jnp.where(ratios <= theta + 1e-12, vids_l, V))

            cl_l = vids_l == cl
            dep_cl = _msum_i(dep_l, cl_l)
            on_x = _msum_i(anc_xi, cl_l) > 0
            e_same = jnp.where(on_x, x_end, y_end)
            e_other = jnp.where(on_x, y_end, x_end)
            nes_i = jnp.where(on_x, anc_xi, anc_yi)
            neo_i = jnp.where(on_x, anc_yi, anc_xi)

            src_i = jnp.where(dep_l >= dep_cl, nes_i, 0)
            src_i = jnp.where(cl_l, 0, src_i)
            Xvu_l = Xv_l + sign_l * theta
            # (V, 4) re-key values, src-masked: one MXU matmul per block
            # replaces four masked reductions (and their register pressure)
            src_f = src_i.astype(f32).reshape(V, 1)
            vals4 = jnp.concatenate(
                [Xvu_l.reshape(V, 1), w_l.reshape(V, 1),
                 vids_l.astype(f32).reshape(V, 1),
                 jnp.ones((V, 1), f32)], axis=1) * src_f
            # entering tree-cell cost: the EXACT M[ei, ej]
            m_enter = _msum_f(_row_f32(M_s, ei), js_l == ej)
            row_shift = jnp.where(on_x, dmin, -dmin).astype(f32)

            ax_s[:, :] = anc_xi.reshape(V, 1)
            ay_s[:, :] = anc_yi.reshape(V, 1)

            # leaving arc (li, lj) from cl's OLD parent
            p_cl = _msum_i(parent_l, cl_l)
            li = jnp.where(cl < S, cl, p_cl)
            lj = jnp.where(cl < S, p_cl - S, cl - S)

            def blk(rb, _):
                t0 = rb * RB
                rows = pl.ds(t0, RB)
                nb = N_s[rows, :].astype(jnp.int32)        # (RB, V) 0/1
                common = nb & nes_i
                lca_dep = jnp.max(jnp.where(common > 0, dep_l, -1), axis=1,
                                  keepdims=True)
                lca_bit = jnp.where(dep_l == lca_dep, common, 0)
                nn = (nb ^ nes_i) | lca_bit | neo_i
                C_blk = jnp.sum(jnp.where(cl_l, nb, 0), axis=1,
                                keepdims=True) > 0
                nw = jnp.where(C_blk, nn, nb)
                N_s[rows, :] = nw.astype(jnp.int8)
                dep_b_old = dep_s[rows, :]
                dep_s[rows, :] = jnp.sum(nw, axis=1, keepdims=True) - 1

                # path re-key: values move child -> old parent along the
                # reversed segment; targets along a root path are distinct,
                # so each row of E has at most one nonzero and the matmul
                # gathers exactly (no rounding)
                t_ids = t0 + tid_sub
                E_f = jnp.where(parent_l == t_ids, 1.0, 0.0).astype(f32)
                moved = jax.lax.dot_general(
                    E_f, vals4, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)     # (RB, 4)
                hit_i = moved[:, 3:4].astype(jnp.int32)
                hit = hit_i > 0
                child = moved[:, 2:3].astype(jnp.int32)
                mXv = moved[:, 0:1]
                mw = moved[:, 1:2]

                # block-local sublane vectors from the anc scratch + iota
                ax_b = ax_s[rows, :]
                ay_b = ay_s[rows, :]
                is_row_b = t_ids < S
                onc_b = ax_b ^ ay_b
                sign_b = jnp.where(
                    onc_b > 0,
                    jnp.where(ax_b > 0, jnp.where(is_row_b, -1.0, 1.0),
                              jnp.where(is_row_b, 1.0, -1.0)),
                    0.0).astype(f32)
                nes_b = jnp.where(on_x, ax_b, ay_b)
                seg_hit = jnp.where(dep_b_old >= dep_cl,
                                    nes_b * hit_i, 0) > 0
                es_b = t_ids == e_same

                Xv_b = Xv_s[rows, :] + sign_b * theta
                Xv_b = jnp.where(hit, mXv, Xv_b)
                Xv_s[rows, :] = jnp.where(es_b, theta, Xv_b)

                w_b = jnp.where(hit, mw, w_s[rows, :])
                w_s[rows, :] = jnp.where(es_b, m_enter, w_b)

                par_b = jnp.where(seg_hit, child, parent_s[rows, :])
                parent_s[rows, :] = jnp.where(es_b, e_other, par_b)

                shift_b = jnp.where(C_blk,
                                    jnp.where(is_row_b, row_shift,
                                              -row_shift), 0.0)
                pot_s[rows, :] = pot_s[rows, :] + shift_b
                return 0

            jax.lax.fori_loop(0, nbv_t, blk, 0)

            # pricing mask: entering in, leaving out (two row-group ops)
            _set_i8(Bm_s, ei, js_l == ej, 1)
            _set_i8(Bm_s, li, js_l == lj, 0)

        return it + jnp.where(now_done, 0, 1), now_done

    def outer_body(carry):
        it, _ = carry
        _refresh_pot()
        dmin, _, _ = _price()
        done = dmin >= -tol

        it2, _ = jax.lax.while_loop(
            lambda c: jnp.logical_not(c[1]) & (c[0] < it + refresh)
            & (c[0] < max_pivots),
            pivot_body, (it, done))
        return it2, done

    pivots, optimal = jax.lax.while_loop(
        lambda c: jnp.logical_not(c[1]) & (c[0] < max_pivots),
        outer_body, (jnp.int32(0), jnp.asarray(False)))
    _refresh_pot()

    # ---- write results -----------------------------------------------------
    parent_out[0, :, :] = parent_s[:, :].reshape(1, V)
    Xv_out[0, :, :] = Xv_s[:, :].reshape(1, V)
    w_out[0, :, :] = w_s[:, :].reshape(1, V)
    pot_out[0, :, :] = pot_s[:, :].reshape(1, V)
    sidx = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    stats_out[0, :, :] = jnp.where(
        sidx == 0, pivots,
        jnp.where(sidx == 1, optimal.astype(jnp.int32), 0))
    cp_out = pltpu.make_async_copy(Bm_s, Bm_out_hbm.at[b], sems.at[3])
    cp_out.start()
    cp_out.wait()


@partial(jax.jit, static_argnames=("tol", "max_pivots", "refresh",
                                   "interpret"))
def batched_transport_simplex_mega(X, Bm, M, s=None, d=None,
                                   tol: float = 1e-7,
                                   max_pivots: int = 5000,
                                   refresh: int = 128,
                                   interpret: bool | None = None):
    """Pivot a batch of basic feasible transport plans to optimality.

    Same contract as the other device engines:
        X: (B, S, D) basic feasible plans; Bm: (B, S, D) spanning-tree
        basis masks; M: (B, S, D) costs.
    Returns (X_opt, Bm_opt, pivots, optimal_flag) with batch dims.
    """
    if interpret is None:
        from smart_crossover_tpu.config import interpret_pallas
        interpret = interpret_pallas()

    B, S, D = M.shape
    Sp, Dp = _rup(S), _rup(D)
    V = Sp + Dp
    f32 = jnp.float32
    M = jnp.asarray(M, f32)
    X = jnp.asarray(X, f32)

    # ---- pad to 128 multiples: pad nodes hang as leaves off node 0 /
    # column 0 with zero flow; every padded ARC is marked basic in the
    # pricing mask so it prices to 0 and can never enter; pad leaves are
    # never interior to a real root path so they can never leave.
    Mp = jnp.zeros((B, Sp, Dp), f32).at[:, :S, :D].set(M)
    Xp = jnp.zeros((B, Sp, Dp), f32).at[:, :S, :D].set(X)
    Bmp = jnp.zeros((B, Sp, Dp), bool).at[:, :S, :D].set(
        jnp.asarray(Bm, bool))
    if Sp > S:
        Bmp = Bmp.at[:, S:, 0].set(True)     # pad rows -> column node 0
    if Dp > D:
        Bmp = Bmp.at[:, 0, D:].set(True)     # pad cols -> row node 0
    mask0 = jnp.ones((B, Sp, Dp), bool).at[:, :S, :D].set(
        jnp.asarray(Bm, bool))               # pricing mask: pads baked in

    def setup(Xi, Bmi):
        parent0 = build_parent_from_mask(Bmi)
        N0 = build_ancestor_matrix(parent0, f32)
        dep0 = jnp.sum(N0, axis=1, dtype=jnp.int32) - 1
        ci, cj, notroot = _tree_cells(parent0, Sp, Dp)
        flat = jnp.where(notroot, ci * Dp + cj, 0)
        return parent0, N0.astype(jnp.int8), dep0, flat, notroot

    parent0, N0, dep0, flat, notroot = jax.vmap(setup)(Xp, Bmp)
    w0 = jnp.where(notroot,
                   jnp.take_along_axis(Mp.reshape(B, -1), flat, axis=1), 0.0)
    Xv0 = jnp.where(notroot,
                    jnp.take_along_axis(Xp.reshape(B, -1), flat, axis=1),
                    0.0)

    grid = (B,)
    vec_spec = pl.BlockSpec((1, 1, V), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    rb = _pick_rb(V)
    counts = jnp.array([V // rb, Sp // rb], jnp.int32)
    kern = partial(_mega_kernel, Sp, Dp, tol, max_pivots, refresh, rb)
    out_shapes = (
        jax.ShapeDtypeStruct((B, 1, V), jnp.int32),    # parent
        jax.ShapeDtypeStruct((B, 1, V), f32),          # Xv
        jax.ShapeDtypeStruct((B, 1, V), f32),          # w
        jax.ShapeDtypeStruct((B, 1, V), f32),          # pot
        jax.ShapeDtypeStruct((B, Sp, Dp), jnp.int8),   # Bm out
        jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),    # stats
    )
    out_specs = (vec_spec, vec_spec, vec_spec, vec_spec, any_spec,
                 pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM))
    parent1, Xv1, w1, pot1, Bm1, stats = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[smem_spec, any_spec, any_spec, any_spec,
                  vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((Sp, Dp), f32),          # M
            pltpu.VMEM((V, V), jnp.int8),       # N
            pltpu.VMEM((Sp, Dp), jnp.int8),     # Bm
            pltpu.VMEM((V, 1), jnp.int32),      # parent
            pltpu.VMEM((V, 1), jnp.int32),      # dep
            pltpu.VMEM((V, 1), f32),            # pot
            pltpu.VMEM((V, 1), f32),            # w
            pltpu.VMEM((V, 1), f32),            # Xv
            pltpu.VMEM((V, 1), jnp.int32),      # anc_x sublane
            pltpu.VMEM((V, 1), jnp.int32),      # anc_y sublane
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(counts, Mp, N0, mask0.astype(jnp.int8), parent0[:, None, :],
      dep0[:, None, :], w0[:, None, :], Xv0[:, None, :])

    # ---- reconstruct dense plans / basis from (parent, Xv) -----------------
    def rebuild(par, Xv):
        ci, cj, notroot_ = _tree_cells(par, Sp, Dp)
        Xo = jnp.zeros((Sp, Dp), f32).at[
            jnp.where(notroot_, ci, Sp), jnp.where(notroot_, cj, Dp)].add(
            jnp.where(notroot_, Xv, 0.0), mode="drop")
        return Xo

    X_out = jax.vmap(rebuild)(parent1[:, 0, :], Xv1[:, 0, :])[:, :S, :D]
    Bm_out = (Bm1[:, :S, :D] != 0)
    # real basic arcs only: pads were baked into the pricing mask
    pivots = stats[:, 0, 0]
    optimal = stats[:, 0, 1] > 0
    return jnp.maximum(X_out, 0.0), Bm_out, pivots, optimal


def transport_simplex_mega(X, Bm, M, s=None, d=None, tol: float = 1e-7,
                           max_pivots: int = 5000, refresh: int = 128):
    """Single-instance wrapper matching the other engines' signature."""
    Xb, Bmb, piv, opt = batched_transport_simplex_mega(
        X[None], Bm[None], M[None], None, None, tol, max_pivots, refresh)
    return Xb[0], Bmb[0], piv[0], opt[0]
