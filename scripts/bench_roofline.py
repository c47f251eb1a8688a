"""Per-stage roofline / MFU table (VERDICT r2 item 4).

Through the relay, every dispatch of a cached executable pays a LARGE and
NOISY fixed overhead (~0.4-1.6 s measured by scripts/probe_relay_overhead.py,
with outliers to several seconds), which swamps the device compute of any
single stage; naive wall-clock rates understate the hardware by 10-100x.
This harness therefore measures each FUSED SINGLE-JIT stage at a LOW and a
HIGH work configuration (more fori_loop/scan iterations, or a bigger batch
of the same pipeline), INTERLEAVING the low and high reps to reject relay
drift, and derives the rate from the marginal time

    rate = (work_hi - work_lo) / (median t_hi - median t_lo)

which cancels the fixed dispatch cost exactly.  The high configuration is
sized so the marginal compute is ~2 s — well above the relay jitter.
Host-orchestrated solvers (pdhg_solve & co.) are NOT measured here; their
fused cores (_pdhg_core with and without the Pallas chunk runner) are.

Flops and minimum HBM bytes are ANALYTIC from the shapes; the table
reports achieved GF/s, GB/s, percent of peak for whichever bound binds,
and which bound binds.  Rows whose marginal time is indistinguishable
from relay noise are marked `noise-limited` instead of reporting a bogus
rate.

Peaks (per chip): TPU v5e 197 TFLOP/s bf16, ~1/6 of that for f32-HIGHEST
(6-pass bf16 emulation), 819 GB/s HBM.  On a CPU backend the table still
prints (achieved numbers only; peak percentages are marked n/a) so the
harness can be validated offline.

Timing protocol per CLAUDE.md: fetch-forced warmup, median of blocked
reps, never min.

Usage: PYTHONPATH=. python scripts/bench_roofline.py [--json] [--reps N]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

V5E_BF16 = 197e12
V5E_F32 = V5E_BF16 / 6.0
V5E_HBM = 819e9


def _interleaved(fn_lo, fn_hi, fetch, reps):
    """Median times of lo/hi configs, reps interleaved against drift."""
    import jax

    fetch(fn_lo())          # fetch-forced warmup (see CLAUDE.md)
    fetch(fn_hi())
    tlo, thi = [], []
    for _ in range(reps):
        for fn, acc in ((fn_lo, tlo), (fn_hi, thi)):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            acc.append(time.perf_counter() - t0)
    return float(np.median(tlo)), float(np.median(thi)), out


def _row(name, t_lo, t_hi, work_ratio, flops_lo, bytes_lo, on_tpu, note=""):
    """flops_lo/bytes_lo are the analytic totals of the LOW config; the
    high config is work_ratio x that."""
    dt = t_hi - t_lo
    extra_flops = flops_lo * (work_ratio - 1.0)
    extra_bytes = bytes_lo * (work_ratio - 1.0)
    base = {"stage": name, "t_lo_s": round(t_lo, 3),
            "t_hi_s": round(t_hi, 3), "work_ratio": work_ratio,
            "note": note}
    if dt <= 0.02:          # below relay jitter: no honest rate exists
        base.update({"bound": "noise-limited", "pct_of_peak": None,
                     "GF/s": None, "GB/s": None, "marginal_s_lo": None})
        return base
    gfs = extra_flops / dt / 1e9
    gbs = extra_bytes / dt / 1e9
    if on_tpu:
        pct_c = 100.0 * gfs * 1e9 / V5E_F32
        pct_b = 100.0 * gbs * 1e9 / V5E_HBM
        bound = "compute" if pct_c >= pct_b else "HBM"
        pct = round(max(pct_c, pct_b), 1)
        if pct_b > 110.0 and bound == "HBM":
            # Achieved bandwidth exceeds the HBM-stream model: the hot
            # operand is VMEM-resident (XLA pins it across the scan), so
            # the analytic min-bytes bound does not bind.  Report against
            # the compute peak instead of printing an impossible >100%.
            bound = "VMEM-resident (HBM model void)"
            pct = round(pct_c, 1)
    else:
        bound, pct = "n/a", None
    base.update({"marginal_s_lo": round(dt / (work_ratio - 1.0), 4),
                 "GF/s": round(gfs, 1), "GB/s": round(gbs, 1),
                 "bound": bound, "pct_of_peak": pct})
    return base


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    reps = 7
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    on_tpu = jax.default_backend() == "tpu"
    dtb = 4  # f32 bytes
    rows = []
    rng = np.random.default_rng(0)

    def fetch_sum(o):
        return float(np.asarray(jax.tree_util.tree_leaves(o)[0]).sum())

    # ---- Sinkhorn (log-domain), XLA loop and Pallas kernel ---------------
    B, S, D, IT, HI = 64, 256, 256, 400, 32
    s = rng.uniform(0.5, 2, (B, S)).astype(np.float32)
    d = rng.uniform(0.5, 2, (B, D)).astype(np.float32)
    d *= (s.sum(1) / d.sum(1))[:, None]
    M = rng.uniform(0, 5, (B, S, D)).astype(np.float32)
    # per iteration: two stabilised logsumexp sweeps over the cost block
    # ~ 8 flops/cell each (sub, exp, sum, log, max); min HBM traffic one
    # stream of M per sweep (XLA: 2 streams/iter; Pallas: M VMEM-resident)
    sink_flops = 16.0 * B * S * D * IT

    from smart_crossover_tpu.solvers.sinkhorn import sinkhorn_plan

    def sk_xla(iters):
        f = jax.jit(jax.vmap(
            lambda s_, d_, M_: sinkhorn_plan(s_, d_, M_, 0.05,
                                             num_iters=iters,
                                             round_plan=False)))
        return lambda: f(s, d, M)

    t_lo, t_hi, _ = _interleaved(sk_xla(IT), sk_xla(IT * HI), fetch_sum,
                                 reps)
    rows.append(_row(f"sinkhorn XLA {B}x{S}x{D} x{IT}", t_lo, t_hi, HI,
                     sink_flops, 2.0 * B * S * D * dtb * IT, on_tpu,
                     "2 M-streams/iter"))
    if on_tpu:
        try:
            from smart_crossover_tpu.ops.sinkhorn_pallas import (
                sinkhorn_plan_pallas,
            )

            def sk_pl(iters):
                return lambda: sinkhorn_plan_pallas(s, d, M, 0.05,
                                                    num_iters=iters)

            HIP = 16
            t_lo, t_hi, _ = _interleaved(sk_pl(IT), sk_pl(IT * HIP),
                                         fetch_sum, reps)
            rows.append(_row(f"sinkhorn Pallas {B}x{S}x{D} x{IT}", t_lo,
                             t_hi, HIP, sink_flops, B * S * D * dtb,
                             on_tpu, "M VMEM-resident"))
        except Exception as e:  # pragma: no cover - shape/backend gate
            print(f"# sinkhorn pallas skipped: {e}", file=sys.stderr)

    # ---- Boruvka MST (one-hot matmul form): batch-slope 16 -> 64 ---------
    from smart_crossover_tpu.ops.mst import boruvka_bipartite_mst

    W = rng.uniform(0, 1, (B, S, D)).astype(np.float32)
    fn_mst = jax.jit(jax.vmap(boruvka_bipartite_mst))
    Blo = B // 4
    t_lo, t_hi, _ = _interleaved(lambda: fn_mst(W[:Blo]),
                                 lambda: fn_mst(W), fetch_sum, reps)
    V = S + D
    K = int(np.ceil(np.log2(V)))
    # per round: component one-hot builds + contractions, O(log V) rounds
    rows.append(_row(f"boruvka MST {Blo}x{S}x{D}", t_lo, t_hi, B / Blo,
                     2.0 * Blo * K * S * D * 8,
                     Blo * K * 6 * V * V * dtb, on_tpu,
                     "one-hot contractions, bytes dominate"))

    # ---- device simplex engines: batch-slope 16 -> 64 at 256^2 -----------
    from smart_crossover_tpu.parallel.batched import (
        batched_tnet_exact_device,
    )

    for engine in ("parent", "anc"):
        Bp, Bhi = 16, 64

        def run_eng(nb, e=engine):
            return lambda: batched_tnet_exact_device(
                s[:nb], d[:nb], M[:nb], reg=0.005, sinkhorn_iters=200,
                max_pivots=20000, engine=e)

        t_lo, t_hi, out = _interleaved(
            run_eng(Bp), run_eng(Bhi),
            lambda o: float(np.asarray(o[1]).sum()), reps)
        piv = float(np.asarray(out[3]).max())
        if engine == "parent":
            # K one-hot lifting rounds x (V,V) + 2 (V,S)x(S,D) cell matmuls
            pp_flops = Bp * (2 * K * 4 * V * V + 2 * 2 * V * S * D
                             + 3 * S * D)
            pp_bytes = Bp * (K * 3 * V * V + 2 * S * D) * dtb
        else:
            # pricing + ~6 bool (V,V) elementwise + one (3,V)x(V,V)
            pp_flops = Bp * (3 * S * D + 2 * 3 * V * V)
            pp_bytes = Bp * (6 * V * V * 1 + V * V * dtb + S * D * dtb)
        rows.append(_row(
            f"simplex[{engine}] {Bp}x{S}x{D} ({piv:.0f} piv max)",
            t_lo, t_hi, Bhi / Bp, pp_flops * piv, pp_bytes * piv, on_tpu,
            "per-pivot model x max pivots; includes warm-start stages"))

    # ---- PDHG fused core (single jit): XLA scan and Pallas VMEM chunk ----
    mP, nP, ITP, HIP = 1024, 2048, 1024, 16
    AP = (rng.standard_normal((mP, nP)) / np.sqrt(mP)).astype(np.float32)
    bP = (AP @ rng.uniform(0, 1, nP)).astype(np.float32)
    cP = rng.uniform(0.5, 1.5, nP).astype(np.float32)
    lP = np.zeros(nP, np.float32)
    uP = np.full(nP, 2.0, np.float32)
    eqP = np.zeros(mP, bool)
    x0P = np.zeros(nP, np.float32)
    y0P = np.zeros(mP, np.float32)
    pd_flops = 4.0 * mP * nP * ITP           # two matvecs per iteration

    from smart_crossover_tpu.solvers.pdhg import _pdhg_core, estimate_opnorm

    opn = float(np.asarray(estimate_opnorm(jnp.asarray(AP))))

    def pd_core(iters, runner=None):
        return lambda: _pdhg_core(AP, bP, cP, lP, uP, eqP, opn, x0P, y0P,
                                  max_iters=iters, check_every=128,
                                  restart_period=1 << 30, tol=0.0,
                                  chunk_runner=runner)

    t_lo, t_hi, _ = _interleaved(pd_core(ITP), pd_core(ITP * HIP),
                                 lambda o: float(np.asarray(o[0]).sum()),
                                 reps)
    rows.append(_row(f"PDHG core XLA {mP}x{nP} x{ITP}", t_lo, t_hi, HIP,
                     pd_flops, 2.0 * mP * nP * dtb * ITP, on_tpu,
                     "2 A-streams/iter"))
    if on_tpu:
        try:
            from smart_crossover_tpu.ops.pdhg_pallas import (
                get_pdhg_chunk_fn,
            )

            runner = get_pdhg_chunk_fn(mP, nP, "float32", 128, False)
            t_lo, t_hi, _ = _interleaved(
                pd_core(ITP, runner), pd_core(ITP * HIP, runner),
                lambda o: float(np.asarray(o[0]).sum()), reps)
            chunk = 128
            rows.append(_row(f"PDHG core Pallas {mP}x{nP} x{ITP}", t_lo,
                             t_hi, HIP, pd_flops,
                             2.0 * mP * nP * dtb * ITP / chunk, on_tpu,
                             "A VMEM-resident per chunk"))
        except Exception as e:  # pragma: no cover
            print(f"# pdhg pallas skipped: {e}", file=sys.stderr)

    # ---- projector CG (dense normal-equations-free) ----------------------
    from smart_crossover_tpu.solvers.projection import apply_projector_jax

    mJ, nJ, CG_IT, HIJ = 512, 4096, 100, 32
    Y = rng.standard_normal((mJ, nJ)).astype(np.float32)
    vJ = rng.standard_normal(nJ).astype(np.float32)

    def pj(iters):
        return lambda: apply_projector_jax(Y, vJ, tol=0.0, max_iter=iters)

    t_lo, t_hi, _ = _interleaved(pj(CG_IT), pj(CG_IT * HIJ), fetch_sum,
                                 reps)
    rows.append(_row(f"projector CG {mJ}x{nJ} x{CG_IT}", t_lo, t_hi, HIJ,
                     4.0 * mJ * nJ * CG_IT, 2.0 * mJ * nJ * dtb * CG_IT,
                     on_tpu, "2 Y-streams/CG-iter"))

    backend = jax.default_backend()
    if "--json" in sys.argv:
        print(json.dumps({"backend": backend,
                          "protocol": "interleaved two-point marginal "
                                      "(relay dispatch cancelled)",
                          "rows": rows}))
    else:
        print(f"backend={backend}  (peaks: v5e {V5E_F32/1e12:.0f} TF/s "
              f"f32-HIGHEST, {V5E_HBM/1e9:.0f} GB/s HBM)")
        hdr = ["stage", "t_lo_s", "t_hi_s", "GF/s", "GB/s", "bound",
               "pct_of_peak", "note"]
        print(" | ".join(hdr))
        for r in rows:
            print(" | ".join(str(r.get(k)) for k in hdr))


if __name__ == "__main__":
    main()
