"""Per-stage roofline / MFU table (VERDICT r2 item 4).

For each TPU stage of the framework, this measures a FUSED single-jit
loop (per CLAUDE.md the relay makes stage-by-stage dispatch timing
meaningless; a fused loop amortises it), computes ANALYTIC flops and
minimum HBM bytes from the shapes, and reports achieved GF/s, GB/s, the
percent of peak for whichever bound binds, and which bound that is.

Peaks (per chip): TPU v5e 197 TFLOP/s bf16, ~1/6 of that for
f32-HIGHEST (6-pass bf16 emulation), 819 GB/s HBM.  On a CPU backend the
table still prints (achieved numbers only; peak percentages are marked
n/a) so the harness can be validated offline.

Usage: python scripts/bench_roofline.py [--json]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

V5E_BF16 = 197e12
V5E_F32 = V5E_BF16 / 6.0
V5E_HBM = 819e9


def _measure(fn, fetch, reps=5):
    """Fused-loop timing: fetch-forced warmup, median of blocked reps."""
    import jax

    out = fn()
    fetch(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _row(name, seconds, flops, bytes_, on_tpu, note=""):
    gfs = flops / seconds / 1e9
    gbs = bytes_ / seconds / 1e9
    if on_tpu:
        pct_c = 100.0 * (flops / seconds) / V5E_F32
        pct_b = 100.0 * (bytes_ / seconds) / V5E_HBM
        bound = "compute" if pct_c >= pct_b else "HBM"
        pct = max(pct_c, pct_b)
    else:
        bound, pct = "n/a", float("nan")
    return {"stage": name, "s": round(seconds, 4),
            "GF": round(flops / 1e9, 2), "GB": round(bytes_ / 1e9, 3),
            "GF/s": round(gfs, 1), "GB/s": round(gbs, 1),
            "bound": bound, "pct_of_peak": round(pct, 1), "note": note}


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    dt_bytes = 4  # f32
    rows = []
    rng = np.random.default_rng(0)

    # ---- Sinkhorn, XLA loop and Pallas kernel: 64 x 256x256, 200 iters --
    B, S, D, IT = 64, 256, 256, 200
    s = rng.uniform(0.5, 2, (B, S)).astype(np.float32)
    d = rng.uniform(0.5, 2, (B, D)).astype(np.float32)
    d *= (s.sum(1) / d.sum(1))[:, None]
    M = rng.uniform(0, 5, (B, S, D)).astype(np.float32)
    # per iteration: two stabilised logsumexp sweeps over the cost block
    # ~ 8 flops/cell each (sub, exp, sum, log, max); min HBM traffic is
    # one stream of M per iteration (XLA: 2 streams, one per sweep)
    sink_flops = 16.0 * B * S * D * IT
    import jax as _jax

    from smart_crossover_tpu.solvers.sinkhorn import sinkhorn_plan

    sk_xla = _jax.jit(_jax.vmap(
        lambda s_, d_, M_: sinkhorn_plan(s_, d_, M_, 0.05, num_iters=IT,
                                         round_plan=False)))
    t = _measure(lambda: sk_xla(s, d, M),
                 lambda o: float(np.asarray(o).sum()))
    rows.append(_row(f"sinkhorn XLA {B}x{S}x{D} x{IT}", t, sink_flops,
                     2.0 * B * S * D * dt_bytes * IT, on_tpu,
                     "2 M-streams/iter"))
    if on_tpu:
        try:
            from smart_crossover_tpu.ops.sinkhorn_pallas import (
                sinkhorn_plan_pallas,
            )

            t = _measure(lambda: sinkhorn_plan_pallas(s, d, M, 0.05,
                                                      num_iters=IT),
                         lambda o: float(np.asarray(o).sum()))
            rows.append(_row(f"sinkhorn Pallas {B}x{S}x{D} x{IT}", t,
                             sink_flops, B * S * D * dt_bytes, on_tpu,
                             "M VMEM-resident"))
        except Exception as e:  # pragma: no cover - shape/backend gate
            print(f"# sinkhorn pallas skipped: {e}", file=sys.stderr)

    # ---- Boruvka MST (one-hot matmul form): 64 x 256x256 ----------------
    from smart_crossover_tpu.ops.mst import boruvka_bipartite_mst

    W = rng.uniform(0, 1, (B, S, D)).astype(np.float32)
    fn = jax.jit(jax.vmap(boruvka_bipartite_mst))
    t = _measure(lambda: fn(W), lambda o: float(np.asarray(o).sum()))
    V = S + D
    K = int(np.ceil(np.log2(V)))
    # per round: component one-hot builds + contractions, O(log V) rounds
    mst_bytes = B * K * 6 * V * V * dt_bytes
    rows.append(_row(f"boruvka MST {B}x{S}x{D}", t,
                     2.0 * B * K * S * D * 8, mst_bytes, on_tpu,
                     "one-hot contractions, bytes dominate"))

    # ---- device simplex engines: per-pivot cost at 256^2 -----------------
    from smart_crossover_tpu.parallel.batched import (
        batched_tnet_exact_device,
    )

    for engine in ("parent", "anc"):
        Bp = 16
        t_all = _measure(
            lambda e=engine: batched_tnet_exact_device(
                s[:Bp], d[:Bp], M[:Bp], reg=0.005, sinkhorn_iters=200,
                max_pivots=20000, engine=e),
            lambda o: float(np.asarray(o[1]).sum()))
        out = batched_tnet_exact_device(s[:Bp], d[:Bp], M[:Bp], reg=0.005,
                                        sinkhorn_iters=200,
                                        max_pivots=20000, engine=engine)
        piv = float(np.asarray(out[3]).max())
        if engine == "parent":
            # K one-hot lifting rounds x (V,V) + 2 (V,S)x(S,D) cell matmuls
            pp_flops = Bp * (2 * K * 4 * V * V + 2 * 2 * V * S * D
                             + 3 * S * D)
            pp_bytes = Bp * (K * 3 * V * V + 2 * S * D) * dt_bytes
        else:
            # pricing + ~6 bool (V,V) elementwise + one (3,V)x(V,V)
            pp_flops = Bp * (3 * S * D + 2 * 3 * V * V)
            pp_bytes = Bp * (6 * V * V * 1 + V * V * dt_bytes
                             + S * D * dt_bytes)
        rows.append(_row(
            f"simplex[{engine}] {Bp}x{S}x{D} ({piv:.0f} piv max)",
            t_all, pp_flops * piv, pp_bytes * piv, on_tpu,
            "per-pivot model x max pivots; includes warm-start stages"))

    # ---- PDHG: XLA loop and Pallas VMEM chunk, 1024x2048, 512 iters ------
    mP, nP, ITP = 1024, 2048, 512
    AP = (rng.standard_normal((mP, nP)) / np.sqrt(mP)).astype(np.float32)
    bP = (AP @ rng.uniform(0, 1, nP)).astype(np.float32)
    cP = rng.uniform(0.5, 1.5, nP).astype(np.float32)
    lP = np.zeros(nP, np.float32)
    uP = np.full(nP, 2.0, np.float32)
    pd_flops = 4.0 * mP * nP * ITP           # two matvecs per iteration

    from smart_crossover_tpu.solvers.pdhg import pdhg_solve

    t = _measure(lambda: pdhg_solve(AP, bP, cP, lP, uP, tol=0.0,
                                    max_iters=ITP, use_pallas=False,
                                    polish=False),
                 lambda o: float(np.asarray(o.x).sum()))
    rows.append(_row(f"PDHG XLA {mP}x{nP} x{ITP}", t, pd_flops,
                     2.0 * mP * nP * dt_bytes * ITP, on_tpu,
                     "2 A-streams/iter"))
    if on_tpu:
        try:
            t = _measure(lambda: pdhg_solve(AP, bP, cP, lP, uP, tol=0.0,
                                            max_iters=ITP, use_pallas=True,
                                            polish=False),
                         lambda o: float(np.asarray(o.x).sum()))
            chunk = 64
            rows.append(_row(f"PDHG Pallas {mP}x{nP} x{ITP}", t, pd_flops,
                             mP * nP * dt_bytes * ITP / chunk, on_tpu,
                             "A VMEM-resident per chunk"))
        except Exception as e:  # pragma: no cover
            print(f"# pdhg pallas skipped: {e}", file=sys.stderr)

    # ---- projector CG (dense normal-equations-free): 512 x 4096 ----------
    from smart_crossover_tpu.solvers.projection import apply_projector_jax

    mJ, nJ = 512, 4096
    Y = rng.standard_normal((mJ, nJ)).astype(np.float32)
    vJ = rng.standard_normal(nJ).astype(np.float32)
    CG_IT = 30
    t = _measure(lambda: apply_projector_jax(Y, vJ, tol=0.0,
                                             max_iter=CG_IT),
                 lambda o: float(np.asarray(o).sum()))
    rows.append(_row(f"projector CG {mJ}x{nJ} x{CG_IT}", t,
                     4.0 * mJ * nJ * CG_IT,
                     2.0 * mJ * nJ * dt_bytes * CG_IT, on_tpu,
                     "2 Y-streams/CG-iter"))

    backend = jax.default_backend()
    if "--json" in sys.argv:
        print(json.dumps({"backend": backend, "rows": rows}))
    else:
        print(f"backend={backend}  (peaks: v5e {V5E_F32/1e12:.0f} TF/s "
              f"f32-HIGHEST, {V5E_HBM/1e9:.0f} GB/s HBM)")
        hdr = ["stage", "s", "GF/s", "GB/s", "bound", "pct_of_peak",
               "note"]
        print(" | ".join(hdr))
        for r in rows:
            print(" | ".join(str(r[k]) for k in hdr))


if __name__ == "__main__":
    main()
