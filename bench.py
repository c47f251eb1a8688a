"""Benchmark: CERTIFIED-EXACT batched OT crossover throughput on device.

Runs the flagship exact pipeline (Sinkhorn warm start -> flow indicators ->
Borůvka MST -> tree solve -> irrigation push -> device transportation
simplex to optimality, all on device) over a batch of MNIST-scale OT
instances, then certifies every instance on the host: exact f64 flows and
duals recomputed from the returned spanning-tree basis alone, accepted
under the reference's test (artificials < 1e-8, reduced costs >= -1e-6;
reference net_manager.py:306-319).  Certification wall-clock is INCLUDED
in the headline throughput, so the reported number is end-to-end
certified-optimal instances/s/chip.

Baseline: the same warm-start pipeline implemented the way the reference
implements its crossover stage (scipy sparse MST + spsolve + sequential
numpy push; reference tree_BI.py), timed on the host CPU for a subsample.
The baseline stops at a feasible vertex (the reference then pays a vendor
network-simplex call for exactness), so vs_baseline UNDERSTATES the
speedup of the certified-exact pipeline.

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import time

import numpy as np


def make_batch(B, S, D, seed=0):
    """Generate in f64 (mass balance exact at certification precision);
    the device consumes an f32 cast, the certifier/baseline the f64."""
    rng = np.random.default_rng(seed)
    s = rng.uniform(0.5, 2.0, (B, S))
    d = rng.uniform(0.5, 2.0, (B, D))
    d *= (s.sum(axis=1) / d.sum(axis=1))[:, None]
    # MNIST-like ground cost: L1 distances on a pixel grid
    side_s = int(np.sqrt(S))
    side_d = int(np.sqrt(D))
    xs = np.stack(np.unravel_index(np.arange(S), (side_s, S // side_s)), -1)
    xd = np.stack(np.unravel_index(np.arange(D), (side_d, D // side_d)), -1)
    M0 = np.abs(xs[:, None, :] - xd[None, :, :]).sum(-1).astype(np.float64)
    M = M0[None, :, :] + rng.uniform(0, 0.1, (B, S, D))
    return s, d, M


def cpu_reference_pipeline(s, d, M, reg=0.05, sinkhorn_iters=200):
    """Reference-style host implementation (scipy MST + spsolve + python
    push loop), one instance at a time."""
    import scipy.sparse as sp

    S, D = M.shape
    eps = reg * M.max()
    # numpy log-domain sinkhorn
    f = np.zeros(S)
    g = np.zeros(D)
    logs, logd = np.log(s), np.log(d)
    for _ in range(sinkhorn_iters):
        t = (g[None, :] - M) / eps
        f = eps * (logs - (t.max(1) + np.log(
            np.exp(t - t.max(1)[:, None]).sum(1))))
        t2 = (f[:, None] - M) / eps
        g = eps * (logd - (t2.max(0) + np.log(
            np.exp(t2 - t2.max(0)[None, :]).sum(0))))
    X = np.exp((f[:, None] + g[None, :] - M) / eps)
    W = np.maximum(X / s[:, None], X / d[None, :])
    # scipy MST (reference tree_BI.py:32-59 structure)
    V = S + D
    row = np.repeat(np.arange(S), D)
    col = S + np.tile(np.arange(D), S)
    gmat = sp.coo_matrix((-W.ravel() - 1e-9, (row, col)), shape=(V, V))
    tree = sp.csgraph.minimum_spanning_tree(gmat)
    ti, tj = tree.nonzero()
    mask = np.zeros((S, D), dtype=bool)
    mask[ti, tj - S] = True
    # tree solve via spsolve on the (V-1)x(V-1) basis (reference :74-76)
    cols = np.flatnonzero(mask.ravel())
    rows_A = np.concatenate([cols // D, S + cols % D])
    cols_A = np.concatenate([np.arange(cols.size), np.arange(cols.size)])
    data_A = np.concatenate([-np.ones(cols.size), np.ones(cols.size)])
    A = sp.csc_matrix((data_A, (rows_A, cols_A)), shape=(V, cols.size))
    bb = np.concatenate([-s, d])
    sol = sp.linalg.spsolve(A[:-1, :], bb[:-1])
    Xt = np.zeros(S * D)
    Xt[cols] = sol
    Xt = Xt.reshape(S, D)
    # sequential push (reference :85-110)
    it = 0
    while Xt.min() < 0 and it < 100000:
        I1, J1 = np.unravel_index(np.argmin(Xt), Xt.shape)
        J2 = np.argmax(Xt[I1, :])
        I2 = np.argmax(Xt[:, J1])
        theta = min(-Xt[I1, J1], Xt[I1, J2], Xt[I2, J1])
        Xt[I1, J1] += theta
        Xt[I2, J1] -= theta
        Xt[I1, J2] -= theta
        Xt[I2, J2] += theta
        it += 1
    return Xt


def _device_responsive(timeout: float = 240.0) -> bool:
    """Probe the default JAX device in a SUBPROCESS: the relay-attached TPU
    in this environment can wedge (a hung dispatch can't be interrupted
    in-process), and a wedged chip must not stall the benchmark.  The
    timeout is deliberately long — killing a slow-but-alive dispatch is what
    wedges the relay in the first place."""
    import os
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready(); "
             "print('devok')"],
            timeout=timeout, capture_output=True, env=dict(os.environ))
        return r.returncode == 0 and b"devok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    """Watchdog wrapper: the device bench runs in a child process with a
    hard timeout, because the relay-attached chip can wedge MID-RUN (after
    a successful probe); on timeout or failure the benchmark re-runs on the
    CPU so the driver always gets its JSON line — tagged with the fallback
    reason so a CPU line can never be mistaken for a TPU measurement."""
    import os
    import subprocess
    import sys

    if os.environ.get("SCX_BENCH_CHILD") == "1":
        _run_bench()
        return

    env = dict(os.environ)
    env["SCX_BENCH_CHILD"] = "1"
    fallback_reason = None
    if os.environ.get("SCX_BENCH_NO_PROBE") == "1":
        fallback_reason = "probe disabled via SCX_BENCH_NO_PROBE"
    else:
        # The relay can stay wedged for tens of minutes after any
        # timeout-killed device process, so one failed probe is not proof
        # the chip is gone: retry with a long backoff before giving up.
        attempts = int(os.environ.get("SCX_BENCH_PROBE_ATTEMPTS", "3"))
        backoff = float(os.environ.get("SCX_BENCH_PROBE_BACKOFF", "240"))
        probed_ok = False
        for i in range(attempts):
            if _device_responsive():
                probed_ok = True
                break
            if i + 1 < attempts:
                time.sleep(backoff)
        if not probed_ok:
            fallback_reason = (
                f"device probe failed {attempts}x (backoff {backoff:.0f}s)")
        else:
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, timeout=1500, capture_output=True, text=True)
                line = next((ln for ln in r.stdout.splitlines()
                             if ln.startswith("{")), None)
                if r.returncode == 0 and line:
                    print(line)
                    return
                fallback_reason = (
                    f"device bench exited rc={r.returncode} without JSON")
            except subprocess.TimeoutExpired:
                fallback_reason = "device bench timed out mid-run (1500s)"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""   # disable the TPU plugin relay
    env["SCX_BENCH_FALLBACK_REASON"] = fallback_reason or "unknown"
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
              env)


def _run_bench():
    import os

    import jax

    # persistent compile cache: repeat bench runs skip the ~30 s jit
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from smart_crossover_tpu.network_methods.certify import (
        certify_ot_basis_batch,
    )
    from smart_crossover_tpu.parallel.batched import (
        batched_tnet_exact_device,
    )

    backend = jax.default_backend()
    B, S, D = (64, 256, 256) if backend == "tpu" else (8, 64, 64)
    # warm-start strength matches the documented exact-fleet protocol
    # (BENCH.md round-2 table): sharper plan -> fewer simplex pivots
    reg, iters = 0.005, 1000
    s64, d64, M64 = make_batch(B, S, D)
    s = s64.astype(np.float32)
    d = d64.astype(np.float32)
    M = M64.astype(np.float32)

    def run():
        return batched_tnet_exact_device(s, d, M, reg=reg,
                                         sinkhorn_iters=iters,
                                         max_pivots=20000)

    # compile + warmup.  The warmup must FETCH to host, not just
    # block_until_ready: through the relay, block can return early on the
    # first re-dispatch of a cached executable (measured: block 0.2 ms
    # while the real compute took seconds, paid at the next fetch), which
    # would make a min-of-reps silently bogus.
    out = run()
    float(np.asarray(out[1]).sum())
    # timed runs; MEDIAN over reps rejects both relay dispatch noise
    # (highs) and any early-returning block (lows)
    times = []
    for r in range(9):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    q25, q75 = (float(np.percentile(times, 25)),
                float(np.percentile(times, 75)))
    X, obj, push, piv, opt, Bm = out

    # host certification: exact f64 vertex + duals from the basis alone,
    # reference acceptance test.  Timed — it is part of delivering a
    # certified-optimal vertex, so it counts toward the headline.
    t0 = time.perf_counter()
    certs = certify_ot_basis_batch(np.asarray(Bm), s64, d64, M64)
    cert_dt = time.perf_counter() - t0
    n_certified = sum(c.ok for c in certs)
    inst_per_sec = B / (dt + cert_dt)

    # CPU reference baseline on a subsample
    nb = 2
    t0 = time.perf_counter()
    for i in range(nb):
        cpu_reference_pipeline(s64[i], d64[i], M64[i],
                               reg=reg, sinkhorn_iters=iters)
    cpu_dt = (time.perf_counter() - t0) / nb
    cpu_inst_per_sec = 1.0 / cpu_dt

    detail = {
        "backend": backend,
        "batch": B, "S": S, "D": D,
        "sinkhorn_iters": iters,
        "device_stage_instances_per_sec": round(B / dt, 3),
        # relay dispatch noise bound: inter-quartile range of the blocked
        # reps, as throughputs (VERDICT r2 weak 6: carry an error bar)
        "device_stage_iqr_instances_per_sec": [round(B / q75, 3),
                                               round(B / q25, 3)],
        "certify_host_s": round(cert_dt, 4),
        "cpu_reference_instances_per_sec": round(cpu_inst_per_sec, 4),
        "all_optimal_device": bool(np.all(np.asarray(opt))),
        "all_certified": bool(n_certified == B),
        "n_certified": int(n_certified),
        "max_feas_err": float(max(c.max_feas_err for c in certs)),
        "min_reduced_cost": float(min(c.min_rcost for c in certs)),
        "median_pivots": int(np.median(np.asarray(piv))),
    }
    if backend == "tpu" and os.environ.get("SCX_BENCH_SKIP_784") != "1":
        # second row at the reference's actual MNIST scale (<=784x784,
        # reference scripts/mnist2ot.py:30-40): certified-exact 784^2
        # throughput vs the same CPU reference pipeline (VERDICT r4 item 3)
        B7 = 16
        s7_64, d7_64, M7_64 = make_batch(B7, 784, 784, seed=1)
        s7 = s7_64.astype(np.float32)
        d7 = d7_64.astype(np.float32)
        M7 = M7_64.astype(np.float32)

        def run7():
            return batched_tnet_exact_device(s7, d7, M7, reg=reg,
                                             sinkhorn_iters=iters,
                                             max_pivots=20000)

        out7 = run7()
        float(np.asarray(out7[1]).sum())      # fetch-forced warmup
        t7 = []
        for _ in range(5):
            t0 = time.perf_counter()
            out7 = run7()
            jax.block_until_ready(out7)
            t7.append(time.perf_counter() - t0)
        dt7 = float(np.median(t7))
        t0 = time.perf_counter()
        certs7 = certify_ot_basis_batch(np.asarray(out7[5]), s7_64, d7_64,
                                        M7_64)
        cert7_dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        cpu_reference_pipeline(s7_64[0], d7_64[0], M7_64[0],
                               reg=reg, sinkhorn_iters=iters)
        cpu7_dt = time.perf_counter() - t0
        ips7 = B7 / (dt7 + cert7_dt)
        detail["mnist_784"] = {
            "batch": B7,
            "certified_instances_per_sec": round(ips7, 3),
            "device_stage_instances_per_sec": round(B7 / dt7, 3),
            "certify_host_s": round(cert7_dt, 4),
            "cpu_reference_instances_per_sec": round(1.0 / cpu7_dt, 4),
            "vs_cpu_reference": round(ips7 * cpu7_dt, 2),
            "all_certified": bool(sum(c.ok for c in certs7) == B7),
        }

    reason = os.environ.get("SCX_BENCH_FALLBACK_REASON")
    if backend != "tpu":
        detail["fallback"] = True
        detail["fallback_reason"] = reason or "non-tpu default backend"
        detail["note"] = ("CPU fallback at reduced shape - NOT comparable "
                          "to the TPU headline (see BENCH.md)")
    print(json.dumps({
        "metric": "certified_exact_ot_crossover_throughput",
        "value": round(inst_per_sec, 3),
        "unit": "instances/s/chip",
        "vs_baseline": round(inst_per_sec / cpu_inst_per_sec, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
