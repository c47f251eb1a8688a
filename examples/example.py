#!/usr/bin/env python
"""Usage walkthrough — the capability of the reference's
notebooks/example.ipynb, as a runnable script.

Covers: building an OT instance, first-order warm start, all three network
crossover methods, a general-LP perturbation crossover, and the batched
device pipeline.
"""
import numpy as np

import smart_crossover_tpu as scx
from smart_crossover_tpu.data import mnist_like_ot_suite
from smart_crossover_tpu.parallel import batched_tnet
from smart_crossover_tpu.solvers.sinkhorn import sinkhorn


def ot_demo():
    print("=== optimal transport crossover ===")
    ot = mnist_like_ot_suite(num_pairs=1, side=12)[0]
    print(f"instance: {ot.s.size} suppliers x {ot.d.size} demanders")

    x_bar = sinkhorn(ot, reg=0.01, num_iters=1000)
    for method in ("tnet", "cnet_ot"):
        out = scx.network_crossover(x=x_bar, ot=ot, method=method)
        print(f"{method:8s}: {out.status} obj={out.obj_val:.8f} "
              f"pivots={out.iter_count} "
              f"runtime={out.runtime.total_seconds():.3f}s")

    cold = scx.solve_ot(ot, method="network_simplex")
    print(f"cold     : {cold.status} obj={cold.obj_val:.8f} "
          f"pivots={cold.iter_count}")


def lp_demo():
    print("\n=== general LP perturbation crossover ===")
    rng = np.random.default_rng(0)
    m, n = 20, 50
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    lp = scx.GeneralLP(A=A, b=b, c=rng.standard_normal(n),
                       l=np.zeros(n), u=np.ones(n),
                       sense=np.full(m, "="))
    # equivalently: scx.solve_lp(lp, method="barrier_perturb")
    out = scx.run_perturb_algorithm(lp)
    print(f"perturb  : {out.status} obj={out.obj_val:.8f} "
          f"pivots={out.iter_count} barrier_iters={out.bar_iter_count}")

    baseline = scx.solve_lp(lp, method="barrier")
    print(f"baseline : {baseline.status} obj={baseline.obj_val:.8f} "
          f"pivots={baseline.iter_count}")


def batched_demo():
    print("\n=== batched device pipeline ===")
    rng = np.random.default_rng(1)
    B, S, D = 8, 32, 32
    s = rng.uniform(0.5, 2.0, (B, S)).astype(np.float32)
    d = rng.uniform(0.5, 2.0, (B, D)).astype(np.float32)
    d *= (s.sum(1) / d.sum(1))[:, None]
    M = rng.uniform(0, 5, (B, S, D)).astype(np.float32)
    X, push_iters, obj = batched_tnet(s, d, M, reg=0.05, sinkhorn_iters=200)
    print(f"{B} instances -> objectives {np.asarray(obj).round(2)}")
    print(f"push iterations per instance: {np.asarray(push_iters)}")


if __name__ == "__main__":
    ot_demo()
    lp_demo()
    batched_demo()
