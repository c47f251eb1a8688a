"""General-LP benchmark instance generation ("optLP"-style).

The reference's LP experiments run on the Plato/MIPLIB "optLP" set of
presolved .mps instances (data/README.md:12-23).  With no download path in
this environment, this module generates structurally similar instances —
sparse, mixed '='/'<' rows, some free and boxed variables, feasible and
bounded by construction — and can write them as .mps files for the
perturbation-crossover driver.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import scipy.sparse as sp

from smart_crossover_tpu.models import GeneralLP


def random_sparse_lp(m: int = 120, n: int = 400, density: float = 0.02,
                     frac_ineq: float = 0.4, frac_free: float = 0.05,
                     frac_boxed: float = 0.5, seed: int = 0,
                     name: str | None = None) -> GeneralLP:
    """Sparse LP, primal feasible (interior x0 exists) and dual bounded."""
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=rng.integers(2**31),
                  format="csr")
    A = A + sp.diags(np.ones(min(m, n)), shape=(m, n))  # structural cover
    A = A.tocsr()
    A.data = rng.standard_normal(A.nnz)

    l = np.zeros(n)
    u = np.full(n, np.inf)
    boxed = rng.uniform(size=n) < frac_boxed
    u[boxed] = rng.uniform(1.0, 5.0, boxed.sum())
    free = rng.uniform(size=n) < frac_free
    l[free], u[free] = -np.inf, np.inf

    # interior feasible point within the (finite) bounds
    x0 = np.where(np.isfinite(u), rng.uniform(0.25, 0.75, n) *
                  np.where(np.isfinite(u), u, 1.0),
                  rng.uniform(0.5, 2.0, n))
    x0[free] = rng.uniform(-1.0, 1.0, free.sum())

    slack = np.where(rng.uniform(size=m) < frac_ineq,
                     rng.uniform(0.1, 1.0, m), 0.0)
    b = np.asarray(A @ x0).ravel() + slack
    sense = np.where(slack > 0, "<", "=")

    # dual-feasible cost => bounded: c = A'y0 + zl - zu with the right signs
    y0 = rng.standard_normal(m) * 0.5
    y0[sense == "<"] = -np.abs(y0[sense == "<"])  # '<' rows need y <= 0
    zl = np.where(np.isfinite(l), np.abs(rng.standard_normal(n)) + 0.01, 0.0)
    zu = np.where(np.isfinite(u) & (rng.uniform(size=n) < 0.3),
                  np.abs(rng.standard_normal(n)) * 0.5, 0.0)
    c = np.asarray(A.T @ y0).ravel() + zl - zu
    if name is None:
        name = f"optlp_like_{m}x{n}_s{seed}"
    return GeneralLP(A=A, b=b, c=c, l=l, u=u, sense=sense, name=name)


def optlp_like_suite(out_dir: str | Path, num: int = 6, base_seed: int = 42,
                     m: int = 120, n: int = 400) -> list[Path]:
    """Generate and write a suite of .mps instances; returns the paths."""
    from smart_crossover_tpu.data.mps_write import write_mps

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for k in range(num):
        lp = random_sparse_lp(m=m, n=n, seed=base_seed + k)
        p = out_dir / f"{lp.name}.mps"
        write_mps(lp, p)
        paths.append(p)
    return paths
