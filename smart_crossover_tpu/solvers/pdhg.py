"""Restarted PDHG (PDLP-style) first-order LP solver in JAX.

The TPU-native "barrier substitute": where the reference warm-starts its
crossover from a vendor barrier solution (x_bar), this engine produces the
same kind of approximate primal-dual pair entirely on device — matvec-bound
work that vmaps over batches and shards over meshes (the sharded variant
lives in smart_crossover_tpu.parallel).

Solves      min c'x   s.t.  A_eq x = b_eq,  A_le x <= b_le,  l <= x <= u

as the saddle point  min_x max_{y: y_le <= 0}  c'x + y'(b - Ax)  with the
Chambolle-Pock iteration, Halpern-free average restarts every
``restart_period`` iterations (restart to the running average when it has a
better normalised KKT score), and a power-iteration estimate of ||A|| for
the step sizes.
"""
from __future__ import annotations

import datetime
import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PDHGResult:
    x: np.ndarray
    y: np.ndarray
    obj_val: float
    iter_count: int
    status: str
    runtime: datetime.timedelta
    primal_residual: float
    dual_residual: float
    gap: float


def estimate_opnorm(A, iters: int = 50, seed: int = 0):
    """Power iteration for ||A||_2 (jittable)."""
    v = jax.random.normal(jax.random.PRNGKey(seed), (A.shape[1],),
                          dtype=A.dtype)

    def body(_, v):
        w = A.T @ (A @ v)
        return w / (jnp.linalg.norm(w) + 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v / jnp.linalg.norm(v))
    return jnp.sqrt(jnp.linalg.norm(A.T @ (A @ v)))


@partial(jax.jit, static_argnames=("max_iters", "check_every",
                                   "restart_period"))
def _pdhg_core(A, b, c, l, u, is_eq, opnorm,
               x0, y0,
               max_iters: int, check_every: int, restart_period: int,
               tol: float):
    """Core loop with PDLP-style adaptive primal weight.

    The primal weight omega balances the step sizes (tau = 0.9*omega/||A||,
    sigma = 0.9/(omega*||A||)); after each restart window it moves toward
    the observed dual/primal movement ratio, which is what makes restarted
    PDHG robust across badly scaled instances.
    Returns (x, y, iters, converged)."""

    def proj_x(x):
        return jnp.clip(x, l, u)

    def proj_y(y):
        # equality rows free; '<=' rows constrained to y <= 0
        return jnp.where(is_eq, y, jnp.minimum(y, 0.0))

    bscale = 1.0 + jnp.linalg.norm(b)
    cscale = 1.0 + jnp.linalg.norm(c)

    def kkt_score(x, y):
        # primal: constraint violation (eq: |Ax-b|; le: max(Ax-b, 0))
        r = A @ x - b
        pviol = jnp.where(is_eq, r, jnp.maximum(r, 0.0))
        pres = jnp.linalg.norm(pviol) / bscale
        # dual: reduced-cost sign violations w.r.t. the box
        rc = c - A.T @ y
        lo_ok = jnp.isfinite(l) & (x <= l + 1e-12)
        up_ok = jnp.isfinite(u) & (x >= u - 1e-12)
        dviol = jnp.where(lo_ok, jnp.minimum(rc, 0.0),
                          jnp.where(up_ok, jnp.maximum(rc, 0.0), rc))
        dres = jnp.linalg.norm(dviol) / cscale
        # gap
        ly = jnp.where(jnp.isfinite(l), l, 0.0)
        uy = jnp.where(jnp.isfinite(u), u, 0.0)
        rc_pos = jnp.maximum(rc, 0.0) * jnp.isfinite(l)
        rc_neg = jnp.minimum(rc, 0.0) * jnp.isfinite(u)
        dual_obj = b @ y + ly @ rc_pos + uy @ rc_neg
        pobj = c @ x
        gap = jnp.abs(pobj - dual_obj) / (1.0 + jnp.abs(pobj)
                                          + jnp.abs(dual_obj))
        return pres, dres, gap

    def one_iter(carry, _):
        x, y, xs, ys, cnt, tau, sigma = carry
        x_new = proj_x(x - tau * (c - A.T @ y))
        x_bar = 2.0 * x_new - x
        y_new = proj_y(y + sigma * (b - A @ x_bar))
        return (x_new, y_new, xs + x_new, ys + y_new, cnt + 1,
                tau, sigma), None

    def outer_body(state):
        x, y, it, best_x, best_y, best_score, omega, done = state
        tau = 0.9 * omega / opnorm
        sigma = 0.9 / (omega * opnorm)
        x_start, y_start = x, y
        # one restart window of `restart_period` iterations with averaging
        (x, y, xs, ys, cnt, _, _), _ = jax.lax.scan(
            one_iter, (x, y, jnp.zeros_like(x), jnp.zeros_like(y), 0,
                       tau, sigma),
            None, length=restart_period)
        x_avg = xs / cnt
        y_avg = ys / cnt
        # restart at whichever of {current, average} scores better
        pres_c, dres_c, gap_c = kkt_score(x, y)
        pres_a, dres_a, gap_a = kkt_score(x_avg, y_avg)
        score_c = pres_c + dres_c + gap_c
        score_a = pres_a + dres_a + gap_a
        use_avg = score_a < score_c
        x = jnp.where(use_avg, x_avg, x)
        y = jnp.where(use_avg, y_avg, y)
        score = jnp.minimum(score_a, score_c)
        pres = jnp.where(use_avg, pres_a, pres_c)
        dres = jnp.where(use_avg, dres_a, dres_c)
        gap = jnp.where(use_avg, gap_a, gap_c)
        improved = score < best_score
        best_x = jnp.where(improved, x, best_x)
        best_y = jnp.where(improved, y, best_y)
        best_score = jnp.minimum(score, best_score)
        done = (pres < tol) & (dres < tol) & (gap < tol)
        # primal-weight update from the window's movement ratio
        dx_move = jnp.linalg.norm(x - x_start)
        dy_move = jnp.linalg.norm(y - y_start)
        valid = (dx_move > 1e-12) & (dy_move > 1e-12)
        log_ratio = jnp.log(jnp.where(valid, dy_move / dx_move, 1.0))
        omega = jnp.where(
            valid,
            jnp.exp(0.5 * log_ratio + 0.5 * jnp.log(omega)),
            omega)
        omega = jnp.clip(omega, 1e-4, 1e4)
        return (x, y, it + restart_period, best_x, best_y, best_score,
                omega, done)

    def cond(state):
        *_, done = state
        it = state[2]
        return (~done) & (it < max_iters)

    state = (x0, y0, jnp.asarray(0), x0, y0, jnp.asarray(jnp.inf),
             jnp.asarray(1.0, A.dtype if hasattr(A, "dtype") else jnp.float64),
             jnp.asarray(False))
    x, y, it, best_x, best_y, _, _, done = jax.lax.while_loop(
        cond, outer_body, state)
    # converged -> the last restart point; iteration-limited -> the best
    # iterate seen (late windows can wander on hard instances)
    x = jnp.where(done, x, best_x)
    y = jnp.where(done, y, best_y)
    return x, y, it, done


def _ruiz_equilibrate(A, iters: int = 10):
    """Ruiz diagonal equilibration: returns (R, C) with R A C well scaled."""
    from jax.experimental import sparse as jsparse

    if isinstance(A, jsparse.BCOO):
        rows = np.asarray(A.indices[:, 0])
        cols = np.asarray(A.indices[:, 1])
        data = np.asarray(A.data, dtype=np.float64)
        m, n = A.shape
        R = np.ones(m)
        C = np.ones(n)
        for _ in range(iters):
            v = np.abs(data) * R[rows] * C[cols]
            rmax = np.zeros(m)
            np.maximum.at(rmax, rows, v)
            R /= np.where(rmax > 0, np.sqrt(rmax), 1.0)
            v = np.abs(data) * R[rows] * C[cols]
            cmax = np.zeros(n)
            np.maximum.at(cmax, cols, v)
            C /= np.where(cmax > 0, np.sqrt(cmax), 1.0)
        return R, C
    An = np.abs(np.asarray(A, dtype=np.float64))
    m, n = An.shape
    R = np.ones(m)
    C = np.ones(n)
    for _ in range(iters):
        rmax = (An * R[:, None] * C[None, :]).max(axis=1)
        R /= np.where(rmax > 0, np.sqrt(rmax), 1.0)
        cmax = (An * R[:, None] * C[None, :]).max(axis=0)
        C /= np.where(cmax > 0, np.sqrt(cmax), 1.0)
    return R, C


def pdhg_solve(A, b, c, l, u, sense=None,
               tol: float = 1e-6,
               max_iters: int = 100_000,
               restart_period: int = 200,
               x0=None, y0=None, rescale: bool = True) -> PDHGResult:
    """Solve an LP with restarted PDHG (Ruiz-equilibrated by default).

    Args:
        A: (m, n) dense array (jnp/np) or BCOO.
        sense: length-m array of '='/'<' (None = all equality).
    """
    t0 = time.perf_counter()
    from jax.experimental import sparse as jsparse

    if not isinstance(A, jsparse.BCOO):
        A = jnp.asarray(A)
    m, n = A.shape
    b_in = np.asarray(b, dtype=np.float64)
    c_in = np.asarray(c, dtype=np.float64)

    R = C = None
    if rescale:
        R, C = _ruiz_equilibrate(A)
        if isinstance(A, jsparse.BCOO):
            data = A.data * jnp.asarray(R)[A.indices[:, 0]] \
                * jnp.asarray(C)[A.indices[:, 1]]
            A = jsparse.BCOO((data, A.indices), shape=A.shape)
        else:
            A = A * jnp.asarray(R)[:, None] * jnp.asarray(C)[None, :]
        b = np.asarray(b, dtype=np.float64) * R
        c = np.asarray(c, dtype=np.float64) * C
        with np.errstate(invalid="ignore"):
            l = np.asarray(l, dtype=np.float64) / C
            u = np.asarray(u, dtype=np.float64) / C
        if x0 is not None:
            x0 = np.asarray(x0, dtype=np.float64) / C
        if y0 is not None:
            y0 = np.asarray(y0, dtype=np.float64) / R
    dtype = A.dtype
    b = jnp.asarray(b, dtype=dtype)
    c = jnp.asarray(c, dtype=dtype)
    l = jnp.asarray(l, dtype=dtype)
    u = jnp.asarray(u, dtype=dtype)
    if sense is None:
        is_eq = jnp.ones(m, dtype=bool)
    else:
        is_eq = jnp.asarray(np.asarray(sense) == "=")

    opnorm = estimate_opnorm(A)

    if x0 is None:
        x0 = jnp.clip(jnp.zeros(n, dtype=dtype), l, u)
    else:
        x0 = jnp.asarray(x0, dtype=dtype)
    if y0 is None:
        y0 = jnp.zeros(m, dtype=dtype)
    else:
        y0 = jnp.asarray(y0, dtype=dtype)

    x, y, iters, done = _pdhg_core(
        A, b, c, l, u, is_eq, opnorm, x0, y0,
        max_iters=max_iters, check_every=restart_period,
        restart_period=restart_period, tol=tol)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # residuals below are measured in the (well-conditioned) scaled space;
    # the returned x, y, obj_val are unscaled to the original problem
    x_out = x * C if rescale else x
    y_out = y * R if rescale else y

    # final residuals (host, f64)
    if isinstance(A, jsparse.BCOO):
        An = np.asarray(A.todense(), dtype=np.float64) if n * m <= 4_000_000 \
            else None
    else:
        An = np.asarray(A, dtype=np.float64)
    if An is None:
        # large sparse: compute residuals on device instead
        r_dev = A @ jnp.asarray(x, dtype=dtype) - b
        rc_dev = c - (A.T @ jnp.asarray(y, dtype=dtype))
        An_r = np.asarray(r_dev, dtype=np.float64)
        rc_host = np.asarray(rc_dev, dtype=np.float64)
        eq = np.asarray(is_eq)
        pres = float(np.linalg.norm(np.where(eq, An_r, np.maximum(An_r, 0.0)))
                     / (1.0 + np.linalg.norm(b)))
        obj = float(c_in @ x_out)
        status = "OPTIMAL" if bool(done) else "ITERATION_LIMIT"
        return PDHGResult(x=x_out, y=y_out, obj_val=obj,
                          iter_count=int(iters), status=status,
                          runtime=datetime.timedelta(
                              seconds=time.perf_counter() - t0),
                          primal_residual=pres, dual_residual=float("nan"),
                          gap=float("nan"))
    r = An @ x - np.asarray(b, dtype=np.float64)
    eq = np.asarray(is_eq)
    pres = float(np.linalg.norm(np.where(eq, r, np.maximum(r, 0.0)))
                 / (1.0 + np.linalg.norm(b)))
    rc = np.asarray(c, dtype=np.float64) - An.T @ y
    ln = np.asarray(l, dtype=np.float64)
    un = np.asarray(u, dtype=np.float64)
    lo_ok = np.isfinite(ln) & (x <= ln + 1e-10)
    up_ok = np.isfinite(un) & (x >= un - 1e-10)
    dviol = np.where(lo_ok, np.minimum(rc, 0.0),
                     np.where(up_ok, np.maximum(rc, 0.0), rc))
    dres = float(np.linalg.norm(dviol) / (1.0 + np.linalg.norm(c)))
    obj = float(c_in @ x_out)
    status = "OPTIMAL" if bool(done) else "ITERATION_LIMIT"
    return PDHGResult(x=x_out, y=y_out, obj_val=obj, iter_count=int(iters),
                      status=status,
                      runtime=datetime.timedelta(
                          seconds=time.perf_counter() - t0),
                      primal_residual=pres, dual_residual=dres,
                      gap=float("nan"))


def pdhg_general_lp(lp, tol: float = 1e-6, max_iters: int = 100_000,
                    x0=None, y0=None, sparse: bool | None = None
                    ) -> PDHGResult:
    """PDHG on a GeneralLP.  ``sparse=True`` keeps A as a BCOO sparse matrix
    on device (matvecs lower to gather/scatter); default picks sparse for
    big, sparse instances."""
    import scipy.sparse as sp

    A_sp = sp.csr_matrix(lp.A)
    if sparse is None:
        sparse = (A_sp.shape[0] * A_sp.shape[1] > 1_000_000
                  and A_sp.nnz < 0.1 * A_sp.shape[0] * A_sp.shape[1])
    if sparse:
        from jax.experimental import sparse as jsparse

        A = jsparse.BCOO.from_scipy_sparse(A_sp)
    else:
        A = np.asarray(A_sp.todense())
    return pdhg_solve(A, lp.b, lp.c, lp.l, lp.u, sense=lp.sense, tol=tol,
                      max_iters=max_iters, x0=x0, y0=y0)
