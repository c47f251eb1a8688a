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
                                   "restart_period", "chunk_runner"))
def _pdhg_core(A, b, c, l, u, is_eq, opnorm,
               x0, y0,
               max_iters: int, check_every: int, restart_period: int,
               tol: float, chunk_runner=None):
    """Core loop with PDLP-style adaptive restarts + adaptive primal weight.

    Every ``check_every`` iterations the restart candidate (the better of
    the current iterate and the running average since the last restart) is
    scored on normalised KKT error, and the loop restarts to it when —
    following the PDLP criteria — the score shows *sufficient* decay
    (<= 0.2x the score at the last restart), *necessary* decay but stalled
    progress (<= 0.8x and no longer improving between checks), or the
    window exceeds ``restart_period`` iterations (artificial restart).
    The primal weight omega balances the step sizes (tau = 0.9*omega/||A||,
    sigma = 0.9/(omega*||A||)); on each restart it moves toward the
    observed dual/primal movement ratio over the closed window, which is
    what makes restarted PDHG robust across badly scaled instances.
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
        """One PDHG iteration with PDLP's adaptive step-size rule.

        The carried A@x makes the rule free of extra matvecs: A x̄ =
        2 A x_new − A x_old and A Δx = A x_new − A x_old reuse the same
        product.  A trial step is accepted only when η ≤ η̄ =
        ‖Δz‖²_ω / (2|Δyᵀ A Δx|) (the largest provably convergent step for
        the observed local curvature); rejected trials still advance η by
        the PDLP schedule and count as iterations, exactly as in PDLP."""
        x, y, Ax, xs, ys, wsum, eta, omega, k = carry
        tau = eta / omega
        sigma = eta * omega
        x_c = proj_x(x - tau * (c - A.T @ y))
        Ax_c = A @ x_c
        y_c = proj_y(y + sigma * (b - (2.0 * Ax_c - Ax)))
        dx = x_c - x
        dy = y_c - y
        curv = jnp.abs(dy @ (Ax_c - Ax))
        nz = omega * (dx @ dx) + (dy @ dy) / omega
        # zero curvature -> any step is fine; a big FINITE cap keeps the
        # (1 - k^-0.3) * eta_bar schedule finite everywhere
        eta_bar = jnp.where(curv > 0, nz / (2.0 * curv), 1e10 / opnorm)
        accept = eta <= eta_bar
        # PDLP increments the iteration counter BEFORE this update: with a
        # 0-based k the schedule index is k+2, so the first-update factor
        # is (1 - 2**-0.3) ~ 0.19 instead of 0 (which would collapse eta
        # to the clip floor and waste a ~250-iteration recovery prefix).
        k1 = (k + 2).astype(b.dtype)
        eta_next = jnp.minimum((1.0 - k1 ** -0.3) * eta_bar,
                               (1.0 + k1 ** -0.6) * eta)
        eta_next = jnp.clip(eta_next, 1e-10 / opnorm, 1e10 / opnorm)
        x = jnp.where(accept, x_c, x)
        y = jnp.where(accept, y_c, y)
        Ax = jnp.where(accept, Ax_c, Ax)
        w = jnp.where(accept, eta, 0.0)
        return (x, y, Ax, xs + w * x, ys + w * y, wsum + w,
                eta_next, omega, k + 1), None

    def outer_body(state):
        (x, y, Ax, xs, ys, wsum, cnt, it, x_lr, y_lr, score_lr, score_prev,
         best_x, best_y, best_score, omega, eta, done) = state
        # one evaluation chunk; averages continue across chunks until
        # restart.  chunk_runner is the VMEM-resident Pallas version of the
        # same scan (ops/pdhg_pallas.py): A is read from HBM once per chunk
        # instead of twice per iteration.
        if chunk_runner is not None:
            x, y, Ax, xs, ys, wsum, eta = chunk_runner(
                A, b, c, l, u, is_eq, x, y, Ax, xs, ys,
                wsum, eta, omega, it, opnorm)
        else:
            (x, y, Ax, xs, ys, wsum, eta, _, _), _ = jax.lax.scan(
                one_iter, (x, y, Ax, xs, ys, wsum, eta, omega, it),
                None, length=check_every)
        cnt = cnt + check_every
        safe_w = jnp.where(wsum > 0, wsum, 1.0)
        x_avg = jnp.where(wsum > 0, xs / safe_w, x)
        y_avg = jnp.where(wsum > 0, ys / safe_w, y)
        # restart candidate: the better of {current, window average}
        pres_c, dres_c, gap_c = kkt_score(x, y)
        pres_a, dres_a, gap_a = kkt_score(x_avg, y_avg)
        score_c = pres_c + dres_c + gap_c
        score_a = pres_a + dres_a + gap_a
        use_avg = score_a < score_c
        cand_x = jnp.where(use_avg, x_avg, x)
        cand_y = jnp.where(use_avg, y_avg, y)
        score = jnp.minimum(score_a, score_c)
        pres = jnp.where(use_avg, pres_a, pres_c)
        dres = jnp.where(use_avg, dres_a, dres_c)
        gap = jnp.where(use_avg, gap_a, gap_c)
        improved = score < best_score
        best_x = jnp.where(improved, cand_x, best_x)
        best_y = jnp.where(improved, cand_y, best_y)
        best_score = jnp.minimum(score, best_score)
        done = (pres < tol) & (dres < tol) & (gap < tol)
        # PDLP restart criteria on the candidate's KKT score; the
        # artificial-restart window GROWS with elapsed iterations (0.36x,
        # as in PDLP) — long late windows with averaging are what produce
        # the tail linear convergence on sharp LPs
        sufficient = score <= 0.2 * score_lr
        necessary = (score <= 0.8 * score_lr) & (score > score_prev)
        artificial = cnt >= jnp.maximum(restart_period,
                                        (0.36 * (it + check_every))
                                        .astype(cnt.dtype))
        restart = sufficient | necessary | artificial | done
        # primal-weight update from the closed window's movement ratio
        dx_move = jnp.linalg.norm(cand_x - x_lr)
        dy_move = jnp.linalg.norm(cand_y - y_lr)
        valid = restart & (dx_move > 1e-12) & (dy_move > 1e-12)
        log_ratio = jnp.log(jnp.where(valid, dy_move / dx_move, 1.0))
        omega = jnp.where(
            valid,
            jnp.exp(0.5 * log_ratio + 0.5 * jnp.log(omega)),
            omega)
        omega = jnp.clip(omega, 1e-4, 1e4)
        x = jnp.where(restart, cand_x, x)
        y = jnp.where(restart, cand_y, y)
        Ax = jnp.where(restart, A @ x, Ax)
        xs = jnp.where(restart, jnp.zeros_like(xs), xs)
        ys = jnp.where(restart, jnp.zeros_like(ys), ys)
        wsum = jnp.where(restart, 0.0, wsum)
        cnt = jnp.where(restart, 0, cnt)
        x_lr = jnp.where(restart, x, x_lr)
        y_lr = jnp.where(restart, y, y_lr)
        score_lr = jnp.where(restart, score, score_lr)
        return (x, y, Ax, xs, ys, wsum, cnt, it + check_every, x_lr, y_lr,
                score_lr, score, best_x, best_y, best_score, omega, eta,
                done)

    def cond(state):
        *_, done = state
        it = state[7]
        return (~done) & (it < max_iters)

    fdt = A.dtype if hasattr(A, "dtype") else jnp.float64
    state = (x0, y0, A @ x0, jnp.zeros_like(x0), jnp.zeros_like(y0),
             jnp.asarray(0.0, fdt), jnp.asarray(0), jnp.asarray(0),
             x0, y0, jnp.asarray(jnp.inf, fdt), jnp.asarray(jnp.inf, fdt),
             x0, y0, jnp.asarray(jnp.inf, fdt),
             jnp.asarray(1.0, fdt), jnp.asarray(0.9, fdt) / opnorm,
             jnp.asarray(False))
    out = jax.lax.while_loop(cond, outer_body, state)
    x, y, it, best_x, best_y, done = out[0], out[1], out[7], out[12], \
        out[13], out[17]
    # converged -> the converging restart point; iteration-limited -> the
    # best iterate seen (late windows can wander on hard instances)
    x = jnp.where(done, x, best_x)
    y = jnp.where(done, y, best_y)
    return x, y, it, done


def _pdhg_core_halpern(A, b, c, l, u, is_eq, opnorm, x0, y0,
                       max_iters: int, check_every: int,
                       restart_period: int, tol: float,
                       chunk_runner=None):
    """Restarted reflected-Halpern PDHG (r2HPDHG, Lu & Yang 2024; the
    cuPDLP+ acceleration).  One inner step is

        z+ = (k+1)/(k+2) * (2 T(z) - z) + 1/(k+2) * z_anchor

    with T one FIXED-step PDHG map (tau*sigma*||A||^2 = 0.99^2 — Halpern
    needs a nonexpansive T, so no adaptive eta) and the anchor reset to
    the current iterate at every restart.  The averaging machinery of the
    adaptive core is replaced by the anchor sequence, which converges at
    the accelerated O(1/k) fixed-point-residual rate and empirically
    halves the 1e-8 tail on sharp LPs.  Restart criteria, primal-weight
    updates and best-iterate tracking mirror _pdhg_core."""

    def proj_x(x):
        return jnp.clip(x, l, u)

    def proj_y(y):
        return jnp.where(is_eq, y, jnp.minimum(y, 0.0))

    bscale = 1.0 + jnp.linalg.norm(b)
    cscale = 1.0 + jnp.linalg.norm(c)

    def kkt_score(x, y):
        r = A @ x - b
        pviol = jnp.where(is_eq, r, jnp.maximum(r, 0.0))
        pres = jnp.linalg.norm(pviol) / bscale
        rc = c - A.T @ y
        lo_ok = jnp.isfinite(l) & (x <= l + 1e-12)
        up_ok = jnp.isfinite(u) & (x >= u - 1e-12)
        dviol = jnp.where(lo_ok, jnp.minimum(rc, 0.0),
                          jnp.where(up_ok, jnp.maximum(rc, 0.0), rc))
        dres = jnp.linalg.norm(dviol) / cscale
        ly = jnp.where(jnp.isfinite(l), l, 0.0)
        uy = jnp.where(jnp.isfinite(u), u, 0.0)
        rc_pos = jnp.maximum(rc, 0.0) * jnp.isfinite(l)
        rc_neg = jnp.minimum(rc, 0.0) * jnp.isfinite(u)
        dual_obj = b @ y + ly @ rc_pos + uy @ rc_neg
        pobj = c @ x
        gap = jnp.abs(pobj - dual_obj) / (1.0 + jnp.abs(pobj)
                                          + jnp.abs(dual_obj))
        return pres, dres, gap

    step = 0.99 / opnorm

    def one_iter(carry, _):
        x, y, Ax, xa, ya, Axa, omega, k = carry
        tau = step / omega
        sigma = step * omega
        # T(z): one fixed-step PDHG map (carried A@x avoids extra matvecs)
        x_t = proj_x(x - tau * (c - A.T @ y))
        Ax_t = A @ x_t
        y_t = proj_y(y + sigma * (b - (2.0 * Ax_t - Ax)))
        # reflection then Halpern anchoring; Ax of the combination is the
        # same linear combination of carried products
        lam = (k + 1.0) / (k + 2.0)
        x_n = lam * (2.0 * x_t - x) + (1.0 - lam) * xa
        y_n = lam * (2.0 * y_t - y) + (1.0 - lam) * ya
        Ax_n = lam * (2.0 * Ax_t - Ax) + (1.0 - lam) * Axa
        return (x_n, y_n, Ax_n, xa, ya, Axa, omega, k + 1.0), None

    def outer_body(state):
        (x, y, Ax, xa, ya, Axa, cnt, it, x_lr, y_lr, score_lr, score_prev,
         best_x, best_y, best_score, omega, done) = state
        if chunk_runner is not None:
            # VMEM-resident Pallas chunk (ops/pdhg_pallas.py): A is read
            # from HBM once per chunk instead of twice per iteration
            x, y, Ax, _ = chunk_runner(A, b, c, l, u, is_eq, x, y, Ax,
                                       xa, ya, Axa, omega,
                                       jnp.asarray(cnt, x.dtype), step)
        else:
            (x, y, Ax, xa, ya, Axa, _, _), _ = jax.lax.scan(
                one_iter, (x, y, Ax, xa, ya, Axa, omega,
                           jnp.asarray(cnt, x.dtype)),
                None, length=check_every)
        cnt = cnt + check_every
        # the restart/output candidate is T(z), the PDHG image of the
        # Halpern iterate (r2HPDHG outputs T(z_k)): the reflected sequence
        # itself oscillates around the solution and scores noisily
        tau = step / omega
        sigma = step * omega
        x_c = proj_x(x - tau * (c - A.T @ y))
        Ax_c = A @ x_c
        y_c = proj_y(y + sigma * (b - (2.0 * Ax_c - Ax)))
        pres, dres, gap = kkt_score(x_c, y_c)
        kkt = pres + dres + gap
        improved = kkt < best_score
        best_x = jnp.where(improved, x_c, best_x)
        best_y = jnp.where(improved, y_c, best_y)
        best_score = jnp.minimum(kkt, best_score)
        done = (pres < tol) & (dres < tol) & (gap < tol)
        # r2HPDHG restarts on the FIXED-POINT residual ||z - T(z)||_omega:
        # on sharp LPs each restart at a geometrically smaller FPR is what
        # upgrades the anchored O(1/k) rate to linear
        score = jnp.sqrt(omega * jnp.sum((x_c - x) ** 2)
                         + jnp.sum((y_c - y) ** 2) / omega)
        sufficient = score <= 0.2 * score_lr
        necessary = (score <= 0.8 * score_lr) & (score > score_prev)
        artificial = cnt >= jnp.maximum(restart_period,
                                        (0.36 * (it + check_every))
                                        .astype(cnt.dtype))
        restart = sufficient | necessary | artificial | done
        dx_move = jnp.linalg.norm(x_c - x_lr)
        dy_move = jnp.linalg.norm(y_c - y_lr)
        valid = restart & (dx_move > 1e-12) & (dy_move > 1e-12)
        log_ratio = jnp.log(jnp.where(valid, dy_move / dx_move, 1.0))
        omega = jnp.where(valid,
                          jnp.exp(0.5 * log_ratio + 0.5 * jnp.log(omega)),
                          omega)
        omega = jnp.clip(omega, 1e-4, 1e4)
        # restart: jump to T(z) and re-anchor there, resetting the
        # Halpern counter (cnt doubles as the inner k)
        x = jnp.where(restart, x_c, x)
        y = jnp.where(restart, y_c, y)
        Ax = jnp.where(restart, Ax_c, Ax)
        xa = jnp.where(restart, x_c, xa)
        ya = jnp.where(restart, y_c, ya)
        Axa = jnp.where(restart, Ax_c, Axa)
        cnt = jnp.where(restart, 0, cnt)
        x_lr = jnp.where(restart, x_c, x_lr)
        y_lr = jnp.where(restart, y_c, y_lr)
        score_lr = jnp.where(restart, score, score_lr)
        return (x, y, Ax, xa, ya, Axa, cnt, it + check_every, x_lr, y_lr,
                score_lr, score, best_x, best_y, best_score, omega, done)

    def cond(state):
        *_, done = state
        it = state[7]
        return (~done) & (it < max_iters)

    fdt = A.dtype if hasattr(A, "dtype") else jnp.float64
    Ax0 = A @ x0
    state = (x0, y0, Ax0, x0, y0, Ax0, jnp.asarray(0), jnp.asarray(0),
             x0, y0, jnp.asarray(jnp.inf, fdt), jnp.asarray(jnp.inf, fdt),
             x0, y0, jnp.asarray(jnp.inf, fdt), jnp.asarray(1.0, fdt),
             jnp.asarray(False))
    out = jax.lax.while_loop(cond, outer_body, state)
    x, y, it, best_x, best_y, done = out[0], out[1], out[7], out[12], \
        out[13], out[16]
    x = jnp.where(done, x, best_x)
    y = jnp.where(done, y, best_y)
    return x, y, it, done


def _pdhg_core_scipy(A_csr, b, c, l, u, is_eq, opnorm, x0, y0,
                     max_iters: int, check_every: int,
                     restart_period: int, tol: float):
    """Host scipy-sparse mirror of _pdhg_core (adaptive mode).

    jax.experimental.sparse BCOO matvecs lower to gather/segment-sum and
    are 30-100x slower than scipy csr on the CPU backend (measured on a
    786k-arc incidence: ~0.5 s/iteration vs ~5 ms) — so sparse solves on
    a CPU backend route here.  Same math and restart logic as the jitted
    core; numpy f64 throughout."""
    import scipy.sparse as ssp

    A = ssp.csr_matrix(A_csr)
    AT = A.T.tocsr()
    m, n = A.shape
    b = np.asarray(b, np.float64)
    c = np.asarray(c, np.float64)
    l = np.asarray(l, np.float64)
    u = np.asarray(u, np.float64)
    is_eq = np.asarray(is_eq, bool)
    opnorm = float(opnorm)
    bscale = 1.0 + np.linalg.norm(b)
    cscale = 1.0 + np.linalg.norm(c)
    fin_l = np.isfinite(l)
    fin_u = np.isfinite(u)
    ly = np.where(fin_l, l, 0.0)
    uy = np.where(fin_u, u, 0.0)

    def proj_x(x):
        return np.clip(x, l, u)

    def proj_y(y):
        return np.where(is_eq, y, np.minimum(y, 0.0))

    def kkt_score(x, y):
        r = A @ x - b
        pres = np.linalg.norm(np.where(is_eq, r, np.maximum(r, 0.0))) \
            / bscale
        rc = c - AT @ y
        lo_ok = fin_l & (x <= l + 1e-12)
        up_ok = fin_u & (x >= u - 1e-12)
        dviol = np.where(lo_ok, np.minimum(rc, 0.0),
                         np.where(up_ok, np.maximum(rc, 0.0), rc))
        dres = np.linalg.norm(dviol) / cscale
        dual_obj = b @ y + ly @ (np.maximum(rc, 0.0) * fin_l) \
            + uy @ (np.minimum(rc, 0.0) * fin_u)
        pobj = c @ x
        gap = abs(pobj - dual_obj) / (1.0 + abs(pobj) + abs(dual_obj))
        return pres, dres, gap

    x = proj_x(np.asarray(x0, np.float64).copy())
    y = np.asarray(y0, np.float64).copy()
    Ax = A @ x
    xs = np.zeros_like(x)
    ys = np.zeros_like(y)
    wsum = 0.0
    eta = 0.9 / opnorm
    omega = 1.0
    cnt = 0
    it = 0
    x_lr, y_lr = x.copy(), y.copy()
    score_lr = score_prev = np.inf
    best_x, best_y, best_score = x.copy(), y.copy(), np.inf
    done = False
    while it < max_iters and not done:
        for _ in range(check_every):
            tau = eta / omega
            sigma = eta * omega
            x_c = proj_x(x - tau * (c - AT @ y))
            Ax_c = A @ x_c
            y_c = proj_y(y + sigma * (b - (2.0 * Ax_c - Ax)))
            dx = x_c - x
            dy = y_c - y
            curv = abs(dy @ (Ax_c - Ax))
            nz = omega * (dx @ dx) + (dy @ dy) / omega
            eta_bar = nz / (2.0 * curv) if curv > 0 else 1e10 / opnorm
            k1 = it + 2.0
            if eta <= eta_bar:
                x, y, Ax = x_c, y_c, Ax_c
                xs += eta * x
                ys += eta * y
                wsum += eta
            eta = min((1.0 - k1 ** -0.3) * eta_bar,
                      (1.0 + k1 ** -0.6) * eta)
            eta = min(max(eta, 1e-10 / opnorm), 1e10 / opnorm)
            it += 1
        cnt += check_every
        x_avg = xs / wsum if wsum > 0 else x
        y_avg = ys / wsum if wsum > 0 else y
        pres_c, dres_c, gap_c = kkt_score(x, y)
        pres_a, dres_a, gap_a = kkt_score(x_avg, y_avg)
        if pres_a + dres_a + gap_a < pres_c + dres_c + gap_c:
            cand_x, cand_y = x_avg, y_avg
            pres, dres, gap = pres_a, dres_a, gap_a
        else:
            cand_x, cand_y = x, y
            pres, dres, gap = pres_c, dres_c, gap_c
        score = pres + dres + gap
        if score < best_score:
            best_x, best_y, best_score = cand_x.copy(), cand_y.copy(), score
        done = pres < tol and dres < tol and gap < tol
        sufficient = score <= 0.2 * score_lr
        necessary = score <= 0.8 * score_lr and score > score_prev
        artificial = cnt >= max(restart_period, int(0.36 * it))
        if sufficient or necessary or artificial or done:
            dx_move = np.linalg.norm(cand_x - x_lr)
            dy_move = np.linalg.norm(cand_y - y_lr)
            if dx_move > 1e-12 and dy_move > 1e-12:
                omega = float(np.exp(0.5 * np.log(dy_move / dx_move)
                                     + 0.5 * np.log(omega)))
                omega = min(max(omega, 1e-4), 1e4)
            x, y = cand_x.copy(), cand_y.copy()
            Ax = A @ x
            xs[:] = 0.0
            ys[:] = 0.0
            wsum = 0.0
            cnt = 0
            x_lr, y_lr = x.copy(), y.copy()
            score_lr = score
        score_prev = score
    if not done:
        x, y = best_x, best_y
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(it), \
        jnp.asarray(done)


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


def _active_set_polish(A_sp, b, c, l, u, eq, x, y):
    """Active-set Newton polish (the analog of PDLP's feasibility
    polishing): a stalled PDHG tail leaves tiny KKT violations whose decay
    rate is set by the LP's sharpness constant — but by then the active set
    is usually IDENTIFIED, so one least-squares solve per side removes them:

    * primal: snap at-bound variables exactly to their bounds, then add the
      minimum-norm interior correction restoring A x = b on active rows;
    * dual: re-solve y from the interior (basic-ish) columns' stationarity
      c_I = A_Iᵀ y in least squares, zeroing inactive '<='-row duals.

    Both are matrix-free LSMR solves on host f64.  The caller accepts the
    polished pair only if the verified KKT score improves, so a wrong
    active-set guess degrades nothing."""
    import scipy.sparse.linalg as spla

    from scipy.optimize import lsq_linear

    m, n = A_sp.shape
    scale = 1e-6 * (1.0 + np.abs(x).max(initial=0.0))
    at_l = np.isfinite(l) & (x - l <= scale)
    at_u = np.isfinite(u) & (u - x <= scale) & ~at_l
    interior = ~at_l & ~at_u
    # '<=' rows with (numerically) zero dual are inactive: slack stays basic
    yscale = 1e-8 * (1.0 + np.abs(y).max(initial=0.0))
    active_row = eq | (y < -yscale)
    A_act = A_sp[active_row].tocsc()
    b_act = b[active_row]
    cscale = 1.0 + np.abs(c).max(initial=0.0)
    bscale = 1.0 + np.abs(b).max(initial=0.0)

    def primal_fit(at_l_t, at_u_t, interior_t):
        """Snap bound variables and redistribute the active-row residual
        over the interior columns WITHIN their bounds (bounded LSQ — an
        unbounded correction can be infeasible exactly when the tentative
        eviction is wrong).  Returns (x_t, residual_norm)."""
        x_t = x.copy()
        x_t[at_l_t] = l[at_l_t]
        x_t[at_u_t] = u[at_u_t]
        idx = np.where(interior_t)[0]
        if idx.size and active_row.any():
            r = b_act - A_act @ x_t
            fit = lsq_linear(A_act[:, idx], r,
                             bounds=(l[idx] - x_t[idx], u[idx] - x_t[idx]),
                             method="trf", lsq_solver="lsmr",
                             lsmr_tol=1e-14, max_iter=30)
            x_t[idx] += fit.x
        return x_t, float(np.linalg.norm(b_act - A_act @ x_t))

    # dual side with active-set refinement: an over-included interior column
    # (one the optimum actually parks at a bound, but the FOM left slightly
    # inside) makes c_I = A_Iᵀ y inconsistent and smears ~equal residual
    # over every column.  Evict the worst violator to the bound its
    # reduced-cost sign implies — but commit only when the bounded primal
    # redistribution stays feasible (a wrong eviction shows up there).
    y_act = y[active_row].astype(np.float64)
    banned = np.zeros(n, dtype=bool)
    for _ in range(8):
        idx_i = np.where(interior)[0]
        if idx_i.size == 0:
            break
        A_ai = A_act[:, idx_i]
        y_act = spla.lsmr(A_ai.T, c[idx_i], atol=1e-14, btol=1e-14,
                          maxiter=500, x0=y_act)[0]
        rc_i = c[idx_i] - A_ai.T @ y_act
        evict = -1
        for j_rel in np.argsort(-np.abs(rc_i))[:4]:
            if abs(rc_i[j_rel]) <= 1e-12 * cscale:
                break
            j = idx_i[j_rel]
            if banned[j]:
                continue
            if rc_i[j_rel] > 0 and np.isfinite(l[j]):
                evict, to_lower = j, True
                break
            if rc_i[j_rel] < 0 and np.isfinite(u[j]):
                evict, to_lower = j, False
                break
        if evict < 0:
            break
        at_l_t, at_u_t = at_l.copy(), at_u.copy()
        (at_l_t if to_lower else at_u_t)[evict] = True
        interior_t = interior.copy()
        interior_t[evict] = False
        x_t, resid = primal_fit(at_l_t, at_u_t, interior_t)
        if resid <= 1e-9 * bscale:
            at_l, at_u, interior = at_l_t, at_u_t, interior_t
        else:
            banned[evict] = True   # infeasible eviction: keep it interior

    y_p = np.zeros(m)
    y_p[active_row] = y_act
    # keep '<=' duals sign-feasible
    y_p = np.where(eq, y_p, np.minimum(y_p, 0.0))
    x_p, _ = primal_fit(at_l, at_u, interior)
    return x_p, y_p


def pdhg_solve(A, b, c, l, u, sense=None,
               tol: float = 1e-6,
               max_iters: int = 100_000,
               restart_period: int = 200,
               x0=None, y0=None, rescale: bool = True,
               polish: bool = True,
               use_pallas: bool | None = None,
               mode: str = "adaptive") -> PDHGResult:
    """Solve an LP with restarted PDHG (Ruiz-equilibrated by default).

    Args:
        A: (m, n) dense array (jnp/np) or BCOO.
        sense: length-m array of '='/'<' (None = all equality).
        use_pallas: run the iteration chunks as the VMEM-resident Pallas
            kernel (ops/pdhg_pallas.py).  Default: on TPU when dense A
            fits the kernel's VMEM budget; forced True uses interpret
            mode off-TPU (slow — for testing).
        mode: 'adaptive' (PDLP adaptive step sizes + averaging restarts,
            the default/oracle) or 'halpern' (restarted reflected-Halpern
            acceleration, _pdhg_core_halpern — the sharp-tail engine;
            XLA path only).
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

    use_scipy_core = (isinstance(A, jsparse.BCOO) and mode == "adaptive"
                      and jax.default_backend() == "cpu")
    A_sp = None
    if use_scipy_core:
        # host mirror path (see below): power-iterate in scipy too — 50
        # BCOO matvecs on CPU would dwarf the setup
        import scipy.sparse as ssp

        A_sp = ssp.csr_matrix(
            (np.asarray(A.data),
             (np.asarray(A.indices[:, 0]), np.asarray(A.indices[:, 1]))),
            shape=A.shape)
        v = np.random.default_rng(0).standard_normal(n)
        v /= np.linalg.norm(v)
        AT_sp = A_sp.T.tocsr()
        for _ in range(50):
            w = AT_sp @ (A_sp @ v)
            v = w / (np.linalg.norm(w) + 1e-30)
        opnorm = jnp.asarray(
            np.sqrt(np.linalg.norm(AT_sp @ (A_sp @ v))), dtype)
    else:
        opnorm = estimate_opnorm(A)

    if x0 is None:
        x0 = jnp.clip(jnp.zeros(n, dtype=dtype), l, u)
    else:
        x0 = jnp.asarray(x0, dtype=dtype)
    if y0 is None:
        y0 = jnp.zeros(m, dtype=dtype)
    else:
        y0 = jnp.asarray(y0, dtype=dtype)

    check_every = min(64, restart_period)
    if use_pallas is None:
        from smart_crossover_tpu.config import on_tpu
        from smart_crossover_tpu.ops.pdhg_pallas import pdhg_pallas_ok

        use_pallas = (on_tpu() and not isinstance(A, jsparse.BCOO)
                      and pdhg_pallas_ok(-(-m // 8) * 8, -(-n // 128) * 128,
                                         dtype))
    if use_pallas and not isinstance(A, jsparse.BCOO):
        from smart_crossover_tpu.config import interpret_pallas
        from smart_crossover_tpu.ops.pdhg_pallas import (
            get_pdhg_chunk_fn, pad_lp_for_pallas)

        (Ap, bp, cp, lp, up, eqp, x0p, y0p, _, _) = pad_lp_for_pallas(
            A, b, c, l, u, is_eq, x0, y0)
        if mode == "halpern":
            from smart_crossover_tpu.ops.pdhg_pallas import (
                get_halpern_chunk_fn,
            )

            runner = get_halpern_chunk_fn(Ap.shape[0], Ap.shape[1],
                                          str(jnp.dtype(dtype)),
                                          check_every, interpret_pallas())
            x, y, iters, done = _pdhg_core_halpern(
                Ap, bp, cp, lp, up, eqp, opnorm, x0p, y0p,
                max_iters=max_iters, check_every=check_every,
                restart_period=restart_period, tol=tol,
                chunk_runner=runner)
        else:
            runner = get_pdhg_chunk_fn(Ap.shape[0], Ap.shape[1],
                                       str(jnp.dtype(dtype)), check_every,
                                       interpret_pallas())
            x, y, iters, done = _pdhg_core(
                Ap, bp, cp, lp, up, eqp, opnorm, x0p, y0p,
                max_iters=max_iters, check_every=check_every,
                restart_period=restart_period, tol=tol,
                chunk_runner=runner)
        x = x[:n]
        y = y[:m]
    else:
        if use_scipy_core:
            # BCOO matvecs on the CPU backend lower to gather/segment-sum
            # and are 30-100x slower than scipy csr; run the host mirror
            core = partial(_pdhg_core_scipy, A_sp)
        else:
            core = partial(_pdhg_core_halpern if mode == "halpern"
                           else _pdhg_core, A)
        x, y, iters, done = core(
            b, c, l, u, is_eq, opnorm, x0, y0,
            max_iters=max_iters, check_every=check_every,
            restart_period=restart_period, tol=tol)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # residuals below are measured in the (well-conditioned) scaled space;
    # the returned x, y, obj_val are unscaled to the original problem
    x_out = x * C if rescale else x
    y_out = y * R if rescale else y

    # final residuals (host f64, scaled space — the space the core measured)
    import scipy.sparse as ssp

    if isinstance(A, jsparse.BCOO):
        A_host = ssp.csr_matrix(
            (np.asarray(A.data, dtype=np.float64),
             (np.asarray(A.indices[:, 0]), np.asarray(A.indices[:, 1]))),
            shape=(m, n))
    else:
        A_host = ssp.csr_matrix(np.asarray(A, dtype=np.float64))
    b_h = np.asarray(b, dtype=np.float64)
    c_h = np.asarray(c, dtype=np.float64)
    ln = np.asarray(l, dtype=np.float64)
    un = np.asarray(u, dtype=np.float64)
    eq = np.asarray(is_eq)

    def host_kkt(xv, yv):
        r = A_host @ xv - b_h
        pres = float(np.linalg.norm(np.where(eq, r, np.maximum(r, 0.0)))
                     / (1.0 + np.linalg.norm(b_h)))
        rc = c_h - A_host.T @ yv
        lo_ok = np.isfinite(ln) & (xv <= ln + 1e-10)
        up_ok = np.isfinite(un) & (xv >= un - 1e-10)
        dviol = np.where(lo_ok, np.minimum(rc, 0.0),
                         np.where(up_ok, np.maximum(rc, 0.0), rc))
        dres = float(np.linalg.norm(dviol) / (1.0 + np.linalg.norm(c_h)))
        # true relative duality gap (reported NaN in round 1 — VERDICT #5)
        dual_obj = float(b_h @ yv
                         + np.where(np.isfinite(ln), ln, 0.0)
                         @ (np.maximum(rc, 0.0) * np.isfinite(ln))
                         + np.where(np.isfinite(un), un, 0.0)
                         @ (np.minimum(rc, 0.0) * np.isfinite(un)))
        pobj_s = float(c_h @ xv)
        gap = abs(pobj_s - dual_obj) / (1.0 + abs(pobj_s) + abs(dual_obj))
        return pres, dres, gap

    pres, dres, gap = host_kkt(x, y)
    if polish and max(pres, dres, gap) > 1e-14:
        try:
            x_p, y_p = _active_set_polish(A_host, b_h, c_h, ln, un, eq, x, y)
            p2, d2, g2 = host_kkt(x_p, y_p)
            if max(p2, d2, g2) < max(pres, dres, gap):
                x, y = x_p, y_p
                pres, dres, gap = p2, d2, g2
                x_out = x * C if rescale else x
                y_out = y * R if rescale else y
        except Exception:   # polish is best-effort; the FOM pair stands
            pass
    done = bool(done) or max(pres, dres, gap) < tol
    obj = float(c_in @ x_out)
    status = "OPTIMAL" if done else "ITERATION_LIMIT"
    return PDHGResult(x=x_out, y=y_out, obj_val=obj, iter_count=int(iters),
                      status=status,
                      runtime=datetime.timedelta(
                          seconds=time.perf_counter() - t0),
                      primal_residual=pres, dual_residual=dres,
                      gap=gap)


def pdhg_general_lp(lp, tol: float = 1e-6, max_iters: int = 100_000,
                    x0=None, y0=None, sparse: bool | None = None,
                    mode: str = "adaptive") -> PDHGResult:
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
                      max_iters=max_iters, x0=x0, y0=y0, mode=mode)
