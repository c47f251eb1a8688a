"""Pallas TPU kernel: VMEM-resident PDHG iteration chunks.

The XLA PDHG core (solvers/pdhg.py::_pdhg_core) does two A-matvecs per
iteration (A'y and A x̄); with a dense A in HBM that is two full streams of
A per iteration — the loop is HBM-bandwidth-bound while the arithmetic per
iteration is tiny.  This kernel pins A in VMEM for a whole ``chunk`` of
iterations (the restart-check window), so A is read from HBM once per
chunk instead of 2*chunk times.  The in-kernel math is the SAME adaptive
PDLP step-size rule as the XLA path (see _pdhg_core.one_iter), so the two
paths are numerically interchangeable and the XLA path remains the oracle.

Eligibility (``pdhg_pallas_ok``): dense A with m % 8 == 0, n % 128 == 0
(callers pad — zero rows/columns with l = u = 0 are exact no-ops for PDHG)
and the VMEM working set within budget.  Replaces the reference's reliance
on vendor barrier solvers for the warm-start solve
(reference lp_methods/algorithms.py:38-40) with an in-house first-order
method whose hot loop runs at VMEM speed.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_crossover_tpu.config import interpret_pallas


def _pdhg_chunk_kernel(A_ref, b_ref, c_ref, l_ref, u_ref, eq_ref,
                       x_ref, y_ref, Ax_ref, xs_ref, ys_ref, scal_ref,
                       x_out, y_out, Ax_out, xs_out, ys_out, scal_out,
                       *, chunk):
    A = A_ref[...]                       # (m, n), VMEM-resident all chunk
    b = b_ref[...]                       # (1, m)
    c = c_ref[...]                       # (1, n)
    l = l_ref[...]
    u = u_ref[...]
    eq = eq_ref[...]                     # (1, m), 1.0 on '=' rows
    omega = scal_ref[0, 2]
    opnorm = scal_ref[0, 4]
    dt = A.dtype

    def atv(y_row):                      # A'y: (1, m) x (m, n) -> (1, n)
        return jax.lax.dot_general(y_row, A, (((1,), (0,)), ((), ())),
                                   preferred_element_type=dt)

    def av(x_row):                       # A x: (1, n) x (m, n)' -> (1, m)
        return jax.lax.dot_general(x_row, A, (((1,), (1,)), ((), ())),
                                   preferred_element_type=dt)

    def body(_, carry):
        # identical math to solvers/pdhg.py::_pdhg_core.one_iter
        x, y, Ax, xs, ys, wsum, eta, k = carry
        tau = eta / omega
        sigma = eta * omega
        x_c = jnp.clip(x - tau * (c - atv(y)), l, u)
        Ax_c = av(x_c)
        y_t = y + sigma * (b - (2.0 * Ax_c - Ax))
        y_c = jnp.where(eq > 0, y_t, jnp.minimum(y_t, 0.0))
        dx = x_c - x
        dy = y_c - y
        curv = jnp.abs(jnp.sum(dy * (Ax_c - Ax)))
        nz = omega * jnp.sum(dx * dx) + jnp.sum(dy * dy) / omega
        eta_bar = jnp.where(curv > 0, nz / (2.0 * curv), 1e10 / opnorm)
        accept = eta <= eta_bar
        # PDLP schedule index is k+2 for 0-based k (counter pre-increment);
        # the carried counter itself advances by 1 (k1 below).
        k1 = k + 1.0
        ksched = k + 2.0
        # **p as exp(p*log(.)): Mosaic has no powf lowering (ksched >= 2)
        logk1 = jnp.log(ksched)
        eta_next = jnp.minimum((1.0 - jnp.exp(-0.3 * logk1)) * eta_bar,
                               (1.0 + jnp.exp(-0.6 * logk1)) * eta)
        eta_next = jnp.clip(eta_next, 1e-10 / opnorm, 1e10 / opnorm)
        x = jnp.where(accept, x_c, x)
        y = jnp.where(accept, y_c, y)
        Ax = jnp.where(accept, Ax_c, Ax)
        w = jnp.where(accept, eta, jnp.zeros_like(eta))
        return (x, y, Ax, xs + w * x, ys + w * y, wsum + w, eta_next, k1)

    init = (x_ref[...], y_ref[...], Ax_ref[...], xs_ref[...], ys_ref[...],
            scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 3])
    x, y, Ax, xs, ys, wsum, eta, k = jax.lax.fori_loop(
        0, chunk, body, init)
    x_out[...] = x
    y_out[...] = y
    Ax_out[...] = Ax
    xs_out[...] = xs
    ys_out[...] = ys
    scal_out[0, 0] = wsum
    scal_out[0, 1] = eta
    scal_out[0, 2] = omega
    scal_out[0, 3] = k
    scal_out[0, 4] = opnorm


def pdhg_pallas_ok(m: int, n: int, dtype=jnp.float32,
                   vmem_budget: int = 14 * 1024 * 1024) -> bool:
    """Alignment + VMEM-budget gate (callers pad to reach alignment).

    A counts TWICE: Mosaic relayouts the dim-1-contracted copy for the
    A x̄ product (measured: 1024x2048 f32 = 8 MB A needs 16.04 MB)."""
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (2 * m * n + 16 * (m + n)) * itemsize
    return m % 8 == 0 and n % 128 == 0 and vmem < vmem_budget


@lru_cache(maxsize=32)
def get_pdhg_chunk_fn(m: int, n: int, dtype_name: str, chunk: int,
                      interpret: bool):
    """A cached chunk function for (m, n, dtype): takes the problem data
    as ARGUMENTS (so one compilation serves any problem of this shape) and
    runs ``chunk`` PDHG iterations in one VMEM-resident Pallas call.

    Signature of the returned fn:
        fn(A, b, c, l, u, eq_mask, x, y, Ax, xs, ys,
           wsum, eta, omega, k, opnorm)
        -> (x, y, Ax, xs, ys, wsum, eta)
    with 1-D vectors; eq_mask numeric (1.0 on '=' rows).
    """
    dt = jnp.dtype(dtype_name)
    kernel = partial(_pdhg_chunk_kernel, chunk=chunk)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[vspec] * 11 + [sspec],
        out_specs=(vspec, vspec, vspec, vspec, vspec, sspec),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dt),   # x
            jax.ShapeDtypeStruct((1, m), dt),   # y
            jax.ShapeDtypeStruct((1, m), dt),   # Ax
            jax.ShapeDtypeStruct((1, n), dt),   # xs
            jax.ShapeDtypeStruct((1, m), dt),   # ys
            jax.ShapeDtypeStruct((1, 8), dt),   # scalars
        ),
        interpret=interpret,
    )

    def fn(A, b, c, l, u, eq, x, y, Ax, xs, ys,
           wsum, eta, omega, k, opnorm):
        scal = jnp.zeros((1, 8), dt)
        scal = scal.at[0, 0].set(jnp.asarray(wsum, dt))
        scal = scal.at[0, 1].set(jnp.asarray(eta, dt))
        scal = scal.at[0, 2].set(jnp.asarray(omega, dt))
        scal = scal.at[0, 3].set(jnp.asarray(k, dt))
        scal = scal.at[0, 4].set(jnp.asarray(opnorm, dt))
        xo, yo, Axo, xso, yso, so = call(
            A,
            jnp.reshape(b, (1, m)), jnp.reshape(c, (1, n)),
            jnp.reshape(l, (1, n)), jnp.reshape(u, (1, n)),
            jnp.reshape(jnp.asarray(eq, dt), (1, m)),
            jnp.reshape(x, (1, n)), jnp.reshape(y, (1, m)),
            jnp.reshape(Ax, (1, m)), jnp.reshape(xs, (1, n)),
            jnp.reshape(ys, (1, m)), scal)
        return (xo[0], yo[0], Axo[0], xso[0], yso[0],
                so[0, 0], so[0, 1])

    return fn


def pad_lp_for_pallas(A, b, c, l, u, is_eq, x0, y0):
    """Zero-pad to (8, 128)-aligned shapes.  Padded columns get l = u = 0
    (pinned at zero, zero cost) and padded rows are all-zero '=' rows with
    b = 0 — both exact no-ops for every PDHG quantity, including the KKT
    scores the restart logic reads."""
    m, n = A.shape
    mp = -(-m // 8) * 8
    np_ = -(-n // 128) * 128
    if (mp, np_) == (m, n):
        return A, b, c, l, u, is_eq, x0, y0, m, n
    Ap = jnp.zeros((mp, np_), A.dtype).at[:m, :n].set(A)
    pad_v = lambda v, size: jnp.concatenate(
        [jnp.asarray(v), jnp.zeros(size - len(v), jnp.asarray(v).dtype)])
    return (Ap, pad_v(b, mp), pad_v(c, np_), pad_v(l, np_), pad_v(u, np_),
            jnp.concatenate([jnp.asarray(is_eq),
                             jnp.ones(mp - m, dtype=bool)]),
            pad_v(x0, np_), pad_v(y0, mp), m, n)


def _halpern_chunk_kernel(A_ref, b_ref, c_ref, l_ref, u_ref, eq_ref,
                          x_ref, y_ref, Ax_ref, xa_ref, ya_ref, Axa_ref,
                          scal_ref,
                          x_out, y_out, Ax_out, scal_out, *, chunk):
    """VMEM-resident chunk of restarted reflected-Halpern PDHG iterations
    (solvers/pdhg.py::_pdhg_core_halpern's inner scan).  Fixed step sizes
    make this kernel simpler than the adaptive one: no trial/acceptance
    logic, no running averages — the anchor pair rides along instead."""
    A = A_ref[...]
    b = b_ref[...]
    c = c_ref[...]
    l = l_ref[...]
    u = u_ref[...]
    eq = eq_ref[...]
    xa = xa_ref[...]
    ya = ya_ref[...]
    Axa = Axa_ref[...]
    omega = scal_ref[0, 0]
    step = scal_ref[0, 2]
    dt = A.dtype
    tau = step / omega
    sigma = step * omega

    def atv(y_row):
        return jax.lax.dot_general(y_row, A, (((1,), (0,)), ((), ())),
                                   preferred_element_type=dt)

    def av(x_row):
        return jax.lax.dot_general(x_row, A, (((1,), (1,)), ((), ())),
                                   preferred_element_type=dt)

    def body(_, carry):
        x, y, Ax, k = carry
        x_t = jnp.clip(x - tau * (c - atv(y)), l, u)
        Ax_t = av(x_t)
        y_t0 = y + sigma * (b - (2.0 * Ax_t - Ax))
        y_t = jnp.where(eq > 0, y_t0, jnp.minimum(y_t0, 0.0))
        lam = (k + 1.0) / (k + 2.0)
        x_n = lam * (2.0 * x_t - x) + (1.0 - lam) * xa
        y_n = lam * (2.0 * y_t - y) + (1.0 - lam) * ya
        Ax_n = lam * (2.0 * Ax_t - Ax) + (1.0 - lam) * Axa
        return (x_n, y_n, Ax_n, k + 1.0)

    x, y, Ax, k = jax.lax.fori_loop(
        0, chunk, body,
        (x_ref[...], y_ref[...], Ax_ref[...], scal_ref[0, 1]))
    x_out[...] = x
    y_out[...] = y
    Ax_out[...] = Ax
    scal_out[0, 0] = omega
    scal_out[0, 1] = k
    scal_out[0, 2] = step


@lru_cache(maxsize=32)
def get_halpern_chunk_fn(m: int, n: int, dtype_name: str, chunk: int,
                         interpret: bool):
    """Cached VMEM-resident Halpern chunk for (m, n, dtype): runs ``chunk``
    reflected-Halpern iterations per call with A read from HBM once.

    Signature: fn(A, b, c, l, u, eq_mask, x, y, Ax, xa, ya, Axa,
                  omega, k, step) -> (x, y, Ax, k); 1-D vectors."""
    dt = jnp.dtype(dtype_name)
    kernel = partial(_halpern_chunk_kernel, chunk=chunk)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        in_specs=[vspec] * 12 + [sspec],
        out_specs=(vspec, vspec, vspec, sspec),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dt),   # x
            jax.ShapeDtypeStruct((1, m), dt),   # y
            jax.ShapeDtypeStruct((1, m), dt),   # Ax
            jax.ShapeDtypeStruct((1, 4), dt),   # scalars
        ),
        interpret=interpret,
    )

    def fn(A, b, c, l, u, eq, x, y, Ax, xa, ya, Axa, omega, k, step):
        scal = jnp.zeros((1, 4), dt)
        scal = scal.at[0, 0].set(jnp.asarray(omega, dt))
        scal = scal.at[0, 1].set(jnp.asarray(k, dt))
        scal = scal.at[0, 2].set(jnp.asarray(step, dt))
        xo, yo, Axo, so = call(
            A,
            jnp.reshape(b, (1, m)), jnp.reshape(c, (1, n)),
            jnp.reshape(l, (1, n)), jnp.reshape(u, (1, n)),
            jnp.reshape(jnp.asarray(eq, dt), (1, m)),
            jnp.reshape(x, (1, n)), jnp.reshape(y, (1, m)),
            jnp.reshape(Ax, (1, m)), jnp.reshape(xa, (1, n)),
            jnp.reshape(ya, (1, m)), jnp.reshape(Axa, (1, m)), scal)
        return xo[0], yo[0], Axo[0], so[0, 1]

    return fn
