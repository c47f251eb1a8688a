"""Mesh-sharded PDHG: one large LP, column blocks over the 'model' axis.

The BASELINE scaling plan calls for sharding LP column blocks across chips.
Here the primal vector x and the columns of A live sharded; the dual vector
y is replicated.  Per iteration:

    x-update:  local   (c_loc - A_loc' y)          — no communication
    y-update:  psum_j  (A_loc @ x_bar_loc)          — one m-vector all-reduce

so the only collective is the psum riding the ICI, exactly like the
projector's CG reductions.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from smart_crossover_tpu.parallel.mesh import MODEL_AXIS


def sharded_pdhg(mesh, A, b, c, l, u, sense=None,
                 num_iters: int = 10_000, restart_period: int = 200,
                 opnorm: float | None = None):
    """Run restarted PDHG with A column-sharded over the mesh 'model' axis.

    Args:
        A: (m, n) dense; n must divide evenly by the mesh width.
        sense: '='/'<' per row (None = all '=').

    Returns:
        (x, y) as numpy arrays (x gathered).
    """
    m, n = A.shape
    A = jnp.asarray(A, jnp.float32) if jnp.asarray(A).dtype == jnp.float32 \
        else jnp.asarray(A)
    dt = A.dtype
    b = jnp.asarray(b, dt)
    c = jnp.asarray(c, dt)
    l = jnp.asarray(l, dt)
    u = jnp.asarray(u, dt)
    is_eq = jnp.ones(m, dtype=bool) if sense is None else \
        jnp.asarray(np.asarray(sense) == "=")

    if opnorm is None:
        v = np.random.default_rng(0).standard_normal(n)
        An = np.asarray(A)
        for _ in range(30):
            w = An.T @ (An @ v)
            v = w / (np.linalg.norm(w) + 1e-30)
        opnorm = float(np.sqrt(np.linalg.norm(An.T @ (An @ v))))
    tau = 0.9 / opnorm
    sigma = 0.9 / opnorm

    col = NamedSharding(mesh, P(None, MODEL_AXIS))
    vec = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    A = jax.device_put(A, col)
    c = jax.device_put(c, vec)
    l = jax.device_put(l, vec)
    u = jax.device_put(u, vec)
    b = jax.device_put(b, rep)
    is_eq = jax.device_put(is_eq, rep)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, MODEL_AXIS), P(), P(MODEL_AXIS),
                       P(MODEL_AXIS), P(MODEL_AXIS), P()),
             out_specs=(P(MODEL_AXIS), P()), check_vma=False)
    def _run(A_loc, b_full, c_loc, l_loc, u_loc, is_eq_full):
        nloc = c_loc.shape[0]
        x = jnp.clip(jnp.zeros(nloc, dt), l_loc, u_loc)
        y = jnp.zeros_like(b_full)

        def one(carry, _):
            x, y, xs, ys = carry
            x_new = jnp.clip(x - tau * (c_loc - A_loc.T @ y), l_loc, u_loc)
            x_bar = 2.0 * x_new - x
            Ax = jax.lax.psum(A_loc @ x_bar, MODEL_AXIS)
            y_new = y + sigma * (b_full - Ax)
            y_new = jnp.where(is_eq_full, y_new, jnp.minimum(y_new, 0.0))
            return (x_new, y_new, xs + x_new, ys + y_new), None

        def window(state, _):
            x, y = state
            (x, y, xs, ys), _ = jax.lax.scan(
                one, (x, y, jnp.zeros_like(x), jnp.zeros_like(y)),
                None, length=restart_period)
            # restart at the window average (fixed-period averaging restart)
            return (xs / restart_period, ys / restart_period), None

        (x, y), _ = jax.lax.scan(window, (x, y), None,
                                 length=num_iters // restart_period)
        return x, y

    x, y = jax.jit(_run)(A, b, c, l, u, is_eq)
    return np.asarray(x, np.float64), np.asarray(y, np.float64)
