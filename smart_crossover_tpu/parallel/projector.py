"""Mesh-sharded null-space projection and Sinkhorn kernels.

The BASELINE north star calls for the projection/least-squares kernel to
scale over chips with all-reduced CG dot products.  Both kernels here use
``shard_map`` over the mesh 'model' axis with explicit ``psum``/``pmax``
collectives, so a single large instance (big Y, big OT cost matrix) is
partitioned by columns across the mesh while every device holds only its
shard.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from smart_crossover_tpu.parallel.mesh import MODEL_AXIS


def sharded_projector(mesh, Y, v, tol: float = 1e-8, max_iter: int = 200):
    """Distributed  v - Y'(YY')^+ Y v  with Y column-sharded over 'model'.

    Each device holds Y_loc (m, n/p) and v_loc (n/p).  The CG operator
    ``z -> YY'z`` becomes ``psum(Y_loc @ (Y_loc' @ z))`` — one all-reduce of
    an m-vector per CG iteration riding the ICI.
    """
    col = NamedSharding(mesh, P(None, MODEL_AXIS))
    vec = NamedSharding(mesh, P(MODEL_AXIS))
    Y = jax.device_put(jnp.asarray(Y), col)
    v = jax.device_put(jnp.asarray(v), vec)

    # check_vma=False: jax.scipy CG mixes psum-replicated and shard-varying
    # values in ways the strict varying-manual-axes checker rejects (the
    # computation is still correct: the CG state is replicated).
    @partial(shard_map, mesh=mesh, in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS)),
             out_specs=P(MODEL_AXIS), check_vma=False)
    def _proj(Y_loc, v_loc):
        Yv = jax.lax.psum(Y_loc @ v_loc, MODEL_AXIS)

        def mv(z):
            return jax.lax.psum(Y_loc @ (Y_loc.T @ z), MODEL_AXIS)

        z, _ = jax.scipy.sparse.linalg.cg(mv, Yv, tol=tol, maxiter=max_iter)
        return v_loc - Y_loc.T @ z

    return jax.jit(_proj)(Y, v)


def sharded_sinkhorn_plan(mesh, s, d, M, reg, num_iters: int = 200):
    """Sinkhorn for ONE large OT instance with the demand axis sharded.

    M (S, D) is column-sharded over 'model'; the f-update's row logsumexp
    reduces across shards with pmax (stability) + psum (the sum), while the
    g-update is shard-local.  Returns the (rounded) plan, column-sharded.
    """
    colM = NamedSharding(mesh, P(None, MODEL_AXIS))
    colv = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    M = jax.device_put(jnp.asarray(M), colM)
    s = jax.device_put(jnp.asarray(s), rep)
    d = jax.device_put(jnp.asarray(d), colv)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(MODEL_AXIS), P(None, MODEL_AXIS)),
             out_specs=P(None, MODEL_AXIS))
    def _sink(s_full, d_loc, M_loc):
        log_s = jnp.log(s_full)
        log_d = jnp.log(d_loc)
        f = jnp.zeros_like(log_s)
        g = jnp.zeros_like(log_d)

        def body(_, fg):
            f, g = fg
            # f-update: logsumexp over ALL columns (cross-shard)
            t = (g[None, :] - M_loc) / reg          # (S, D_loc)
            tmax = jax.lax.pmax(jnp.max(t, axis=1), MODEL_AXIS)
            ssum = jax.lax.psum(
                jnp.sum(jnp.exp(t - tmax[:, None]), axis=1), MODEL_AXIS)
            f = reg * (log_s - (tmax + jnp.log(ssum)))
            # g-update: logsumexp over rows (shard-local)
            t2 = (f[:, None] - M_loc) / reg
            t2max = jnp.max(t2, axis=0)
            g = reg * (log_d - (t2max + jnp.log(
                jnp.sum(jnp.exp(t2 - t2max[None, :]), axis=0))))
            return f, g

        f, g = jax.lax.fori_loop(0, num_iters, body, (f, g))
        return jnp.exp((f[:, None] + g[None, :] - M_loc) / reg)

    return jax.jit(_sink)(s, d, M)
