"""Tree basis identification for TNET.

Parity with reference tree_BI.py:12-114, rebuilt on the jittable device
kernels: Borůvka max-weight spanning tree (ops/mst.py) instead of scipy
csgraph, parallel leaf-elimination tree solve (ops/tree.py) instead of a
sparse LU, and the irrigation push as a `lax.while_loop`.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from smart_crossover_tpu.models import Basis
from smart_crossover_tpu.ops.mst import boruvka_bipartite_mst
from smart_crossover_tpu.ops.tree import bipartite_tree_solve, push_to_bfs


def tree_basis_identify(ot_manager, flow_weights: np.ndarray) -> Tuple[Basis, int]:
    """Identify a feasible tree basis for an OT problem.

    1. max-weight spanning tree of the bipartite graph, weighted by the
       interior-point / Sinkhorn flow indicators;
    2. solve the tree flow system;
    3. push negative tree flows to feasibility (irrigation pivots).

    Returns the basis (vbasis over the s*d grid, cbasis = [-1]*(m-1) + [0])
    and the number of push iterations.
    """
    ot = ot_manager.ot
    ns, nd = ot.s.size, ot.d.size
    # bucket the grid to multiples of 64 so instances of similar size share
    # one compiled kernel; padding nodes carry epsilon mass and zero weight,
    # and their (negligible) flows are sliced away — the warm-started
    # network simplex repairs any padding-induced basis defect
    pad = 64
    ns_p = -(-ns // pad) * pad
    nd_p = -(-nd // pad) * pad
    eps = 1e-9
    W = np.zeros((ns_p, nd_p))
    W[:ns, :nd] = np.asarray(flow_weights).reshape(ns, nd)
    s_p = np.full(ns_p, eps)
    d_p = np.full(nd_p, eps)
    s_p[:ns] = ot.s
    d_p[:nd] = ot.d
    # multiplicative rebalance so sum(s_p) == sum(d_p) (relative 1e-9-scale
    # perturbation; the exact cleanup absorbs it)
    d_p *= s_p.sum() / d_p.sum()
    X, push_iter = identify_tree_flows(jnp.asarray(W), jnp.asarray(s_p),
                                       jnp.asarray(d_p))
    X = np.asarray(X)[:ns, :nd]
    vbasis = np.full(ns * nd, -1, dtype=np.int32)
    vbasis[X.reshape(-1) > eps * 10] = 0
    cbasis = np.concatenate([-np.ones(ot_manager.m - 1, dtype=np.int32), [0]])
    return Basis(vbasis, cbasis), int(push_iter)


def identify_tree_flows(W, s, d):
    """Jittable core of TNET basis identification: MST -> tree solve -> push.

    Returns (X, push_iters) where X is a feasible flow supported on at most
    s.size + d.size - 1 entries.
    """
    mask = boruvka_bipartite_mst(W)
    X = bipartite_tree_solve(mask, s, d)
    X, iters = push_to_bfs(X)
    return X, iters
