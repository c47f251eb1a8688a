"""Borůvka maximum-weight spanning tree on a dense bipartite graph.

Replaces the reference's scipy ``minimum_spanning_tree`` call
(reference tree_BI.py:32-59) with a fixed-trip-count parallel Borůvka that
runs entirely on device (O(log V) rounds of dense masked argmax + segment
reductions + pointer jumping), so it jit-compiles, shards and vmaps.

Edges are totally ordered by (weight desc, flat edge id asc); every component
picks its best outgoing edge under that strict order, which makes the union of
picks acyclic (up to mutual picks, which are deduplicated) — the standard
Borůvka tie-safety argument.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def boruvka_bipartite_mst(W):
    """Maximum-weight spanning tree of the complete bipartite graph.

    Args:
        W: (S, D) dense edge weights; the graph has S supplier nodes,
           D demander nodes, and an edge (i, j) for every entry.

    Returns:
        (S, D) boolean mask with exactly S + D - 1 True entries (the tree).
    """
    S, D = W.shape
    V = S + D
    NO_EDGE = jnp.iinfo(jnp.int32).max
    max_rounds = int(math.ceil(math.log2(max(V, 2)))) + 2
    jump_rounds = int(math.ceil(math.log2(max(V, 2)))) + 1

    sup_ids = jnp.arange(S, dtype=jnp.int32)
    dem_ids = jnp.arange(D, dtype=jnp.int32)

    def round_body(state):
        comp, tree_mask, _, it = state
        comp_s = comp[:S]
        comp_d = comp[S:]
        cross = comp_s[:, None] != comp_d[None, :]
        Wm = jnp.where(cross, W, -jnp.inf)

        # Per-node best outgoing edge; argmax returns the first maximum, which
        # is the smallest flat edge id along each axis for this layout.
        best_j = jnp.argmax(Wm, axis=1).astype(jnp.int32)
        best_w_s = jnp.max(Wm, axis=1)
        best_i = jnp.argmax(Wm, axis=0).astype(jnp.int32)
        best_w_d = jnp.max(Wm, axis=0)

        node_w = jnp.concatenate([best_w_s, best_w_d])
        node_eid = jnp.concatenate([sup_ids * D + best_j, best_i * D + dem_ids])
        node_eid = jnp.where(jnp.isfinite(node_w), node_eid, NO_EDGE)

        # Per-component champion: max weight, then min edge id.
        comp_w = jax.ops.segment_max(node_w, comp, num_segments=V)
        is_cand = jnp.isfinite(node_w) & (node_w == comp_w[comp])
        cand_eid = jnp.where(is_cand, node_eid, NO_EDGE)
        comp_eid = jax.ops.segment_min(cand_eid, comp, num_segments=V)

        any_pick = jnp.any(comp_eid < NO_EDGE)

        # Mark picked edges in the tree (duplicates from mutual picks collapse).
        pick_valid = comp_eid < NO_EDGE
        safe_eid = jnp.where(pick_valid, comp_eid, 0)
        pi = safe_eid // D
        pj = safe_eid % D
        # scatter-OR (duplicate indices are common: invalid picks all park at
        # (0, 0) with a False contribution, mutual picks write twice)
        tree_mask = tree_mask.at[pi, pj].max(pick_valid)

        # Hook each picking component onto the component across its edge.
        e_cs = comp[pi]           # supplier-side component of picked edge
        e_cd = comp[S + pj]       # demander-side component
        c_ids = jnp.arange(V, dtype=comp.dtype)
        other = jnp.where(e_cs == c_ids, e_cd, e_cs)
        parent = jnp.where(pick_valid, other, c_ids)
        # Break mutual (2-cycle) hooks: the smaller label wins as root.
        mutual = parent[parent] == c_ids
        parent = jnp.where(mutual & (c_ids < parent), c_ids, parent)
        # Pointer jumping to full compression.
        for _ in range(jump_rounds):
            parent = parent[parent]
        comp = parent[comp]

        return comp, tree_mask, any_pick, it + 1

    def cond(state):
        _, _, changed, it = state
        return changed & (it < max_rounds)

    comp0 = jnp.arange(V, dtype=jnp.int32)
    tree0 = jnp.zeros((S, D), dtype=bool)
    _, tree_mask, _, _ = jax.lax.while_loop(
        cond, round_body, (comp0, tree0, jnp.asarray(True), jnp.asarray(0))
    )
    return tree_mask
