"""Comparison plots.

Capability parity with the reference's matplotlib figures
(reference visualization.py:198-335): per-instance log-scale runtime bars
for ours-vs-baseline with a relative-gap overlay.  matplotlib is imported
lazily so headless/metrics-only environments never pay for it.
"""
from __future__ import annotations

from collections import defaultdict


def runtime_comparison_figure(store, ours: str, baseline: str,
                              gap_key: str = "rel_gap_vs_barrier",
                              save_to: str | None = None):
    """Log-scale grouped runtime bars + relative-gap scatter overlay."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rows_by = defaultdict(dict)
    for row in store.rows():
        rows_by[row["instance"]][row["method"]] = row
    insts = sorted(i for i, ms in rows_by.items()
                   if ours in ms and baseline in ms)
    if not insts:
        raise ValueError(f"no instances with both {ours!r} and {baseline!r}")
    t_ours = [rows_by[i][ours].get("runtime") or 3600.0 for i in insts]
    t_base = [rows_by[i][baseline].get("runtime") or 3600.0 for i in insts]
    gaps = [rows_by[i][ours].get(gap_key) for i in insts]

    x = np.arange(len(insts))
    w = 0.38
    fig, ax = plt.subplots(figsize=(max(6, len(insts) * 0.7), 4))
    ax.bar(x - w / 2, t_ours, w, label=ours)
    ax.bar(x + w / 2, t_base, w, label=baseline)
    ax.set_yscale("log")
    ax.set_ylabel("runtime (s, log)")
    ax.set_xticks(x)
    ax.set_xticklabels(insts, rotation=60, ha="right", fontsize=7)
    ax.legend(loc="upper left")
    if any(g is not None for g in gaps):
        ax2 = ax.twinx()
        ax2.scatter(x, [g if g is not None else float("nan") for g in gaps],
                    color="black", marker="x", s=14, label="rel gap")
        ax2.set_yscale("log")
        ax2.set_ylabel("relative gap")
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, dpi=150)
    return fig
