"""Paper-style analysis figures (analysis/plots.py parity additions)."""
import numpy as np


def _store(tmp_path):
    from smart_crossover_tpu.data import ResultStore

    st = ResultStore(tmp_path / "r.jsonl")
    rng = np.random.default_rng(0)
    for k in range(6):
        name = f"inst{k}"
        base = float(rng.uniform(10, 100))
        st.record(name, "ori", status="OPTIMAL", runtime=base,
                  obj_val=1.0 + k)
        st.record(name, "ptb", status="OPTIMAL", runtime=base / 5,
                  obj_val=1.0 + k + 1e-10)
        st.record(name, "tnet", status="OPTIMAL", runtime=base / 8,
                  obj_val=1.0 + k)
    st.record("inst9", "ori", status="TIME_LIMIT", runtime=3600.0,
              obj_val=None)
    st.record("inst9", "ptb", status="OPTIMAL", runtime=4.0, obj_val=9.0)
    return st


def test_perturb_comparison_figure(tmp_path):
    from smart_crossover_tpu.analysis.plots import perturb_comparison_figure

    fig = perturb_comparison_figure(_store(tmp_path),
                                    save_to=str(tmp_path / "p.png"))
    assert (tmp_path / "p.png").exists()
    assert len(fig.axes) == 2


def test_speedup_ratio_figure(tmp_path):
    from smart_crossover_tpu.analysis.plots import speedup_ratio_figure

    fig = speedup_ratio_figure(_store(tmp_path),
                               save_to=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").exists()


def test_network_comparison_figure(tmp_path):
    from smart_crossover_tpu.analysis.plots import network_comparison_figure

    fig = network_comparison_figure(_store(tmp_path),
                                    methods=("tnet", "ptb", "ori"),
                                    save_to=str(tmp_path / "n.png"))
    assert (tmp_path / "n.png").exists()
