"""LP-format (.lp) reader/writer tests + hardened-MPS quirk tests.

Covers the reference's ``.lp`` ingest capability (reference
filehandling.py:30-44 reads .lp via Gurobi) and the fixed-format MPS
quirks (dollar comments, omitted set names) from VERDICT round-1 item 7.
Oracle: scipy ``linprog(method='highs')``.
"""
import gzip

import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.data import load_instance, read_lp, read_mps, write_lp
from smart_crossover_tpu.data.lp_format import LPFormatError
from smart_crossover_tpu.models import GeneralLP
from smart_crossover_tpu.solvers import solve_lp


def _highs_obj(lp: GeneralLP) -> float:
    import scipy.sparse as sp

    A = np.asarray(sp.csr_matrix(lp.A).todense())
    eq = lp.sense == "="
    res = linprog(
        lp.c, A_ub=A[~eq], b_ub=lp.b[~eq], A_eq=A[eq], b_eq=lp.b[eq],
        bounds=[(lo if np.isfinite(lo) else None,
                 hi if np.isfinite(hi) else None)
                for lo, hi in zip(lp.l, lp.u)],
        method="highs")
    assert res.status == 0, res.message
    return res.fun + lp.obj_offset


LP_SAMPLE = r"""\ test problem
Maximize
 obj: 3 x + 2y - 4 z + 1.5
Subject To
 c1: x + y <= 10
 c2: 2 x - 3 y + z = 5
 c3: - x + y >= -2
 r1: 1 <= x + z <= 4
Bounds
 -2 <= y <= 8
 z free
 0.5 <= x
End
"""


def test_lp_reader_basic(tmp_path):
    p = tmp_path / "t.lp"
    p.write_text(LP_SAMPLE)
    lp = read_lp(p)
    assert lp.n == 3 and lp.m == 5          # ranged row split in two
    assert lp.col_names == ["x", "y", "z"]
    # maximize negated into min form with negated offset
    np.testing.assert_allclose(lp.c, [-3.0, -2.0, 4.0])
    assert lp.obj_offset == pytest.approx(-1.5)
    assert set(lp.sense) <= {"=", "<"}
    np.testing.assert_allclose(lp.l, [0.5, -2.0, -np.inf])
    np.testing.assert_allclose(lp.u, [np.inf, 8.0, np.inf])
    assert _highs_obj(lp) == pytest.approx(-4.0)


def test_lp_syntax_torture(tmp_path):
    # multiline constraints, no-space coefficients, unary-sign chains,
    # '=<'/'=>' spellings, constants on both sides, unnamed objective
    src = """minimize
 2x1 + 3 x2
 - x3
st
 a: x1 + x2
    + x3 >= 4
 b: 3 + x1 =< x2 + 7
 c: - - x3 => 1
bounds
 x3 <= 10
end
"""
    p = tmp_path / "t2.lp"
    p.write_text(src)
    lp = read_lp(p)
    assert lp.n == 3
    # constraint b: x1 - x2 <= 4 ; c: x3 >= 1 -> -x3 <= -1
    obj = _highs_obj(lp)
    # optimum: x3 at ub=10 (coef -1), x1=0, x2 >= 4 - x3 -> free to 0
    assert obj == pytest.approx(-10.0)


def test_lp_reversed_two_sided_bound(tmp_path):
    src = """min
 obj: x + y
 st
 c: x + y >= 3
 bounds
 8 >= x >= 2
end
"""
    p = tmp_path / "t3.lp"
    p.write_text(src)
    lp = read_lp(p)
    j = lp.col_names.index("x")
    assert lp.l[j] == 2.0 and lp.u[j] == 8.0
    assert _highs_obj(lp) == pytest.approx(3.0)


def test_lp_fixing_and_binary(tmp_path):
    src = """Minimize
 obj: x + y + w
Subject To
 c: x + y + w >= 2
Bounds
 y = 1.5
Binary
 w
End
"""
    p = tmp_path / "t4.lp"
    p.write_text(src)
    lp = read_lp(p)
    j = lp.col_names.index("y")
    assert lp.l[j] == lp.u[j] == 1.5
    k = lp.col_names.index("w")
    assert lp.l[k] == 0.0 and lp.u[k] == 1.0
    assert _highs_obj(lp) == pytest.approx(2.0)


def test_lp_unsupported_sections(tmp_path):
    p = tmp_path / "q.lp"
    p.write_text("min\n obj: x + [ x ^ 2 ] / 2\nst\n c: x >= 1\nend\n")
    with pytest.raises(LPFormatError):
        read_lp(p)
    p2 = tmp_path / "s.lp"
    p2.write_text("min\n x\nst\n c: x >= 1\nSOS\n s1: S1:: x:1\nend\n")
    with pytest.raises(LPFormatError):
        read_lp(p2)


def test_lp_roundtrip_random(rng, tmp_path):
    m, n = 6, 10
    A = rng.standard_normal((m, n))
    A[rng.random((m, n)) < 0.4] = 0.0
    lp = GeneralLP(
        A=A, b=rng.standard_normal(m), c=rng.standard_normal(n),
        l=np.where(rng.random(n) < 0.3, -np.inf, -1.0),
        u=np.where(rng.random(n) < 0.3, np.inf, 2.0),
        sense=np.where(rng.random(m) < 0.5, "=", "<"),
        name="rt", obj_offset=0.7)
    # ensure feasibility: set b = A x0 + slack for a bounded x0
    x0 = np.clip(rng.standard_normal(n), -1.0, 2.0)
    lp.b = A @ x0 + np.where(lp.sense == "<", 0.5, 0.0)
    p = tmp_path / "rt.lp"
    write_lp(lp, p)
    lp2 = read_lp(p)
    assert lp2.n == lp.n and lp2.m == lp.m
    assert _highs_obj(lp2) == pytest.approx(_highs_obj(lp), rel=1e-9)


def test_lp_gz_and_loader_dispatch(tmp_path):
    p = tmp_path / "g.lp.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(LP_SAMPLE)
    lp = read_lp(p)
    assert lp.n == 3
    lp2 = load_instance(p)
    assert lp2.n == 3
    p3 = tmp_path / "g.lp"
    p3.write_text(LP_SAMPLE)
    assert load_instance(p3).n == 3


def test_lp_solve_pipeline(tmp_path):
    """read .lp -> in-house solve_lp -> matches HiGHS."""
    p = tmp_path / "t.lp"
    p.write_text(LP_SAMPLE)
    lp = read_lp(p)
    out = solve_lp(lp, method="simplex")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(_highs_obj(lp), abs=1e-8)


# ---------------------------------------------------------------- MPS quirks

MPS_QUIRKY = """* classic fixed-format netlib quirks
NAME          QUIRK
ROWS
 N  COST
 L  LIM1      $ trailing dollar comment
 G  LIM2
COLUMNS
    X1        COST         1.0   LIM1         1.0  $ comment
    X1        LIM2         1.0
    X2        COST         2.0   LIM1         1.0
RHS
    LIM1      4.0   LIM2    1.0
$ a whole-line dollar comment
RANGES
BOUNDS
 UP X1           3.0
 MI BND       X2           0.0
ENDATA
"""


def test_mps_dollar_comments_and_omitted_set_names(tmp_path):
    p = tmp_path / "q.mps"
    p.write_text(MPS_QUIRKY)
    lp = read_mps(p)
    assert lp.n == 2
    # omitted RHS set name still parsed
    np.testing.assert_allclose(sorted(np.abs(lp.b)), [1.0, 4.0])
    # 'UP X1 3.0' without a bound-set name
    j = lp.col_names.index("X1")
    assert lp.u[j] == 3.0
    # 'MI BND X2 0.0' (value on a value-less type) frees the lower bound
    k = lp.col_names.index("X2")
    assert np.isneginf(lp.l[k])
    # '$ comment' trailing a COLUMNS line must not become a coefficient
    A = np.asarray(lp.A.todense())
    assert A.shape == (2, 2)
    assert np.all(np.isin(np.abs(A), [0.0, 1.0]))


def test_mps_objsense_continuation(tmp_path):
    mps = """OBJSENSE
    MAXIMIZE
ROWS
 N obj
 L r1
COLUMNS
    x obj 1.0 r1 1.0
RHS
    rhs r1 5.0
ENDATA
"""
    p = tmp_path / "o.mps"
    p.write_text(mps)
    lp = read_mps(p)
    # maximize x s.t. x <= 5 -> min -x, optimum -5
    assert _highs_obj(lp) == pytest.approx(-5.0)


def test_mps_objsense_next_section_not_swallowed(tmp_path):
    mps = """OBJSENSE
ROWS
 N obj
 L r1
COLUMNS
    x obj 1.0 r1 1.0
RHS
    rhs r1 5.0
ENDATA
"""
    p = tmp_path / "o2.mps"
    p.write_text(mps)
    lp = read_mps(p)
    assert lp.m == 1 and lp.n == 1   # ROWS section was not consumed


def test_cross_format_netlib_style_suite(tmp_path):
    """VERDICT item 7 acceptance: a small netlib-style suite written in
    BOTH formats (.mps via write_mps, .lp via write_lp), read back through
    the loaders, solved, objectives matching HiGHS on the original."""
    from smart_crossover_tpu.data.lp_gen import random_sparse_lp
    from smart_crossover_tpu.data.mps_write import write_mps

    for seed in range(4):
        lp = random_sparse_lp(m=20, n=60, density=0.15, seed=seed)
        want = _highs_obj(lp)
        p_mps = tmp_path / f"s{seed}.mps"
        p_lp = tmp_path / f"s{seed}.lp"
        write_mps(lp, p_mps)
        write_lp(lp, p_lp)
        lp_m = load_instance(p_mps)
        lp_l = load_instance(p_lp)
        assert lp_m.n == lp.n and lp_l.n == lp.n
        assert _highs_obj(lp_m) == pytest.approx(want, rel=1e-9, abs=1e-9)
        assert _highs_obj(lp_l) == pytest.approx(want, rel=1e-9, abs=1e-9)
        # and through the in-house solver, end to end
        out = solve_lp(lp_l, method="simplex")
        assert out.status == "OPTIMAL"
        assert out.obj_val == pytest.approx(want, abs=1e-7)


def test_lp_negative_upper_keeps_default_lower(tmp_path):
    """Regression (ADVICE r2): unlike MPS, the CPLEX/Gurobi LP format does
    NOT free the lower bound when an upper bound is negative — l stays at
    the default 0 (the model here is simply infeasible on x)."""
    src = """Minimize
 obj: x + y
Subject To
 c: x + y >= 1
Bounds
 x <= -5
End
"""
    p = tmp_path / "neg.lp"
    p.write_text(src)
    lp = read_lp(p)
    j = lp.col_names.index("x")
    assert lp.l[j] == 0.0                # NOT -inf
    assert lp.u[j] == -5.0
