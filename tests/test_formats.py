import numpy as np
import pytest
import scipy.sparse as sp

from smart_crossover_tpu.models import (
    Basis,
    GeneralLP,
    MinCostFlow,
    OptTransport,
    StandardLP,
)


def test_general_lp_standardization():
    A = np.array([[1.0, 2.0], [3.0, 4.0]])
    lp = GeneralLP(A=A, b=np.array([1.0, 2.0]), c=np.array([1.0, 1.0]),
                   l=np.zeros(2), u=np.array([np.inf, np.inf]),
                   sense=np.array(["=", "<"]))
    A_std = lp.get_standard_A().toarray()
    assert A_std.shape == (2, 3)
    np.testing.assert_allclose(A_std[:, 2], [0.0, 1.0])
    np.testing.assert_allclose(lp.get_standard_c(), [1.0, 1.0, 0.0])
    x = np.array([0.1, 0.2])
    xs = lp.get_standard_x(x)
    # slack = b_< - A_< x = 2 - (3*0.1 + 4*0.2)
    np.testing.assert_allclose(xs, [0.1, 0.2, 2 - 1.1])
    # standard form consistency: A_std @ xs == b on '<' rows
    np.testing.assert_allclose(A_std @ xs, [0.5, 2.0])


def test_general_lp_free_indices_and_slacks():
    A = sp.csr_matrix(np.array([[1.0, -1.0, 2.0]]))
    lp = GeneralLP(A=A, b=np.array([1.0]), c=np.array([1.0, 2.0, 3.0]),
                   l=np.array([-np.inf, 0.0, -np.inf]),
                   u=np.array([np.inf, np.inf, np.inf]),
                   sense=np.array(["<"]))
    np.testing.assert_array_equal(lp.get_free_ind(), [0, 2])
    np.testing.assert_array_equal(lp.get_nonfree_ind(), [1, 3])
    y = np.array([2.0])
    np.testing.assert_allclose(lp.get_dual_slack(y), [1 - 2, 2 + 2, 3 - 4])
    x = np.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(lp.get_primal_slack(x), [1 - 2.0])


def test_general_lp_rejects_bad_sense():
    with pytest.raises(ValueError):
        GeneralLP(A=np.eye(1), b=np.zeros(1), c=np.zeros(1), l=np.zeros(1),
                  u=np.ones(1), sense=np.array([">"]))


def test_mcf_incidence_roundtrip():
    tails = np.array([0, 0, 1, 2])
    heads = np.array([1, 2, 2, 0])
    mcf = MinCostFlow(tails=tails, heads=heads, c=np.ones(4), u=np.full(4, 5.0),
                      b=np.array([-1.0, 0.5, 0.5]))
    A = mcf.A.toarray()
    assert A.shape == (3, 4)
    # column j: +1 at head, -1 at tail
    np.testing.assert_allclose(A[:, 0], [-1, 1, 0])
    mcf2 = MinCostFlow.from_incidence(mcf.A, mcf.b, mcf.c, mcf.u)
    np.testing.assert_array_equal(mcf2.tails, tails)
    np.testing.assert_array_equal(mcf2.heads, heads)


def test_mcf_rejects_unbalanced():
    with pytest.raises(ValueError):
        MinCostFlow(tails=[0], heads=[1], c=[1.0], u=[1.0], b=[1.0, 1.0])


def test_ot_to_mcf_matches_reference_structure(small_ot):
    mcf = small_ot.to_MCF()
    ns, nd = small_ot.s.size, small_ot.d.size
    assert mcf.n == ns * nd and mcf.m == ns + nd
    np.testing.assert_allclose(mcf.b, np.concatenate([-small_ot.s, small_ot.d]))
    np.testing.assert_allclose(mcf.c, small_ot.M.ravel())
    # incidence: arc (i, j) leaves supplier i, enters demander ns + j
    A = mcf.A.toarray()
    for idx in [0, nd - 1, ns * nd - 1]:
        i, j = idx // nd, idx % nd
        assert A[i, idx] == -1 and A[ns + j, idx] == 1
    # A x = b for a feasible plan
    X = np.outer(small_ot.s, small_ot.d) / small_ot.s.sum()
    np.testing.assert_allclose(A @ X.ravel(), mcf.b, atol=1e-12)


def test_ot_rejects_mass_mismatch():
    with pytest.raises(ValueError):
        OptTransport(s=[1.0], d=[2.0], M=[[1.0]])


def test_basis_int_cast_and_output_str():
    b = Basis(np.array([0.0, -1.0]), np.array([-1.0]))
    assert b.vbasis.dtype == np.int32
    from smart_crossover_tpu.models import Output

    out = Output(obj_val=1.5, status="OPTIMAL")
    assert "OPTIMAL" in str(out)


def test_standard_lp_defaults():
    lp = StandardLP(A=np.eye(2), b=np.ones(2), c=np.ones(2), u=np.full(2, 2.0))
    np.testing.assert_allclose(lp.l, np.zeros(2))
    g = lp.to_general()
    assert np.all(g.sense == "=")
