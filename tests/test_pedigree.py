"""Pedigree engine tests: topological coding, inbreeding, A-inverse.

Mirrors the reference's pedigree algorithm tests (test/unit/
test_pedigree_algorithms.jl pattern): verify against hand-computable examples
and the identity A_inverse @ A == I.
"""

import numpy as np
import pandas as pd

from jwas_tpu import get_pedigree


def _mrode_pedigree():
    # Classic example (Mrode, ch.2): 6 animals.
    return pd.DataFrame(
        {
            "id": ["3", "4", "5", "6", "1", "2"],
            "sire": ["1", "1", "4", "5", "0", "0"],
            "dam": ["2", "0", "3", "2", "0", "0"],
        }
    )


def test_topological_order():
    ped = get_pedigree(_mrode_pedigree())
    idx = ped.id_index
    for i, (s, d) in enumerate(zip(ped.sire, ped.dam)):
        if s >= 0:
            assert s < i
        if d >= 0:
            assert d < i
    assert len(ped) == 6
    assert set(ped.ids) == {"1", "2", "3", "4", "5", "6"}
    del idx


def test_inbreeding_mrode():
    ped = get_pedigree(_mrode_pedigree())
    f = {ped.ids[i]: ped.inbreeding[i] for i in range(len(ped))}
    # Known coefficients for this pedigree (Mrode 2nd ed., example 2.1)
    assert np.isclose(f["1"], 0.0)
    assert np.isclose(f["2"], 0.0)
    assert np.isclose(f["3"], 0.0)
    assert np.isclose(f["4"], 0.0)
    assert np.isclose(f["5"], 0.125)
    assert np.isclose(f["6"], 0.125)


def test_a_inverse_is_inverse_of_a():
    ped = get_pedigree(_mrode_pedigree())
    A = ped.a_matrix()
    Ai = ped.a_inverse().toarray()
    np.testing.assert_allclose(Ai @ A, np.eye(len(ped)), atol=1e-8)


def test_a_inverse_larger_random_pedigree():
    rng = np.random.default_rng(3)
    n = 200
    rows = []
    for i in range(n):
        if i < 20:
            rows.append((f"a{i}", "0", "0"))
        else:
            s = rng.integers(0, i)
            d = rng.integers(0, i)
            rows.append((f"a{i}", f"a{s}", f"a{d}" if d != s else "0"))
    df = pd.DataFrame(rows, columns=["id", "sire", "dam"])
    ped = get_pedigree(df)
    A = ped.a_matrix()
    Ai = ped.a_inverse().toarray()
    np.testing.assert_allclose(Ai @ A, np.eye(n), atol=1e-6)
    # inbreeding must equal diag(A) - 1
    np.testing.assert_allclose(ped.inbreeding, np.diag(A) - 1.0, atol=1e-10)


def test_parents_only_in_columns_get_founder_entries():
    df = pd.DataFrame({"id": ["c"], "sire": ["a"], "dam": ["b"]})
    ped = get_pedigree(df)
    assert set(ped.ids) == {"a", "b", "c"}
    assert ped.inbreeding[ped.id_index["c"]] == 0.0


def test_native_inbreeding_matches_python():
    """The C++ Meuwissen-Luo kernel (native/pedigree.cpp) is bit-equivalent
    to the pure-Python oracle on a deep random pedigree with inbreeding."""
    import numpy as np
    import pandas as pd

    from jwas_tpu.io import pedigree as pmod

    rng = np.random.default_rng(11)
    n = 800
    ids = [f"z{i}" for i in range(n)]
    sire = ["missing" if i < 4 else ids[int(rng.integers(0, i))]
            for i in range(n)]
    dam = ["missing" if i < 4 else ids[int(rng.integers(0, i))]
           for i in range(n)]
    # the kernel must actually BUILD: a compile failure silently falls
    # back to Python, which would make this test vacuous (and round-5
    # nearly shipped a size_t-scope compile error exactly that way)
    assert pmod._native_ped_lib() is not None, (
        "native/pedigree.cpp failed to compile"
    )
    ped = pmod.get_pedigree(pd.DataFrame({"ID": ids, "S": sire, "D": dam}))
    F_py = pmod._inbreeding_meuwissen_luo_py(ped.sire, ped.dam)
    assert F_py.max() > 0.05       # actually exercises inbreeding paths
    np.testing.assert_allclose(ped.inbreeding, F_py, atol=1e-12)
    # A-inverse from the factored form agrees with the dense tabular A
    Ai = ped.a_inverse()
    A = ped.a_matrix()
    np.testing.assert_allclose(
        np.asarray(Ai.todense()) @ A, np.eye(n), atol=1e-6
    )


def test_native_inbreeding_eps_truncation_bound():
    """inbreeding_tolerance truncates ancestor walks with a bounded effect:
    at 1e-8 the result is numerically identical to exact."""
    import numpy as np
    import pandas as pd

    from jwas_tpu.io import pedigree as pmod

    rng = np.random.default_rng(2)
    n = 1500
    ids = [f"t{i}" for i in range(n)]
    sire = ["missing" if i < 30 else ids[int(rng.integers(max(i - 60, 0), i))]
            for i in range(n)]
    dam = ["missing" if i < 30 else ids[int(rng.integers(max(i - 60, 0), i))]
           for i in range(n)]
    df = pd.DataFrame({"ID": ids, "S": sire, "D": dam})
    exact = pmod.get_pedigree(df)
    trunc = pmod.get_pedigree(df, inbreeding_tolerance=1e-8)
    np.testing.assert_allclose(trunc.inbreeding, exact.inbreeding, atol=1e-6)
    assert exact.inbreeding.max() > 0.05
