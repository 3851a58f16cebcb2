"""Non-MCMC MME solving (engine/solve.py; solver.jl:7-54).

Covers: single-trait Jacobi/Gauss-Seidel/Gibbs agreement, the multi-trait
block assembly vs an explicit kron(R^-1, I_n) reference, and a >=10^4-level
multi-trait solve that would be infeasible with the materialized kron
((n t)^2 = 1.6e9 doubles at this size).
"""

import time

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import build_model, solve


def _sim_st(n=400, seed=0):
    rng = np.random.default_rng(seed)
    herd = rng.integers(0, 8, size=n)
    x1 = rng.normal(size=n)
    y = 2.0 + 0.5 * x1 + herd * 0.3 + rng.normal(size=n) * 0.6
    return pd.DataFrame({
        "ID": [f"i{i}" for i in range(n)],
        "y": y, "herd": [f"h{h}" for h in herd], "x1": x1,
    })


def test_solve_st_solvers_agree():
    df = _sim_st()
    from jwas_tpu import set_covariate

    def make():
        m = build_model("y = intercept + herd + x1", 1.0)
        set_covariate(m, "x1")
        return m

    sol_j = solve(make(), df, solver="Jacobi", maxiter=20000)
    sol_g = solve(make(), df, solver="Gauss-Seidel", maxiter=20000)
    names, W, LHS, RHS = solve(make(), df, solver="default")
    # intercept + herd dummies make the MME singular: solutions are not
    # unique, but FITTED VALUES are estimable and must agree
    x_direct = np.linalg.lstsq(LHS, RHS, rcond=None)[0]
    np.testing.assert_allclose(W @ sol_j["Estimate"], W @ x_direct,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(W @ sol_g["Estimate"], W @ x_direct,
                               rtol=1e-3, atol=1e-3)


def test_solve_mt_assembly_matches_kron():
    """The per-trait-block LHS/RHS equals the explicit kron(Ri, I_n) form."""
    rng = np.random.default_rng(3)
    n = 120
    herd = rng.integers(0, 5, size=n)
    y1 = 1.0 + herd * 0.4 + rng.normal(size=n)
    y2 = -0.5 + herd * 0.2 + rng.normal(size=n)
    df = pd.DataFrame({
        "ID": [f"i{i}" for i in range(n)],
        "y1": y1, "y2": y2, "herd": [f"h{h}" for h in herd],
    })
    R = np.array([[1.0, 0.3], [0.3, 0.8]])
    model = build_model("y1 = intercept + herd\ny2 = intercept + herd", R)
    names, W, LHS, RHS = solve(model, df, solver="default")
    Ri_full = np.kron(np.linalg.inv(R), np.eye(n))
    np.testing.assert_allclose(LHS, W.T @ Ri_full @ W, rtol=1e-8, atol=1e-8)
    y_stack = np.concatenate([y1, y2])
    np.testing.assert_allclose(RHS, W.T @ Ri_full @ y_stack,
                               rtol=1e-8, atol=1e-8)


def test_solve_mt_large_levels():
    """10,002 location parameters, 2 traits: assembly + Gauss-Seidel complete
    without the (n t)^2 kron (which would be ~13 GB here)."""
    rng = np.random.default_rng(7)
    n, n_herd = 20_000, 5_000
    herd = rng.integers(0, n_herd, size=n)
    eff = rng.normal(size=n_herd)
    y1 = 1.0 + eff[herd] + rng.normal(size=n) * 0.5
    y2 = -1.0 + 0.5 * eff[herd] + rng.normal(size=n) * 0.5
    df = pd.DataFrame({
        "ID": [f"i{i}" for i in range(n)],
        "y1": y1, "y2": y2, "herd": [f"h{h}" for h in herd],
    })
    R = np.array([[1.0, 0.2], [0.2, 1.0]])
    model = build_model("y1 = intercept + herd\ny2 = intercept + herd", R)
    t0 = time.time()
    sol = solve(model, df, solver="Gauss-Seidel", maxiter=200,
                tolerance=1e-8)
    observed = np.unique(herd)
    assert len(sol) == 2 * (1 + len(observed))
    # herd-effect contrasts are estimable: they must track the simulated
    # effects (shifted by the confounded intercept)
    lookup = dict(zip(sol["Name"], sol["Estimate"]))
    est = np.array([lookup[f"y1:herd:h{h}"] for h in observed])
    corr = np.corrcoef(est, eff[observed])[0, 1]
    assert corr > 0.95, corr
    assert time.time() - t0 < 300


def test_solve_cg_works_on_both_dense_and_sparse_paths():
    """solver='CG' must behave identically on either side of the
    auto-sparse threshold (review finding: it existed only sparse-side)."""
    import numpy as np
    import pandas as pd

    from jwas_tpu import build_model, get_pedigree, set_random, solve

    rng = np.random.default_rng(8)
    n = 150
    ids = [f"g{i}" for i in range(n)]
    sire = ["missing" if i < 5 else ids[int(rng.integers(0, i))]
            for i in range(n)]
    dam = ["missing" if i < 5 else ids[int(rng.integers(0, i))]
           for i in range(n)]
    ped = get_pedigree(pd.DataFrame({"ID": ids, "S": sire, "D": dam}))
    y = 1.5 + rng.normal(size=n)
    df = pd.DataFrame({"ID": ids, "y": y})

    def model():
        m = build_model("y = intercept + ID")
        set_random(m, "ID", ped, np.array(1.0))
        return m

    dense = solve(model(), df, solver="CG", maxiter=500, tolerance=1e-12,
                  sparse_location=False)
    sparse = solve(model(), df, solver="CG", maxiter=500, tolerance=1e-12,
                   sparse_location=True)
    np.testing.assert_allclose(dense["Estimate"].to_numpy(),
                               sparse["Estimate"].to_numpy(),
                               rtol=1e-4, atol=1e-5)
