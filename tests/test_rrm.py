"""Random-regression-model (longitudinal trait) tests.

Mirrors the reference RRM behavior (reference: src/1.JWAS/src/RRM/): Legendre
basis construction, the per-marker joint coefficient update, and recovery of
simulated breeding-value trajectories from long-format data.
"""

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import build_model, get_genotypes, runMCMC, set_covariate  # noqa: F401
from jwas_tpu.ops.rrm import generate_full_phi, build_m_phiphi


def test_generate_full_phi_matches_legendre():
    times = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    phi = generate_full_phi(times, ncoeff=3)
    q = 2 * (times - 1) / 4 - 1
    np.testing.assert_allclose(phi[:, 0], np.sqrt(1 / 2) * np.ones(5), atol=1e-12)
    np.testing.assert_allclose(phi[:, 1], np.sqrt(3 / 2) * q, atol=1e-12)
    np.testing.assert_allclose(
        phi[:, 2], np.sqrt(5 / 2) * 0.5 * (3 * q**2 - 1), atol=1e-12
    )


def test_m_phiphi_bruteforce():
    rng = np.random.default_rng(0)
    nind, p, ntimes, c = 7, 5, 4, 3
    X = rng.normal(size=(nind, p))
    phi = rng.normal(size=(ntimes, c))
    mask = (rng.uniform(size=(ntimes, nind)) < 0.7).astype(float)
    out = build_m_phiphi(X, phi, mask)
    for j in range(p):
        expect = np.zeros((c, c))
        for i in range(nind):
            for t in range(ntimes):
                if mask[t, i]:
                    expect += X[i, j] ** 2 * np.outer(phi[t], phi[t])
        np.testing.assert_allclose(out[j], expect, atol=1e-10)


def _rrm_sim(seed=3, nind=250, p=100, ntimes=5, c=2, miss=0.15):
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.1, 0.9, p)
    X = rng.binomial(2, freqs[None, :], size=(nind, p)).astype(float)
    Xc = X - X.mean(axis=0)
    times = np.arange(1.0, ntimes + 1)
    phi = generate_full_phi(times, ncoeff=c)
    effects = np.zeros((c, p))
    qtl = rng.choice(p, 10, replace=False)
    effects[:, qtl] = rng.normal(0, 1.0, (c, 10))
    U = phi @ (effects @ Xc.T)                    # (ntimes, nind)
    sig = U.std()
    rows = []
    ids = [f"i{k}" for k in range(nind)]
    for ti, tval in enumerate(times):
        for ik, s in enumerate(ids):
            if rng.uniform() < miss:
                continue
            rows.append(
                (s, tval, 1.0 + 0.3 * tval + U[ti, ik] + rng.normal(0, sig))
            )
    df = pd.DataFrame(rows, columns=["ID", "time", "y"])
    geno = pd.DataFrame(X, columns=[f"m{j}" for j in range(p)])
    geno.insert(0, "ID", ids)
    return df, geno, U, ids, times, phi


def test_rrm_trajectory_recovery():
    df, geno_df, U, ids, times, phi = _rrm_sim()
    geno = get_genotypes(geno_df, method="BayesC", name="geno")
    model = build_model("y = intercept + time + geno", genotypes=geno)
    out = runMCMC(model, df, chain_length=600, burnin=150, seed=9,
                  RRM=phi, output_folder="")
    traj = out["EBV_trajectory"]
    est = traj.set_index(["ID", "time"])["EBV"]
    truth, got = [], []
    for ti, tval in enumerate(times):
        for ik, s in enumerate(ids):
            truth.append(U[ti, ik])
            got.append(est.loc[(s, tval)])
    acc = np.corrcoef(truth, got)[0, 1]
    assert acc > 0.55, f"RRM trajectory accuracy {acc:.3f}"
    assert set(out["marker effects geno"]["Trait"]) == {"1", "2"}


def test_rrm_validation():
    df, geno_df, U, ids, times, phi = _rrm_sim(nind=30, p=20, seed=5)
    geno = get_genotypes(geno_df, method="BayesC", name="geno")
    model = build_model("y = intercept + time + geno", genotypes=geno)
    with pytest.raises(ValueError, match="unique times"):
        runMCMC(model, df, chain_length=5, RRM=phi[:3], output_folder="")
