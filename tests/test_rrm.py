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


def test_rrm_with_iid_random_effect():
    """RRM driver fits declared random effects in the lambda-MME
    (MCMC_BayesianAlphabet_RRM.jl:41,106,159): an i.i.d. permanent-environment
    effect per individual is recovered alongside the marker trajectory."""
    from jwas_tpu import set_random

    rng = np.random.default_rng(11)
    df, geno_df, U, ids, times, phi = _rrm_sim(seed=11, nind=200, p=80, c=2)
    # inject a per-individual permanent environmental effect
    pe = rng.normal(0, 0.8 * U.std(), size=len(ids))
    pe_of = {s: v for s, v in zip(ids, pe)}
    df = df.copy()
    df["y"] = df["y"] + df["ID"].map(pe_of)

    geno = get_genotypes(geno_df, method="BayesC", name="geno")
    model = build_model("y = intercept + time + ID + geno", genotypes=geno)
    set_covariate(model, "time")
    set_random(model, "ID", float(0.64 * U.std() ** 2))
    out = runMCMC(model, df, chain_length=400, burnin=80,
                  output_samples_frequency=5, seed=2, RRM=phi,
                  output_folder="")

    key = "random effect variances y:ID"
    assert key in out
    pe_var = float(out[key]["Estimate"].iloc[0])
    true_var = float(np.var(pe))
    assert 0.25 * true_var < pe_var < 4.0 * true_var

    # trajectory EBVs still track the simulated U
    traj = out["EBV_trajectory"]
    acc = []
    for ti, tval in enumerate(times):
        sub = traj[traj["time"] == tval].set_index("ID")["EBV"]
        acc.append(np.corrcoef(sub.loc[ids].to_numpy(), U[ti])[0, 1])
    assert np.mean(acc) > 0.4, acc

    # the ID solutions correlate with the injected effects
    loc = out["location parameters"]
    sol_id = loc[(loc["Effect"] == "ID")].set_index("Level")["Estimate"]
    acc_pe = np.corrcoef(sol_id.loc[ids].to_numpy(), pe)[0, 1]
    assert acc_pe > 0.4, acc_pe


def test_rrm_with_pedigree_polygenic_effect():
    """RRM with a pedigree-based polygenic term (Vinv = A-inverse)."""
    from jwas_tpu import get_pedigree, set_random
    from jwas_tpu.io.datasets import simulate_pedigree_genomic_data

    fam = simulate_pedigree_genomic_data(n_founders=30, n_gen=2, n_per_gen=60,
                                         p=60, n_qtl=8, h2=0.5, seed=4)
    ped = get_pedigree(fam["pedigree"])
    ids = [str(s) for s in fam["genotypes"]["ID"]]
    rng = np.random.default_rng(4)
    times = np.arange(1.0, 5.0)
    phi = generate_full_phi(times, ncoeff=2)
    rows = []
    bv = dict(zip(ids, np.asarray(fam["true_bv"], dtype=float)))
    for tval in times:
        for s in ids:
            rows.append((s, tval, 1.0 + bv[s] + rng.normal(0, 1.0)))
    df = pd.DataFrame(rows, columns=["ID", "time", "y"])

    geno = get_genotypes(fam["genotypes"], method="RR-BLUP", name="geno")
    model = build_model("y = intercept + ID + geno", genotypes=geno)
    set_random(model, "ID", ped)
    out = runMCMC(model, df, chain_length=200, burnin=40,
                  output_samples_frequency=5, seed=5, RRM=phi,
                  output_folder="")
    assert "polygenic effects covariance matrix" in out
    assert float(out["polygenic effects covariance matrix"]["Estimate"].iloc[0]) > 0


def test_rrm_sample_files_progress_checkpoint(tmp_path, capsys):
    """RRM now shares the unified output subsystem: the per-parameter sample
    files the reference RRM driver writes (MCMC_BayesianAlphabet_RRM.jl:99,
    201), console progress, and resumable checkpoints."""
    df, geno_df, U, ids, times, phi = _rrm_sim(nind=120, p=40, seed=7)
    geno = get_genotypes(geno_df, method="BayesC", name="geno")
    model = build_model("y = intercept + time + geno", genotypes=geno)
    from jwas_tpu import outputMCMCsamples

    outputMCMCsamples(model, "time")
    folder = str(tmp_path / "rrm_out")
    out = runMCMC(model, df, chain_length=200, burnin=40, seed=9, RRM=phi,
                  output_folder=folder, output_samples_frequency=10,
                  printout_frequency=50, checkpoint_frequency=100)
    assert "iteration" in capsys.readouterr().out
    import os

    n_saved = (200 - 40) // 10
    # residual variance: 1 header + n_saved rows
    rv = open(os.path.join(folder, "MCMC_samples_residual_variance.txt")).read().splitlines()
    assert len(rv) == 1 + n_saved
    # per-coefficient marker-effect files with marker-ID headers
    for cname in ("coeff1", "coeff2"):
        f = os.path.join(folder, f"MCMC_samples_marker_effects_geno_{cname}.txt")
        lines = open(f).read().splitlines()
        assert lines[0].split(",")[0] == "m0"
        assert len(lines) == 1 + n_saved
        assert len(lines[1].split(",")) == 40
    # c x c marker-variance rows + location-parameter file
    mv = open(os.path.join(folder, "MCMC_samples_marker_effects_variances_geno.txt")).read().splitlines()
    assert len(mv[1].split(",")) == 4          # (2,2) flattened
    loc = open(os.path.join(folder, "MCMC_samples_y.time.txt")).read().splitlines()
    assert len(loc) == 1 + n_saved
    # checkpoints were written and resume continues without error
    ck = os.path.join(folder, "checkpoint")
    assert os.path.isdir(ck) and len(os.listdir(ck)) >= 1
    geno_r = get_genotypes(geno_df, method="BayesC", name="geno")
    model_r = build_model("y = intercept + time + geno", genotypes=geno_r)
    out2 = runMCMC(model_r, df, chain_length=200, burnin=40, seed=9, RRM=phi,
                   output_folder=folder, output_samples_frequency=10,
                   resume=True)
    assert np.isfinite(out2["EBV_trajectory"].EBV).all()
