"""End-to-end runMCMC tests on simulated data with known truth.

Mirrors the reference integration-test pattern (test/integration/
test_simulated_omics.jl:31-70): short chains for every method, asserting
EBV-vs-true-breeding-value correlation above a floor, plus reproducibility
(same seed -> identical results, runtests.jl:302-320).
"""

import numpy as np
import pytest

from jwas_tpu import build_model, get_genotypes, runMCMC, set_covariate
from jwas_tpu.io.datasets import simulate_genomic_data

SIM = simulate_genomic_data(n=400, p=300, n_qtl=20, h2=0.5, seed=11)


def _run(method, chain_length=600, fast_blocks=False, nreps=None, **kw):
    geno = get_genotypes(SIM["genotypes"], method=method, name="geno", **kw)
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(
        model,
        SIM["phenotypes"],
        chain_length=chain_length,
        burnin=chain_length // 5,
        output_samples_frequency=max(1, chain_length // 100),
        seed=314,
        fast_blocks=fast_blocks,
        nreps=nreps,
        output_folder="",
    )
    return out


def _ebv_accuracy(out):
    ebv = out["EBV_y"].set_index("ID")["EBV"]
    ids = [f"ind{i+1}" for i in range(len(SIM["true_bv"]))]
    return np.corrcoef(ebv.loc[ids].to_numpy(), SIM["true_bv"])[0, 1]


@pytest.mark.parametrize("method", ["RR-BLUP", "BayesC", "BayesB", "BayesA", "BayesL", "BayesR"])
def test_methods_recover_breeding_values(method):
    out = _run(method)
    acc = _ebv_accuracy(out)
    assert acc > 0.55, f"{method}: EBV accuracy {acc:.3f}"
    vare = out["residual variance"]["Estimate"].iloc[0]
    assert 0.1 < vare < 100.0


def test_gblup_recovers_breeding_values():
    out = _run("GBLUP", chain_length=400)
    acc = _ebv_accuracy(out)
    assert acc > 0.5, f"GBLUP: EBV accuracy {acc:.3f}"
    h2 = out["heritability"]["Estimate"].iloc[0]
    assert 0.2 < h2 < 0.8


def test_fast_blocks_matches_plain_bayesc():
    out_plain = _run("BayesC", chain_length=800)
    # nreps=4: 200 outer iterations, each worth 4 effective sweeps, so the
    # posterior-mean MC error is comparable to the plain chain's.
    out_block = _run("BayesC", chain_length=3200, fast_blocks=32, nreps=4)
    acc_b = _ebv_accuracy(out_block)
    assert acc_b > 0.55, acc_b
    e1 = out_plain["EBV_y"]["EBV"].to_numpy()
    e2 = out_block["EBV_y"]["EBV"].to_numpy()
    assert np.corrcoef(e1, e2)[0, 1] > 0.9


def test_seed_reproducibility():
    out1 = _run("BayesC", chain_length=100)
    out2 = _run("BayesC", chain_length=100)
    np.testing.assert_array_equal(
        out1["EBV_y"]["EBV"].to_numpy(), out2["EBV_y"]["EBV"].to_numpy()
    )
    np.testing.assert_array_equal(
        out1["marker effects geno"]["Estimate"].to_numpy(),
        out2["marker effects geno"]["Estimate"].to_numpy(),
    )


def test_pi_estimation_sparsity():
    """With few QTL, BayesC pi (P(excluded)) should be high."""
    out = _run("BayesC", chain_length=800)
    pi = out["pi_geno"]["Estimate"].iloc[0]
    assert pi > 0.5, pi


def test_fixed_effects_and_covariates():
    rng = np.random.default_rng(0)
    pheno = SIM["phenotypes"].copy()
    sex = rng.integers(0, 2, len(pheno))
    age = rng.uniform(1, 5, len(pheno))
    pheno["sex"] = np.where(sex == 1, "m", "f")
    pheno["age"] = age
    pheno["y"] = pheno["y"] + 3.0 * (sex == 1) + 1.5 * age
    geno = get_genotypes(SIM["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + sex + age + geno", genotypes=geno)
    set_covariate(model, "age")
    out = runMCMC(model, pheno, chain_length=600, burnin=100, seed=7, output_folder="")
    loc = out["location parameters"].set_index("Level")
    age_est = float(loc.loc["age", "Estimate"])
    assert abs(age_est - 1.5) < 0.5
    sex_m = float(loc.loc["m", "Estimate"])
    sex_f = float(loc.loc["f", "Estimate"])
    assert abs((sex_m - sex_f) - 3.0) < 1.0
    acc = _ebv_accuracy(out)
    assert acc > 0.5


def test_update_priors_frequency():
    """Empirical-Bayes prior refresh (MCMC_BayesianAlphabet.jl:381-395):
    the chain still mixes and recovers breeding values with priors being
    re-centered on running posterior means during sampling."""
    geno = get_genotypes(SIM["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(
        model,
        SIM["phenotypes"],
        chain_length=600,
        burnin=100,
        output_samples_frequency=10,
        seed=314,
        update_priors_frequency=100,
        output_folder="",
    )
    acc = _ebv_accuracy(out)
    assert acc > 0.55, f"update_priors: EBV accuracy {acc:.3f}"
    vare = out["residual variance"]["Estimate"].iloc[0]
    assert 0.1 < vare < 100.0
