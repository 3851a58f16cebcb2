"""Categorical / binary / censored (threshold-model) trait tests.

Mirrors the reference tests for latent-variable traits (reference:
test/unit/test_categorical_censored.jl pattern: short real chains on
simulated liability data, asserting EBV accuracy and the fixed-parameter
constraints — vare=1 for single-trait categorical, R_bb=1 for binary traits
in multi-trait models via the Korsgaard conditional inverse-Wishart).
"""

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import build_model, get_genotypes, runMCMC
from jwas_tpu.io.datasets import simulate_genomic_data


def _liability_sim(seed=5, n=400, p=200):
    sim = simulate_genomic_data(n=n, p=p, n_qtl=20, h2=0.6, seed=seed)
    return sim


def _accuracy(out, sim, trait="y"):
    ebv = out[f"EBV_{trait}"].set_index("ID")["EBV"]
    ids = [f"ind{i+1}" for i in range(len(sim["true_bv"]))]
    return np.corrcoef(ebv.loc[ids].to_numpy(), sim["true_bv"])[0, 1]


def test_single_trait_binary():
    sim = _liability_sim()
    df = sim["phenotypes"].copy()
    liab = df["y"].to_numpy()
    df["y"] = np.where(liab > np.median(liab), 2, 1)

    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno,
                        categorical_trait=["y"])
    out = runMCMC(model, df, chain_length=800, burnin=160, seed=7,
                  output_folder="")
    acc = _accuracy(out, sim)
    assert acc > 0.45, f"binary-trait EBV accuracy {acc:.3f}"
    # residual variance fixed at 1 for single-trait categorical
    assert out["residual variance"]["Estimate"].iloc[0] == pytest.approx(1.0)


def test_single_trait_ordered_categorical():
    sim = _liability_sim(seed=6)
    df = sim["phenotypes"].copy()
    liab = df["y"].to_numpy()
    qs = np.quantile(liab, [0.3, 0.6, 0.85])
    df["y"] = 1 + np.searchsorted(qs, liab)

    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno,
                        categorical_trait=["y"])
    out = runMCMC(model, df, chain_length=800, burnin=160, seed=8,
                  output_folder="")
    acc = _accuracy(out, sim)
    assert acc > 0.45, f"4-category EBV accuracy {acc:.3f}"


def test_single_trait_censored():
    sim = _liability_sim(seed=9)
    df = sim["phenotypes"].copy()
    y = df["y"].to_numpy()
    # right-censor the top 40%: only a lower bound is observed
    cut = np.quantile(y, 0.6)
    lower = np.where(y > cut, cut, y)
    upper = np.where(y > cut, np.inf, y)
    df = df.drop(columns=["y"])
    df["y_l"] = lower
    df["y_u"] = upper

    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno,
                        censored_trait=["y"])
    out = runMCMC(model, df, chain_length=600, burnin=120, seed=10,
                  output_folder="")
    acc = _accuracy(out, sim)
    assert acc > 0.5, f"censored EBV accuracy {acc:.3f}"


def test_multi_trait_binary_plus_continuous():
    sim = _liability_sim(seed=12)
    rng = np.random.default_rng(3)
    df = sim["phenotypes"].copy()
    bv = sim["true_bv"]
    liab2 = 0.8 * bv / bv.std() + rng.normal(size=len(bv))
    df["y2"] = np.where(liab2 > 0, 2, 1)

    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno, categorical_trait=["y2"])
    out = runMCMC(model, df, chain_length=600, burnin=120, seed=13,
                  output_folder="")
    acc1 = _accuracy(out, sim, "y")
    acc2 = _accuracy(out, sim, "y2")
    assert acc1 > 0.5, f"continuous-trait accuracy {acc1:.3f}"
    assert acc2 > 0.35, f"binary-trait accuracy {acc2:.3f}"
    # Korsgaard conditional IW pins the binary trait's residual variance at 1
    R = out["residual variance"]
    r22 = R[(R["Covariance"] == "y2_y2")]["Estimate"].iloc[0]
    assert r22 == pytest.approx(1.0, abs=1e-5)
