"""Integration tests on the simulated_omics dataset analogue.

Mirrors the reference integration suite (reference:
test/integration/test_simulated_omics.jl): 3,534 genotyped animals, 1,000
SNPs, 6,473 pedigree animals, known true genetic values. Every Bayesian
method runs a short real chain and must clear an EBV-vs-truth accuracy floor.

Gated by RUN_INTEGRATION_TESTS=true (reference runtests.jl:54), since each
method runs a full 500-iteration chain on n=3,534 x p=1,000.
"""

import os

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import GWAS, build_model, get_genotypes, get_pedigree, runMCMC, set_random
from jwas_tpu.io.datasets import dataset

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_INTEGRATION_TESTS", "").lower() != "true",
    reason="set RUN_INTEGRATION_TESTS=true to run integration tests",
)

CHAIN = dict(chain_length=500, burnin=100, output_samples_frequency=50)


@pytest.fixture(scope="module")
def omics():
    pheno = pd.read_csv(dataset("phenotypes.txt", dataset_name="simulated_omics"))
    pheno["ID"] = pheno["ID"].astype(str)
    pheno["group"] = pheno["group"].astype(str)
    pheno["litter"] = pheno["litter"].astype(str)
    genofile = dataset("genotypes_1000snps.txt", dataset_name="simulated_omics")
    pedfile = dataset("pedigree.txt", dataset_name="simulated_omics")
    return pheno, genofile, pedfile


def _accuracy(out, pheno, trait="trait1"):
    res = out[f"EBV_{trait}"].copy()
    res["ID"] = res["ID"].astype(str)
    merged = res.merge(pheno[["ID", "genetic_total"]], on="ID")
    return np.corrcoef(merged["EBV"], merged["genetic_total"])[0, 1]


@pytest.mark.parametrize(
    "method", ["BayesA", "BayesB", "BayesC", "RR-BLUP", "BayesL", "GBLUP"]
)
def test_single_trait_methods(omics, method, tmp_path):
    pheno, genofile, _ = omics
    estimate_pi = method in ("BayesC", "BayesB")
    geno = get_genotypes(genofile, 1.0, separator=",", method=method,
                         estimatePi=estimate_pi, name="geno")
    model = build_model("trait1 = intercept + geno", 1.0, genotypes=geno)
    out = runMCMC(model, pheno, seed=314,
                  output_folder=str(tmp_path / f"st_{method}"), **CHAIN)

    assert "location parameters" in out
    assert out["residual variance"].iloc[0]["Estimate"] > 0.0
    acc = _accuracy(out, pheno)
    print(f"  {method} accuracy vs genetic_total: {acc:.3f}")
    assert acc > 0.1


@pytest.mark.parametrize("method", ["BayesC", "RR-BLUP", "BayesA"])
def test_single_step(omics, method, tmp_path):
    pheno, genofile, pedfile = omics
    ped_df = pd.read_csv(pedfile)
    geno_ids = set(pheno["ID"])
    non_geno = [str(i) for i in ped_df["ID"].astype(str) if str(i) not in geno_ids]
    rng = np.random.default_rng(42)
    extra = pd.DataFrame({"ID": non_geno[:500],
                          "trait1": rng.normal(size=500),
                          "genetic_total": np.zeros(500)})
    pheno_ss = pd.concat(
        [pheno[["ID", "trait1", "genetic_total"]], extra], ignore_index=True
    )
    ped = get_pedigree(pedfile, separator=",", header=True)
    geno = get_genotypes(genofile, 1.0, separator=",", method=method,
                         estimatePi=method == "BayesC", name="geno")
    model = build_model("trait1 = intercept + geno", 1.0, genotypes=geno)
    out = runMCMC(model, pheno_ss, seed=314, single_step_analysis=True,
                  pedigree=ped, output_folder=str(tmp_path / f"ss_{method}"),
                  **CHAIN)
    assert out["residual variance"].iloc[0]["Estimate"] > 0.0
    res = out["EBV_trait1"].copy()
    res["ID"] = res["ID"].astype(str)
    merged = res.merge(pheno[["ID", "genetic_total"]], on="ID")
    acc = np.corrcoef(merged["EBV"], merged["genetic_total"])[0, 1]
    print(f"  SS-{method} accuracy: {acc:.3f}")
    assert acc > 0.0


def test_multi_trait(omics, tmp_path):
    pheno, genofile, _ = omics
    G = np.array([[1.0, 0.5], [0.5, 1.0]])
    geno = get_genotypes(genofile, G, separator=",", method="BayesC",
                         estimatePi=True, name="geno")
    R = np.array([[1.0, 0.5], [0.5, 1.0]])
    model = build_model("trait1 = intercept + geno\nomic1 = intercept + geno",
                        R, genotypes=geno)
    out = runMCMC(model, pheno, seed=314,
                  output_folder=str(tmp_path / "mt"), **CHAIN)
    assert "EBV_trait1" in out and "EBV_omic1" in out
    assert len(out["residual variance"]) >= 2
    acc = _accuracy(out, pheno)
    print(f"  MT accuracy: {acc:.3f}")
    assert acc > 0.1


def test_random_effects_model(omics, tmp_path):
    pheno, genofile, _ = omics
    geno = get_genotypes(genofile, 1.0, separator=",", method="BayesC",
                         estimatePi=True, name="geno")
    model = build_model("trait1 = intercept + group + litter + geno", 1.0,
                        genotypes=geno)
    set_random(model, "litter", 1.0)
    out = runMCMC(model, pheno, seed=314,
                  output_folder=str(tmp_path / "re"), **CHAIN)
    assert out["residual variance"].iloc[0]["Estimate"] > 0.0
    acc = _accuracy(out, pheno)
    print(f"  random-effects model accuracy: {acc:.3f}")
    assert acc > 0.1


def test_gwas_model_frequency(omics, tmp_path):
    pheno, genofile, _ = omics
    geno = get_genotypes(genofile, 1.0, separator=",", method="BayesC",
                         estimatePi=True, name="geno")
    model = build_model("trait1 = intercept + geno", 1.0, genotypes=geno)
    out = runMCMC(model, pheno, seed=314, output_marker_samples=True,
                  output_folder=str(tmp_path / "gwas"), **CHAIN)
    mf = GWAS(out["_marker_sample_file"])
    assert len(mf) == 1000
    assert list(mf.columns) == ["marker_ID", "modelfrequency"]
    assert ((mf.modelfrequency >= 0) & (mf.modelfrequency <= 1)).all()


def test_reproducibility_with_seed(omics, tmp_path):
    pheno, genofile, _ = omics
    outs = []
    for tag in ("r1", "r2"):
        geno = get_genotypes(genofile, 1.0, separator=",", method="RR-BLUP",
                             name="geno")
        model = build_model("trait1 = intercept + geno", 1.0, genotypes=geno)
        outs.append(runMCMC(model, pheno, chain_length=200, seed=999,
                            output_folder=str(tmp_path / tag)))
    np.testing.assert_allclose(
        outs[0]["residual variance"].iloc[0]["Estimate"],
        outs[1]["residual variance"].iloc[0]["Estimate"], atol=1e-10,
    )
    np.testing.assert_allclose(
        outs[0]["EBV_trait1"].sort_values("ID")["EBV"].to_numpy(),
        outs[1]["EBV_trait1"].sort_values("ID")["EBV"].to_numpy(), atol=1e-10,
    )
