"""Posterior-accuracy tests on the reference's REAL packaged datasets.

These read the actual data files shipped inside the reference checkout
(read-only at /root/reference/src/4.Datasets/data/*) — not generated
analogues — and assert EBV-vs-truth accuracy floors, mirroring the
reference's integration pattern (test/integration/test_simulated_omics.jl:31-70).

Datasets used:
- simulated_annotations (401 x 964 genotypes, ST + MT phenotypes, per-marker
  truth tables, annotation signals; src/4.Datasets/data/simulated_annotations/)
- simulated_omics (6,473-animal pedigree + 3,534 phenotype rows with
  genetic_total truth; the packaged genotype file `genotypes_1000snps.txt` is
  absent from the reference checkout, so the genomic configs run on
  simulated_annotations instead and simulated_omics drives the pedigree path)
- demo_7animals (complete 7-animal demo: genotypes/pedigree/phenotypes/map)

Gated by RUN_INTEGRATION_TESTS=true (reference runtests.jl:54).
"""

import os

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import build_model, get_genotypes, get_pedigree, runMCMC, set_random

REF_DATA = "/root/reference/src/4.Datasets/data"

pytestmark = [
    pytest.mark.skipif(
        os.environ.get("RUN_INTEGRATION_TESTS", "").lower() != "true",
        reason="set RUN_INTEGRATION_TESTS=true to run integration tests",
    ),
    pytest.mark.skipif(
        not os.path.isdir(REF_DATA),
        reason="reference packaged data not available",
    ),
]

CHAIN = dict(chain_length=800, burnin=200, output_samples_frequency=10,
             printout_model_info=False)


@pytest.fixture(scope="module")
def anno_data():
    d = os.path.join(REF_DATA, "simulated_annotations")
    phenotypes = pd.read_csv(os.path.join(d, "phenotypes.csv"))
    phenotypes["ID"] = phenotypes["ID"].astype(str)
    truth = pd.read_csv(os.path.join(d, "truth.csv"))
    genofile = os.path.join(d, "genotypes.csv")
    geno_raw = pd.read_csv(genofile)
    X = geno_raw.iloc[:, 1:].to_numpy(dtype=np.float64)
    ids = [str(s) for s in geno_raw["ID"]]
    true_bv = X @ truth["true_effect"].to_numpy(np.float64)
    return dict(dir=d, phenofile=phenotypes, genofile=genofile,
                ids=ids, true_bv=pd.Series(true_bv, index=ids))


def _accuracy(results, trait, true_bv):
    ebv = results[f"EBV_{trait}"]
    ids = [str(s) for s in ebv["ID"]]
    return float(np.corrcoef(ebv["EBV"].to_numpy(), true_bv.loc[ids].to_numpy())[0, 1])


@pytest.mark.parametrize("method,floor", [
    # floors ~0.05 under measured accuracies (0.87-0.95 at 800 iters)
    ("BayesC", 0.88), ("BayesB", 0.88), ("BayesR", 0.88),
    ("RR-BLUP", 0.82), ("BayesL", 0.85), ("GBLUP", 0.82),
])
def test_st_methods_on_reference_annotations_data(anno_data, method, floor,
                                                  tmp_path):
    """All ST Bayesian-alphabet methods on the real packaged genotypes;
    EBV accuracy vs the packaged per-marker truth (h2 = 0.5 simulation,
    simulated_annotations/README.md)."""
    estimate_pi = method in ("BayesC", "BayesB")
    geno = get_genotypes(anno_data["genofile"], 1.0, method=method,
                         estimatePi=estimate_pi, name="geno")
    model = build_model("y1 = intercept + geno", 1.0, genotypes=geno)
    out = runMCMC(model, anno_data["phenofile"], seed=314,
                  output_folder=str(tmp_path / method), **CHAIN)
    assert out["residual variance"]["Estimate"].iloc[0] > 0
    acc = _accuracy(out, "y1", anno_data["true_bv"])
    print(f"{method} accuracy vs packaged truth: {acc:.3f}")
    assert acc > floor


def test_annotated_bayesc_on_reference_annotations_data(anno_data, tmp_path):
    """ST AnnoBayesC on the real annotations.csv; the functional signal must
    not hurt accuracy and annotation coefficients must load on the true
    signal column (annotation_updates.jl:156-192 analogue)."""
    anno = pd.read_csv(os.path.join(anno_data["dir"], "annotations.csv"))
    geno_cols = pd.read_csv(anno_data["genofile"], nrows=0).columns[1:]
    anno = anno.set_index("marker_id").loc[list(geno_cols)]
    geno = get_genotypes(anno_data["genofile"], 1.0, method="BayesC",
                         estimatePi=True, name="geno",
                         annotations=anno[["functional", "random_anno"]].to_numpy())
    model = build_model("y1 = intercept + geno", 1.0, genotypes=geno)
    out = runMCMC(model, anno_data["phenofile"], seed=314,
                  output_folder=str(tmp_path / "anno"), **CHAIN)
    acc = _accuracy(out, "y1", anno_data["true_bv"])
    print(f"AnnoBayesC accuracy: {acc:.3f}")
    assert acc > 0.80
    coeffs = out["annotation coefficients geno"]
    functional = float(coeffs["Estimate"].iloc[1])
    random_anno = float(coeffs["Estimate"].iloc[2])
    assert functional > abs(random_anno)


def test_mt_bayesc_on_reference_annotations_data(anno_data, tmp_path):
    """2-trait BayesC on the real phenotypes_mt.csv; accuracy vs the packaged
    per-trait MT truth."""
    d = anno_data["dir"]
    pheno_mt = pd.read_csv(os.path.join(d, "phenotypes_mt.csv"))
    pheno_mt["ID"] = pheno_mt["ID"].astype(str)
    truth_mt = pd.read_csv(os.path.join(d, "truth_mt.csv"))
    geno_raw = pd.read_csv(anno_data["genofile"])
    X = geno_raw.iloc[:, 1:].to_numpy(dtype=np.float64)
    ids = [str(s) for s in geno_raw["ID"]]
    bv1 = pd.Series(X @ truth_mt["true_effect_y1"].to_numpy(np.float64), index=ids)
    bv2 = pd.Series(X @ truth_mt["true_effect_y2"].to_numpy(np.float64), index=ids)

    geno = get_genotypes(anno_data["genofile"], np.eye(2), method="BayesC",
                         estimatePi=True, name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        np.eye(2), genotypes=geno)
    out = runMCMC(model, pheno_mt, seed=314,
                  output_folder=str(tmp_path / "mt"), **CHAIN)
    acc1 = _accuracy(out, "y1", bv1)
    acc2 = _accuracy(out, "y2", bv2)
    print(f"MT BayesC accuracies: y1={acc1:.3f} y2={acc2:.3f}")
    assert acc1 > 0.82 and acc2 > 0.75


def test_pedigree_blup_on_reference_omics_data(tmp_path):
    """PBLUP on the real simulated_omics pedigree + phenotypes (the packaged
    genotype file is absent, so the pedigree path is what this dataset can
    drive): EBV of phenotyped animals vs the packaged genetic_total truth."""
    d = os.path.join(REF_DATA, "simulated_omics")
    ped = get_pedigree(os.path.join(d, "pedigree.txt"), separator=",", header=True)
    phenotypes = pd.read_csv(os.path.join(d, "phenotypes.txt"),
                             na_values=["NA"])
    phenotypes["ID"] = phenotypes["ID"].astype(str)
    phenotypes["group"] = phenotypes["group"].astype(str)

    model = build_model("trait1 = intercept + group + ID")
    set_random(model, "ID", ped)
    out = runMCMC(model, phenotypes, seed=314, chain_length=300, burnin=50,
                  output_samples_frequency=10, printout_model_info=False,
                  output_folder=str(tmp_path / "pblup"))
    ebv = out["EBV_trait1"]
    ebv["ID"] = ebv["ID"].astype(str)
    merged = ebv.merge(phenotypes[["ID", "genetic_total"]], on="ID").dropna()
    acc = float(np.corrcoef(merged["EBV"], merged["genetic_total"])[0, 1])
    print(f"PBLUP accuracy vs genetic_total: {acc:.3f}")
    # the reference integration floor is 0.1 (only 20% of genetic variance is
    # direct and there are no genotypes here; test_simulated_omics.jl:59-66)
    assert acc > 0.1
    assert "polygenic effects covariance matrix" in out


def test_demo_7animals_files(tmp_path):
    """The complete 7-animal demo: pedigree-genotype-phenotype plumbing on the
    real packaged files end-to-end."""
    d = os.path.join(REF_DATA, "demo_7animals")
    ped = get_pedigree(os.path.join(d, "pedigree.txt"), separator=",", header=True)
    phenotypes = pd.read_csv(os.path.join(d, "phenotypes.txt"))
    phenotypes.columns = [c.strip() for c in phenotypes.columns]
    phenotypes["ID"] = phenotypes["ID"].astype(str).str.strip()
    geno = get_genotypes(os.path.join(d, "genotypes.txt"), 1.0,
                         method="BayesC", MAF=0.0, name="geno")
    model = build_model("y1 = intercept + geno", 1.0, genotypes=geno)
    out = runMCMC(model, phenotypes, seed=1, chain_length=200, burnin=50,
                  output_samples_frequency=5, printout_model_info=False,
                  output_folder=str(tmp_path / "demo"))
    assert out["residual variance"]["Estimate"].iloc[0] > 0
    assert len(out["EBV_y1"]) > 0
    assert np.isfinite(out["EBV_y1"]["EBV"]).all()
    del ped


def test_annotated_mt_bayesc_on_reference_data(anno_data, tmp_path):
    """2-trait annotated BayesC on the REAL packaged annotations_mt.csv:
    accuracy floors per trait vs the packaged MT truth (4 joint states,
    annotation_updates.jl:275-326)."""
    d = anno_data["dir"]
    pheno_mt = pd.read_csv(os.path.join(d, "phenotypes_mt.csv"))
    pheno_mt["ID"] = pheno_mt["ID"].astype(str)
    truth_mt = pd.read_csv(os.path.join(d, "truth_mt.csv"))
    anno_mt = pd.read_csv(os.path.join(d, "annotations_mt.csv"))
    geno_cols = pd.read_csv(anno_data["genofile"], nrows=0).columns[1:]
    anno_mt = anno_mt.set_index("marker_id").loc[list(geno_cols)]

    pi0 = {(0.0, 0.0): 0.9, (1.0, 0.0): 0.03, (0.0, 1.0): 0.03, (1.0, 1.0): 0.04}
    geno = get_genotypes(
        anno_data["genofile"], np.eye(2), method="BayesC", estimatePi=True,
        name="geno", Pi=pi0,
        annotations=anno_mt[["active_signal", "pleiotropy_signal",
                             "direction_signal", "random_signal"]].to_numpy(),
    )
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        np.eye(2), genotypes=geno)
    out = runMCMC(model, pheno_mt, seed=314,
                  output_folder=str(tmp_path / "anno_mt"), **CHAIN)

    geno_raw = pd.read_csv(anno_data["genofile"])
    X = geno_raw.iloc[:, 1:].to_numpy(dtype=np.float64)
    ids = [str(s) for s in geno_raw["ID"]]
    bv1 = pd.Series(X @ truth_mt["true_effect_y1"].to_numpy(np.float64), index=ids)
    bv2 = pd.Series(X @ truth_mt["true_effect_y2"].to_numpy(np.float64), index=ids)
    acc1 = _accuracy(out, "y1", bv1)
    acc2 = _accuracy(out, "y2", bv2)
    print(f"annotated MT BayesC accuracies: y1={acc1:.3f} y2={acc2:.3f}")
    assert acc1 > 0.75 and acc2 > 0.7
    assert "annotation coefficients geno" in out
