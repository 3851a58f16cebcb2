"""Annotation-aware prior (AnnoBayesC / AnnoBayesR) tests.

Mirrors the reference annotated-method tests (reference:
test/unit/test_annotated_bayesc.jl, test_annotated_bayesr.jl): simulate
markers where a functional annotation enriches for QTL, run short chains, and
assert (a) the probit slope for the informative annotation is positive and
(b) EBV accuracy holds up.
"""

import numpy as np
import pytest

from jwas_tpu import build_model, get_genotypes, runMCMC


def _anno_sim(seed=31, n=500, p=300, n_qtl=25, h2=0.6):
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.1, 0.9, p)
    X = rng.binomial(2, freqs[None, :], size=(n, p)).astype(np.float32)
    Xc = X - X.mean(axis=0)
    anno = np.zeros((p, 1))
    annotated = rng.choice(p, p // 5, replace=False)   # 20% annotated
    anno[annotated, 0] = 1.0
    qtl = rng.choice(annotated, n_qtl, replace=False)  # QTL only in annotated set
    effects = np.zeros(p)
    effects[qtl] = rng.normal(0, 1.0, n_qtl)
    bv = Xc @ effects
    ve = bv.var() * (1 - h2) / h2
    y = 5.0 + bv + rng.normal(0, np.sqrt(ve), n)
    import pandas as pd

    ids = [f"i{k}" for k in range(n)]
    geno_df = pd.DataFrame(X, columns=[f"m{j}" for j in range(p)])
    geno_df.insert(0, "ID", ids)
    pheno = pd.DataFrame({"ID": ids, "y": y})
    return geno_df, pheno, bv, anno


def test_annotated_bayesc():
    geno_df, pheno, bv, anno = _anno_sim()
    geno = get_genotypes(geno_df, method="BayesC", Pi=0.9, estimatePi=True,
                         annotations=anno, name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(model, pheno, chain_length=800, burnin=200, seed=6,
                  output_folder="")
    acc = np.corrcoef(out["EBV_y"].EBV, bv)[0, 1]
    assert acc > 0.7, f"AnnoBayesC EBV accuracy {acc:.3f}"
    coeffs = out["annotation coefficients geno"].set_index("Annotation")
    slope = float(coeffs.loc["Annotation_1", "Estimate"])
    assert slope > 0.3, f"annotation slope {slope:.3f} should be clearly positive"
    # mean per-marker exclusion prior should sit well below the 0.9 start for
    # annotated markers overall coverage: the summary mean is in (0, 1)
    pi = out["pi_geno"]["Estimate"].iloc[0]
    assert 0.0 < pi < 1.0


def test_annotated_bayesr():
    geno_df, pheno, bv, anno = _anno_sim(seed=32)
    geno = get_genotypes(geno_df, method="BayesR", annotations=anno, name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(model, pheno, chain_length=800, burnin=200, seed=7,
                  output_folder="")
    acc = np.corrcoef(out["EBV_y"].EBV, bv)[0, 1]
    assert acc > 0.7, f"AnnoBayesR EBV accuracy {acc:.3f}"
    coeffs = out["annotation coefficients geno"]
    s1 = coeffs[(coeffs["Annotation"] == "Annotation_1") & (coeffs["Step"] == 1)]
    assert float(s1["Estimate"].iloc[0]) > 0.3
    pi = out["pi_geno"].set_index("pi")["Estimate"]
    assert pi["class0"] > 0.5          # most markers stay excluded
    assert abs(pi.sum() - 1.0) < 0.02


def test_annotation_validation():
    geno_df, pheno, bv, anno = _anno_sim(n=50, p=40, n_qtl=5, seed=33)
    with pytest.raises(ValueError, match='method="BayesC" or method="BayesR"'):
        get_genotypes(geno_df, method="RR-BLUP", annotations=anno, name="geno")
    with pytest.raises(ValueError, match="must match the number of raw markers"):
        get_genotypes(geno_df, method="BayesC", annotations=anno[:10], name="geno")


def test_annotated_mt_bayesc_two_traits():
    """2-trait annotated BayesC: 4 joint states driven by a 3-step tree
    probit (annotation_updates.jl:275-326). Recovery on the packaged
    simulated_annotations MT analogue: accuracy floors per trait and the
    step-1 probit must load on the true active signal, not the noise one."""
    import pandas as pd

    from jwas_tpu.io.datasets import _simulated_annotations

    data = _simulated_annotations()
    anno = data["annotations_mt"]
    pi0 = {(0.0, 0.0): 0.9, (1.0, 0.0): 0.03, (0.0, 1.0): 0.03, (1.0, 1.0): 0.04}
    geno = get_genotypes(
        data["genotypes"], np.eye(2), method="BayesC", estimatePi=True,
        name="geno",
        annotations=anno[["active_signal", "pleiotropy_signal",
                          "direction_signal", "random_signal"]].to_numpy(),
        Pi=pi0,
    )
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        np.eye(2), genotypes=geno)
    out = runMCMC(model, data["phenotypes_mt"], chain_length=500, burnin=100,
                  output_samples_frequency=10, seed=3, output_folder="",
                  printout_model_info=False)

    geno_mat = data["genotypes"].iloc[:, 1:].to_numpy(dtype=np.float64)
    ids = [str(s) for s in data["genotypes"]["ID"]]
    for ti, col in ((0, "true_effect_y1"), (1, "true_effect_y2")):
        bv = pd.Series(geno_mat @ data["truth_mt"][col].to_numpy(np.float64),
                       index=ids)
        ebv = out[f"EBV_y{ti+1}"]
        acc = np.corrcoef(
            ebv["EBV"].to_numpy(), bv.loc[[str(s) for s in ebv["ID"]]].to_numpy()
        )[0, 1]
        assert acc > 0.5, f"trait {ti+1} accuracy {acc:.3f}"

    coeffs = out["annotation coefficients geno"]
    step1 = coeffs[coeffs["Step"] == 1].set_index("Annotation")["Estimate"]
    assert step1["Annotation_1"] > 0.1                 # active_signal
    assert step1["Annotation_1"] > abs(step1["Annotation_4"])  # > random noise
    # the joint-state pi table sums to ~1
    pi_tab = out["pi_geno"]["Estimate"].to_numpy()
    assert abs(pi_tab.sum() - 1.0) < 0.05
