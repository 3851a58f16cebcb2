"""Structure-equation-model (SEM) tests.

Mirrors the reference SEM tests (reference: test/unit/test_sem_comprehensive.jl
pattern): a fully recursive 2-trait causal network y1 -> y2 with known
structural coefficient; assert the posterior recovers lambda and that the
indirect/overall marker-effect summaries obey overall = direct + indirect.
"""

import numpy as np
import pandas as pd

from jwas_tpu import build_model, get_genotypes, runMCMC
from jwas_tpu.io.datasets import simulate_genomic_data


def _sem_sim(lam=0.8, seed=17, n=500, p=150):
    rng = np.random.default_rng(seed)
    sim = simulate_genomic_data(n=n, p=p, n_qtl=15, h2=0.6, seed=seed)
    X = sim["genotypes"].iloc[:, 1:].to_numpy(dtype=np.float64)
    Xc = X - X.mean(axis=0)
    eff2 = np.zeros(p)
    qtl2 = rng.choice(p, size=15, replace=False)
    eff2[qtl2] = rng.normal(0, 1.0, 15)
    bv2 = Xc @ eff2
    y1 = sim["phenotypes"]["y"].to_numpy()
    e2 = rng.normal(0, np.sqrt(bv2.var()), n)
    y2 = lam * y1 + bv2 + e2
    df = pd.DataFrame({"ID": sim["phenotypes"]["ID"], "y1": y1, "y2": y2})
    return sim, df, lam


def test_sem_recovers_structural_coefficient():
    sim, df, lam = _sem_sim()
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    causal = np.array([[0.0, 0.0], [1.0, 0.0]])
    out = runMCMC(model, df, chain_length=800, burnin=200, seed=5,
                  causal_structure=causal, output_folder="")
    sc = out["structural coefficients"]
    assert list(sc["Edge"]) == ["y1->y2"]
    est = float(sc["Estimate"].iloc[0])
    assert abs(est - lam) < 0.15, f"lambda estimate {est:.3f} vs truth {lam}"

    # overall = direct + indirect marker effects, per trait/marker
    direct = out["marker effects geno"].set_index(["Trait", "Marker_ID"])["Estimate"]
    indirect = out["indirect marker effects geno"].set_index(["Trait", "Marker_ID"])["Estimate"]
    overall = out["overall marker effects geno"].set_index(["Trait", "Marker_ID"])["Estimate"]
    # means of per-sample products differ from products of means; tolerance is
    # loose but the identity must hold closely since draws are tied per sample
    np.testing.assert_allclose(
        overall.to_numpy(), (direct + indirect).to_numpy(), atol=0.05
    )
    # trait-1 indirect effects are exactly zero (no incoming edges)
    assert np.allclose(indirect.loc["y1"].to_numpy(), 0.0)


def test_sem_validation():
    import pytest

    sim, df, _ = _sem_sim(seed=23, n=100, p=40)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    with pytest.raises(ValueError, match="lower triangular"):
        runMCMC(model, df, chain_length=5, output_folder="",
                causal_structure=np.array([[0.0, 1.0], [1.0, 0.0]]))
    df_miss = df.copy()
    df_miss.loc[0, "y2"] = np.nan
    geno2 = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model2 = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                         genotypes=geno2)
    with pytest.raises(ValueError, match="missing"):
        runMCMC(model2, df_miss, chain_length=5, output_folder="",
                causal_structure=np.array([[0.0, 0.0], [1.0, 0.0]]))
