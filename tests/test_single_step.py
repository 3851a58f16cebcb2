"""Single-step (SSBR) tests.

Mirrors the reference single-step regression tests (reference:
test/unit/test_single_step.jl): real short chains on simulated family data
with a known truth, asserting (a) the imputation algebra M_n = A_nn^-1
(-A_ng M_g), (b) EBV accuracy for genotyped AND non-genotyped individuals,
and (c) validation errors.
"""

import numpy as np
import pytest

from jwas_tpu import build_model, get_genotypes, get_pedigree, runMCMC
from jwas_tpu.io.datasets import simulate_pedigree_genomic_data


@pytest.fixture(scope="module")
def famdata():
    return simulate_pedigree_genomic_data(
        n_founders=60, n_gen=3, n_per_gen=120, p=200, n_qtl=20, h2=0.5, seed=11
    )


def _run_ssbr(famdata, geno_frac=0.6, seed=21, chain=600, burnin=120):
    rng = np.random.default_rng(seed)
    ids = famdata["ids"]
    genotyped = set(rng.choice(ids, size=int(geno_frac * len(ids)), replace=False))
    geno_df = famdata["genotypes"]
    geno_df = geno_df[geno_df["ID"].isin(genotyped)]

    ped = get_pedigree(famdata["pedigree"])
    geno = get_genotypes(geno_df, method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(
        model,
        famdata["phenotypes"],
        chain_length=chain,
        burnin=burnin,
        seed=3,
        single_step_analysis=True,
        pedigree=ped,
        output_folder="",
    )
    return out, genotyped


def test_ssbr_imputation_algebra(famdata):
    """M_n from the solve must equal A_nn^-1 (-A_ng M_g) (SSBR.jl:94)."""
    from jwas_tpu.engine.single_step import _partitioned_a_inverse
    from jwas_tpu.models.model import Model

    ped = get_pedigree(famdata["pedigree"])
    ids = famdata["ids"]
    genotyped = ids[::2]
    geno_df = famdata["genotypes"]
    geno = get_genotypes(geno_df[geno_df["ID"].isin(set(genotyped))],
                         method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    model.ped = ped
    Ai_nn, Ai_ng, nongeno_ids, geno_ids, F_nn = _partitioned_a_inverse(model)
    # the hAi column slice is a true factor of A_nn (sparse PO sampling)
    np.testing.assert_allclose(
        (F_nn.T @ F_nn).toarray(), Ai_nn.toarray(), atol=1e-10
    )

    # brute force: A over the permuted order; conditional expectation of
    # centered dosages given relatives is A_ng' A_nn^-1 ... on the n-side.
    idx = {s: i for i, s in enumerate(geno.obs_ids)}
    Mg = geno.genotypes[[idx[s] for s in geno_ids]]
    Mn = np.linalg.solve(Ai_nn.toarray(), -(Ai_ng.toarray() @ Mg))

    from scipy.sparse.linalg import splu
    from jwas_tpu.engine.single_step import _impute_genotypes

    lu = splu(Ai_nn.tocsc())
    M_ped = _impute_genotypes(geno, lu, Ai_ng, geno_ids)
    np.testing.assert_allclose(M_ped[: len(nongeno_ids)], Mn, rtol=0, atol=5e-4)
    np.testing.assert_allclose(M_ped[len(nongeno_ids):], Mg, rtol=0, atol=0)


def test_ssbr_ebv_accuracy(famdata):
    out, genotyped = _run_ssbr(famdata)
    ebv = out["EBV_y"].set_index("ID")["EBV"]
    ids = famdata["ids"]
    bv = famdata["true_bv"]
    acc_all = np.corrcoef(ebv.loc[ids].to_numpy(), bv)[0, 1]
    non_idx = [i for i, s in enumerate(ids) if s not in genotyped]
    acc_non = np.corrcoef(
        ebv.loc[[ids[i] for i in non_idx]].to_numpy(), bv[non_idx]
    )[0, 1]
    assert acc_all > 0.55, f"single-step EBV accuracy (all) {acc_all:.3f}"
    assert acc_non > 0.4, f"single-step EBV accuracy (non-genotyped) {acc_non:.3f}"


def test_ssbr_errors():
    famdata = simulate_pedigree_genomic_data(
        n_founders=10, n_gen=1, n_per_gen=10, p=20, n_qtl=5, seed=4
    )
    ped = get_pedigree(famdata["pedigree"])
    geno_df = famdata["genotypes"].copy()
    geno_df.loc[geno_df.index[-1], "ID"] = "stranger"
    geno = get_genotypes(geno_df, method="BayesC", name="geno", MAF=0.0)
    model = build_model("y = intercept + geno", genotypes=geno)
    with pytest.raises(ValueError, match="pedigree"):
        runMCMC(model, famdata["phenotypes"], chain_length=5,
                single_step_analysis=True, pedigree=ped, output_folder="")


# ---------------------------------------------------------------------------
# SSGBLUP (get_Hi, SSGBLUP.jl:2-36) and APY (forSSBR.jl:58-99)
# ---------------------------------------------------------------------------


def test_get_hi_weight0_equals_ai(famdata):
    """With weight_for_G=0, G = A_gg exactly, so Hi must equal Ai."""
    from jwas_tpu.engine.single_step import get_Hi

    rng = np.random.default_rng(4)
    ids = famdata["ids"]
    genotyped = set(rng.choice(ids, size=len(ids) // 2, replace=False))
    geno_df = famdata["genotypes"]
    geno = get_genotypes(geno_df[geno_df["ID"].isin(genotyped)],
                         method="BayesC", name="geno")
    ped = get_pedigree(famdata["pedigree"])
    Hi, order = get_Hi(ped, geno, weight_for_G=0.0)
    perm = np.array([ped.id_index[s] for s in order])
    Ai = ped.a_inverse()[perm][:, perm]
    np.testing.assert_allclose(Hi.toarray(), Ai.toarray(), atol=1e-6)
    assert set(order) == set(ids)


def test_get_hi_mcmc_via_prediction_equation(famdata, tmp_path):
    """H-matrix animal model: Hi as user Vinv + prediction_equation='ID'
    yields EBVs for everyone that track the simulated breeding values."""
    from jwas_tpu import set_random
    from jwas_tpu.engine.single_step import get_Hi

    rng = np.random.default_rng(9)
    ids = famdata["ids"]
    genotyped = set(rng.choice(ids, size=len(ids) // 2, replace=False))
    geno_df = famdata["genotypes"]
    geno = get_genotypes(geno_df[geno_df["ID"].isin(genotyped)],
                         method="BayesC", name="geno")
    ped = get_pedigree(famdata["pedigree"])
    Hi, order = get_Hi(ped, geno, weight_for_G=0.95)

    model = build_model("y = intercept + ID")
    set_random(model, "ID", famdata["var_g"], Vinv=Hi, names=order)
    out = runMCMC(model, famdata["phenotypes"], chain_length=600, burnin=120,
                  seed=8, prediction_equation="ID",
                  output_folder=str(tmp_path / "hblup"))
    ebv = out["EBV_y"].set_index("ID").EBV
    truth = dict(zip(famdata["ids"], famdata["true_bv"]))
    common = [s for s in ebv.index if s in truth]
    acc = np.corrcoef(ebv.loc[common], [truth[s] for s in common])[0, 1]
    assert acc > 0.5


def test_apy_partition(famdata):
    from jwas_tpu.engine.single_step import apy_partition

    ped = get_pedigree(famdata["pedigree"])
    ids = famdata["ids"]
    geno_ids = ids[::2]
    core_ids = geno_ids[:20]
    nongeno, core, noncore = apy_partition(ped, geno_ids, core_ids)
    assert set(core) == set(core_ids)
    assert set(nongeno) | set(core) | set(noncore) == set(ids)
    assert not (set(noncore) & set(core))
    with pytest.raises(ValueError, match="core IDs not genotyped"):
        apy_partition(ped, geno_ids, [ids[1]])


def test_apy_g_inverse_exactness():
    """APY equals the exact inverse when (a) core = everyone, and (b) the
    non-core block is conditionally independent given the core."""
    from jwas_tpu.engine.single_step import apy_g_inverse

    rng = np.random.default_rng(0)
    c, m = 30, 40
    B = rng.normal(size=(c, c))
    Gcc = B @ B.T + np.eye(c)
    Gcn = rng.normal(size=(c, m)) * 0.3
    d = rng.uniform(0.5, 1.5, size=m)
    Gnn = Gcn.T @ np.linalg.solve(Gcc, Gcn) + np.diag(d)
    G = np.block([[Gcc, Gcn], [Gcn.T, Gnn]])

    # exact by construction with core = first c
    Ginv = apy_g_inverse(G, np.arange(c))
    np.testing.assert_allclose(Ginv, np.linalg.inv(G), atol=1e-8)

    # core = everyone is always exact
    Ginv_full = apy_g_inverse(G, np.arange(c + m))
    np.testing.assert_allclose(Ginv_full, np.linalg.inv(G), atol=1e-8)


def test_mt_ssbr_end_to_end(famdata):
    """Two-trait single-step SSBR on the family data: the trait-generic SSBR
    setup (reference SSBR.jl:8-54 is trait-agnostic) must produce the J
    covariate + epsilon imputation-residual terms per trait and clear an EBV
    accuracy floor for genotyped AND non-genotyped individuals."""
    import pandas as pd

    rng = np.random.default_rng(5)
    ids = famdata["ids"]
    ph = famdata["phenotypes"].copy()
    bv = pd.Series(np.asarray(famdata["true_bv"]), index=ids)
    # second trait: same QTL signal scaled + correlated noise (rg=1 by
    # construction through bv; re independent)
    y2 = 0.8 * bv.loc[ph["ID"]].to_numpy() + rng.normal(
        0, bv.std() * 0.9, len(ph)
    )
    ph = ph.rename(columns={ph.columns[1]: "y1"})
    ph["y2"] = y2

    genotyped = set(rng.choice(ids, size=int(0.6 * len(ids)), replace=False))
    geno_df = famdata["genotypes"]
    geno_df = geno_df[geno_df["ID"].isin(genotyped)]
    ped = get_pedigree(famdata["pedigree"])
    geno = get_genotypes(geno_df, method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    out = runMCMC(model, ph, chain_length=600, burnin=120, seed=3,
                  single_step_analysis=True, pedigree=ped, output_folder="")

    # J covariate and epsilon terms present per trait in the location table
    loc = out["location parameters"]
    effs = set(zip(loc.Trait, loc.Effect))
    assert ("y1", "J") in effs and ("y2", "J") in effs
    assert ("y1", "ϵ") in effs and ("y2", "ϵ") in effs

    for trait in ("y1", "y2"):
        ebv = out[f"EBV_{trait}"].set_index("ID")["EBV"]
        common = [s for s in ids if s in ebv.index]
        acc = np.corrcoef(ebv.loc[common], bv.loc[common])[0, 1]
        assert acc > 0.35, f"MT-SSBR {trait} overall accuracy {acc:.3f}"
        non_g = [s for s in common if s not in genotyped]
        acc_n = np.corrcoef(ebv.loc[non_g], bv.loc[non_g])[0, 1]
        assert acc_n > 0.25, f"MT-SSBR {trait} non-genotyped accuracy {acc_n:.3f}"


def test_blocked_cg_matches_direct_solve():
    """The at-scale imputation solver (Jacobi-preconditioned multi-RHS CG)
    reproduces splu solutions to ~1e-8 on a pedigree A_nn block."""
    import numpy as np
    import pandas as pd
    from scipy.sparse.linalg import splu

    from jwas_tpu.engine.single_step import _blocked_cg_spd
    from jwas_tpu.io.pedigree import get_pedigree

    rng = np.random.default_rng(3)
    n = 2000
    ids = [f"c{i}" for i in range(n)]
    sire = ["missing" if i < 20 else ids[int(rng.integers(max(i - 200, 0), i))]
            for i in range(n)]
    dam = ["missing" if i < 20 else ids[int(rng.integers(max(i - 200, 0), i))]
           for i in range(n)]
    ped = get_pedigree(pd.DataFrame({"ID": ids, "S": sire, "D": dam}))
    Ai = ped.a_inverse().tocsc()
    sub = Ai[:1500, :1500].tocsc()   # a leading principal block is SPD
    B = rng.normal(size=(1500, 7))
    X_ref = splu(sub).solve(B)
    X_cg = _blocked_cg_spd(sub.tocsr(), B)
    np.testing.assert_allclose(X_cg, X_ref, rtol=1e-6, atol=1e-8)
