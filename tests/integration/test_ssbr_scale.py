"""Single-step SSBR at reference design scale: >= 1e5 pedigree animals.

The reference's single-step layer is built for pedigrees with hundreds of
thousands of animals on a sparse MME (SSBR.jl:22-53; sparse A_nn epsilon
term); the SURVEY §7 flagship config is 500k animals. This test runs the
FULL pipeline — pedigree load (native inbreeding kernel), A-inverse
partitioning, multi-RHS CG genotype imputation (splu fill-in is
prohibitive at this scale; engine/single_step.py:_blocked_cg_spd),
J + epsilon terms, and the sparse-location MCMC engine (matrix-free PO-CG
draws, ops/sparse_mme.py) — at 1e5 pedigree animals end-to-end, something
the dense (K, K) location path cannot represent (80 GB LHS).

The synthetic pedigree is GENERATIONAL (parents drawn from the preceding
~2 generations), like real livestock pedigrees; a parents-from-anywhere
pedigree produces an A_nn whose couplings span the whole matrix and is
not representative.

Gated by RUN_INTEGRATION_TESTS=true (reference runtests.jl:54).
"""

import os
import time

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import build_model, get_genotypes, get_pedigree, runMCMC

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_INTEGRATION_TESTS", "").lower() != "true",
    reason="set RUN_INTEGRATION_TESTS=true for the 1e5-animal SSBR run",
)


def test_ssbr_100k_pedigree_end_to_end():
    from scipy.sparse.linalg import spsolve_triangular

    n_ped = 100_000
    gen = 2_000                    # animals per generation
    n_geno = 4_000
    p = 800
    n_qtl = 50
    rng = np.random.default_rng(31)

    ids = np.array([f"a{k}" for k in range(n_ped)])
    lo = np.maximum(np.arange(n_ped) - 2 * gen, 0)
    hi = np.maximum(np.arange(n_ped) - 1, 1)
    anc = np.stack([rng.integers(lo, hi), rng.integers(lo, hi)])
    sire = np.where(np.arange(n_ped) < gen, "missing", ids[anc[0]])
    dam = np.where(np.arange(n_ped) < gen, "missing", ids[anc[1]])
    t0 = time.time()
    ped = get_pedigree(pd.DataFrame({"ID": ids, "S": sire, "D": dam}))
    t_ped = time.time() - t0

    # genotypes for the LAST n_geno animals (recent generations), QTL model
    freqs = rng.uniform(0.1, 0.9, p)
    geno_ids = ids[-n_geno:]
    X = rng.binomial(2, freqs, size=(n_geno, p)).astype(np.float64)
    beta = np.zeros(p)
    qtl = rng.choice(p, n_qtl, replace=False)
    beta[qtl] = rng.normal(size=n_qtl)

    # polygenic breeding values through the exact A factor (u = hAi^-1 z)
    hAi = ped.a_inverse_factor()
    u_poly = spsolve_triangular(hAi.tocsr(), rng.normal(size=n_ped),
                                lower=True)
    u_poly = u_poly / u_poly.std()
    code = {s: i for i, s in enumerate(ped.ids)}
    bv_geno = (X - 2 * freqs) @ beta
    bv_geno = bv_geno / max(bv_geno.std(), 1e-9)
    gset = {s: k for k, s in enumerate(geno_ids)}

    # phenotypes: half the genotyped animals + a slice of non-genotyped
    pheno_ids = list(geno_ids[: n_geno // 2]) + list(ids[60_000:70_000])
    bv = {s: 0.6 * u_poly[code[s]]
          + (bv_geno[gset[s]] if s in gset else 0.0) for s in pheno_ids}
    yv = np.array([bv[s] for s in pheno_ids])
    yv = yv + rng.normal(size=len(yv)) * yv.std()
    pheno = pd.DataFrame({"ID": pheno_ids, "y": yv})

    geno_df = pd.DataFrame(X, columns=[f"m{j}" for j in range(p)])
    geno_df.insert(0, "ID", geno_ids)
    geno = get_genotypes(geno_df, float(np.var(yv) * 0.3), method="BayesC",
                         G_is_marker_variance=False, name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)

    t0 = time.time()
    out = runMCMC(
        model, pheno, chain_length=300, burnin=80, seed=5,
        single_step_analysis=True, pedigree=ped, output_folder="",
        cg_maxiter=80, printout_model_info=False,
    )
    t_mcmc = time.time() - t0

    ebv = out["EBV_y"].set_index("ID").EBV
    truth = {s: 0.6 * u_poly[code[s]] + bv_geno[k]
             for k, s in enumerate(geno_ids)}
    common = [s for s in geno_ids if s in ebv.index]
    acc = np.corrcoef([truth[s] for s in common],
                      ebv.reindex(common))[0, 1]
    print(f"# SSBR 1e5: ped={t_ped:.1f}s mcmc={t_mcmc:.1f}s acc={acc:.3f}")
    assert acc > 0.3, acc
    # K exceeded the dense cap: the eps term alone has ~96k levels
    assert len(out["location parameters"]) > 90_000
