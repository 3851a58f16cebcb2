"""Per-parameter MCMC sample files (output.jl:320-526 subsystem).

outputMCMCsamples is a live API: requested location-parameter terms stream to
`MCMC_samples_<trait>.<term>.txt`; residual/marker variances, pi, EBVs,
polygenic covariances, and per-trait marker effects stream to their own files
every output_samples_frequency iterations. GWAS consumes the marker-effect
files — including the genetic-correlation mode reading a PAIR of files from a
real multi-trait run.
"""

import os

import numpy as np
import pandas as pd

from jwas_tpu import (
    GWAS,
    build_model,
    get_genotypes,
    outputMCMCsamples,
    runMCMC,
    set_random,
)
from jwas_tpu import get_pedigree
from jwas_tpu.io.datasets import (
    simulate_genomic_data,
    simulate_genomic_data_mt,
    simulate_pedigree_genomic_data,
)


def _rows(path):
    with open(path) as f:
        return [ln.rstrip("\n") for ln in f if ln.strip()]


def test_st_sample_files(tmp_path):
    sim = simulate_genomic_data(n=150, p=60, n_qtl=8, h2=0.5, seed=2)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + x1 + geno", genotypes=geno)
    outputMCMCsamples(model, "intercept", "x1")
    df = sim["phenotypes"].copy()
    rng = np.random.default_rng(0)
    df["x1"] = rng.choice(["a", "b", "c"], size=len(df))
    folder = str(tmp_path / "out")
    out = runMCMC(model, df, chain_length=200, burnin=40,
                  output_samples_frequency=10, seed=5, output_folder=folder,
                  printout_model_info=False)

    # n_saved rows per file (+1 header where applicable)
    res_rows = _rows(os.path.join(folder, "MCMC_samples_residual_variance.txt"))
    n_saved = len(res_rows) - 1
    assert res_rows[0] == "y_y"
    assert n_saved >= 10
    vals = np.array([float(r) for r in res_rows[1:]])
    assert np.isfinite(vals).all() and (vals > 0).all()

    # requested location terms stream with level-name headers
    x1 = _rows(os.path.join(folder, "MCMC_samples_y.x1.txt"))
    assert x1[0].startswith("y:x1:")
    assert len(x1) == n_saved + 1
    assert len(x1[1].split(",")) == len(x1[0].split(","))
    mu = _rows(os.path.join(folder, "MCMC_samples_y.intercept.txt"))
    assert len(mu) == n_saved + 1

    # marker effects: header = marker ids; consumed by GWAS model frequency
    mfile = out["_marker_sample_file"]
    assert os.path.basename(mfile) == "MCMC_samples_marker_effects_geno_y.txt"
    me = _rows(mfile)
    assert len(me) == n_saved + 1
    freq = GWAS(mfile)
    assert len(freq) == geno.n_markers
    assert ((freq["modelfrequency"] >= 0) & (freq["modelfrequency"] <= 1)).all()

    # variances / pi / EBV / h2 files
    for name in ("marker_effects_variances_geno", "pi_geno", "EBV_y",
                 "genetic_variance", "heritability"):
        rows = _rows(os.path.join(folder, f"MCMC_samples_{name}.txt"))
        assert rows, name
    ebv = _rows(os.path.join(folder, "MCMC_samples_EBV_y.txt"))
    assert len(ebv[0].split(",")) == 150
    assert len(ebv) == n_saved + 1


def test_st_sample_files_pedigree_vcs(tmp_path):
    sim = simulate_pedigree_genomic_data(n_founders=20, n_gen=2, n_per_gen=40,
                                          p=30, n_qtl=5, h2=0.4, seed=3)
    ped = get_pedigree(sim["pedigree"])
    model = build_model("y = intercept + ID")
    set_random(model, "ID", ped)
    folder = str(tmp_path / "ped")
    runMCMC(model, sim["phenotypes"], chain_length=120, burnin=20,
            output_samples_frequency=10, seed=4, output_folder=folder,
            printout_model_info=False)
    poly = _rows(os.path.join(folder, "MCMC_samples_polygenic_effects_variance.txt"))
    assert poly[0] == "y:ID_y:ID"
    assert all(float(r) > 0 for r in poly[1:])
    grp = _rows(os.path.join(folder, "MCMC_samples_y.ID_variances.txt"))
    assert len(grp) == len(poly)


def test_mt_sample_files_feed_gwas_genetic_correlation(tmp_path):
    """The reference workflow: a real MT run writes per-trait marker-effect
    sample files; GWAS(genetic_correlation=True) consumes the pair
    (GWAS.jl:203-247)."""
    sim = simulate_genomic_data_mt(n=250, p=80, n_qtl=10, h2=(0.5, 0.4),
                                   rg=0.7, re=0.2, seed=9)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    folder = str(tmp_path / "mt")
    out = runMCMC(model, sim["phenotypes"], chain_length=300, burnin=60,
                  output_samples_frequency=10, seed=11, output_folder=folder,
                  printout_model_info=False)
    files = out["_marker_sample_files"]
    assert set(files) == {"y1", "y2"}
    for f in files.values():
        assert os.path.isfile(f)

    rng = np.random.default_rng(1)
    map_df = pd.DataFrame({
        "markerID": geno.marker_ids,
        "chromosome": 1,
        "position": np.sort(rng.integers(0, 3_000_000, len(geno.marker_ids))),
    })
    res = GWAS(model, map_df, [files["y1"], files["y2"]],
               genetic_correlation=True, genotypes=np.asarray(geno.genotypes))
    assert len(res) >= 2
    assert np.isfinite(res["estimate_cor"]).all()
    assert (res["estimate_cor"].abs() <= 1.0 + 1e-6).all()

    # residual-variance file carries the t*t header and rows
    rv = _rows(os.path.join(folder, "MCMC_samples_residual_variance.txt"))
    assert rv[0] == "y1_y1,y1_y2,y2_y1,y2_y2"
    assert len(rv[1].split(",")) == 4


def test_st_bayesb_variance_file_is_per_marker_vector(tmp_path):
    """Reference BayesB writes the FULL per-marker variance vector per sample
    (output.jl:471-475), not its mean: assert p columns per row."""
    sim = simulate_genomic_data(n=120, p=30, n_qtl=5, h2=0.5, seed=13)
    geno = get_genotypes(sim["genotypes"], method="BayesB", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    folder = str(tmp_path / "bb")
    runMCMC(model, sim["phenotypes"], chain_length=60, burnin=10,
            output_samples_frequency=10, seed=3, output_folder=folder,
            printout_model_info=False)
    rows = _rows(os.path.join(folder, "MCMC_samples_marker_effects_variances_geno.txt"))
    me = _rows(os.path.join(folder, "MCMC_samples_marker_effects_geno_y.txt"))
    assert len(rows) == len(me) - 1          # one row per saved sample
    for r in rows:
        assert len(r.split(",")) == geno.n_markers
        assert all(float(v) > 0 for v in r.split(","))


def test_mt_bayesb_variance_file_is_hcat_of_blocks(tmp_path):
    """MT BayesB: the reference writes hcat of the p per-locus (t,t) blocks —
    t rows of p*t values per saved sample (output.jl:471-473)."""
    sim = simulate_genomic_data_mt(n=150, p=24, n_qtl=6, h2=(0.5, 0.4),
                                   rg=0.6, re=0.2, seed=21)
    geno = get_genotypes(sim["genotypes"], method="BayesB",
                         Pi={(1.0, 1.0): 0.7, (0.0, 0.0): 0.3}, name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    folder = str(tmp_path / "mtbb")
    runMCMC(model, sim["phenotypes"], chain_length=60, burnin=10,
            output_samples_frequency=10, seed=8, output_folder=folder,
            printout_model_info=False)
    rows = _rows(os.path.join(folder, "MCMC_samples_marker_effects_variances_geno.txt"))
    me = _rows(os.path.join(folder, "MCMC_samples_marker_effects_geno_y1.txt"))
    n_saved = len(me) - 1
    t, p = 2, geno.n_markers
    assert len(rows) == n_saved * t          # t rows per saved sample
    for r in rows:
        assert len(r.split(",")) == p * t
    # each locus block is symmetric within a sample: row0[j*t+1] == row1[j*t]
    r0 = np.array([float(v) for v in rows[0].split(",")])
    r1 = np.array([float(v) for v in rows[1].split(",")])
    np.testing.assert_allclose(r0[1::t], r1[0::t], rtol=1e-6)


def test_sample_files_resume_appends(tmp_path):
    sim = simulate_genomic_data(n=100, p=40, n_qtl=5, h2=0.5, seed=7)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    folder = str(tmp_path / "r")
    runMCMC(model, sim["phenotypes"], chain_length=100, burnin=0,
            output_samples_frequency=10, seed=5, output_folder=folder,
            checkpoint_frequency=50, printout_model_info=False)
    n1 = len(_rows(os.path.join(folder, "MCMC_samples_residual_variance.txt")))
    geno2 = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model2 = build_model("y = intercept + geno", genotypes=geno2)
    runMCMC(model2, sim["phenotypes"], chain_length=200, burnin=0,
            output_samples_frequency=10, seed=5, output_folder=folder,
            resume=True, printout_model_info=False)
    n2 = len(_rows(os.path.join(folder, "MCMC_samples_residual_variance.txt")))
    assert n2 > n1
