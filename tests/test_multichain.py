"""Multi-chain MCMC tests (new capability vs the reference: chains are
first-class, vmapped in one jitted step, and feed PSRF directly)."""

import numpy as np

from jwas_tpu import build_model, get_genotypes, runMCMC
from jwas_tpu.io.datasets import simulate_genomic_data


def test_multichain_results_and_psrf():
    sim = simulate_genomic_data(n=300, p=120, n_qtl=12, h2=0.5, seed=61)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(model, sim["phenotypes"], chain_length=600, burnin=120,
                  seed=3, n_chains=3, output_samples_frequency=5,
                  output_folder="")
    acc = np.corrcoef(out["EBV_y"].EBV, sim["true_bv"])[0, 1]
    assert acc > 0.85, f"multi-chain EBV accuracy {acc:.3f}"
    psrf = out["PSRF"].set_index("parameter")["PSRF"]
    assert 0.8 < psrf["vare"] < 1.3, f"vare PSRF {psrf['vare']:.3f}"


def test_multichain_sharded_over_cpu_mesh():
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2])
    if len(devs) < 2:
        import pytest

        pytest.skip("needs >=2 devices")
    mesh = Mesh(devs, ("chains",))
    sim = simulate_genomic_data(n=200, p=60, n_qtl=8, h2=0.5, seed=62)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(model, sim["phenotypes"], chain_length=200, burnin=40,
                  seed=4, n_chains=2, mesh=mesh, output_folder="")
    acc = np.corrcoef(out["EBV_y"].EBV, sim["true_bv"])[0, 1]
    assert acc > 0.6


def test_mt_multichain_psrf_and_accuracy():
    """Multi-trait n_chains>1: vmapped chains, pooled posteriors, PSRF table
    (MT counterpart of the ST multichain path)."""
    from jwas_tpu import build_model, get_genotypes, runMCMC
    from jwas_tpu.io.datasets import simulate_genomic_data_mt
    from jwas_tpu.parallel.mesh import make_mesh

    sim = simulate_genomic_data_mt(n=300, p=128, n_qtl=15, h2=(0.5, 0.4),
                                   rg=0.6, re=0.2, seed=4)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    mesh = make_mesh(n_chains=2, n_marker_shards=4)
    out = runMCMC(model, sim["phenotypes"], chain_length=600, burnin=120,
                  output_samples_frequency=6, seed=17, n_chains=2,
                  mesh=mesh, output_folder="")
    assert "PSRF" in out and len(out["PSRF"]) >= 2
    assert np.isfinite(out["PSRF"].PSRF).all()
    assert (out["PSRF"].PSRF < 1.5).all(), out["PSRF"]
    for ti in range(2):
        ebv = out[f"EBV_y{ti+1}"].set_index("ID")["EBV"]
        ids = [f"ind{i+1}" for i in range(sim["true_bv"].shape[0])]
        acc = np.corrcoef(ebv.loc[ids].to_numpy(),
                          sim["true_bv"][:, ti])[0, 1]
        assert acc > 0.6, f"trait {ti} accuracy {acc:.3f}"


def test_st_multichain_sample_files_and_per_parameter_psrf(tmp_path):
    """ST n_chains>1 now streams the chain-0 sample-file set (parity with the
    MT multichain driver) and, with output_chain_samples=True, the full set
    per chain under chain_<k>/ — feeding per-parameter PSRF on location
    params and marker effects (the file-based refinement of
    convergence_diagnosis.jl:31-57)."""
    import os

    from jwas_tpu import PSRF_per_parameter, outputMCMCsamples

    sim = simulate_genomic_data(n=250, p=80, n_qtl=10, h2=0.5, seed=31)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    outputMCMCsamples(model, "intercept")
    folder = str(tmp_path / "mc_out")
    out = runMCMC(model, sim["phenotypes"], chain_length=400, burnin=80,
                  seed=11, n_chains=3, output_samples_frequency=8,
                  output_folder=folder, output_chain_samples=True)
    assert out["_chain_sample_folders"] == [
        os.path.join(folder, f"chain_{k}") for k in (1, 2, 3)
    ]
    # chain-0 top-level stream exists (parity with MT multichain)
    assert os.path.isfile(
        os.path.join(folder, "MCMC_samples_marker_effects_geno_y.txt")
    )
    # per-chain files are complete and DIFFER across chains
    f1 = os.path.join(folder, "chain_1", "MCMC_samples_residual_variance.txt")
    f2 = os.path.join(folder, "chain_2", "MCMC_samples_residual_variance.txt")
    c1 = open(f1).read().splitlines()
    c2 = open(f2).read().splitlines()
    assert len(c1) == len(c2) > 2 and c1[1:] != c2[1:]
    # per-parameter PSRF from the per-chain files: location + markers
    marker_files = [
        os.path.join(folder, f"chain_{k}", "MCMC_samples_marker_effects_geno_y.txt")
        for k in (1, 2, 3)
    ]
    psrf_m = PSRF_per_parameter(*marker_files, max_params=20)
    assert len(psrf_m) > 0 and np.isfinite(psrf_m.PSRF).all()
    assert (psrf_m.PSRF < 2.5).all()
    loc_files = [
        os.path.join(folder, f"chain_{k}", "MCMC_samples_y.intercept.txt")
        for k in (1, 2, 3)
    ]
    psrf_l = PSRF_per_parameter(*loc_files)
    assert len(psrf_l) == 1 and float(psrf_l.PSRF.iloc[0]) < 1.5


def test_mt_multichain_gencor_psrf():
    """MT multichain PSRF covers marker variance and per-trait-pair genetic
    correlations."""
    from jwas_tpu.io.datasets import simulate_genomic_data_mt

    sim = simulate_genomic_data_mt(n=250, p=96, n_qtl=12, h2=(0.5, 0.4),
                                   rg=0.6, re=0.2, seed=9)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    out = runMCMC(model, sim["phenotypes"], chain_length=400, burnin=80,
                  output_samples_frequency=8, seed=13, n_chains=2,
                  output_folder="")
    params = set(out["PSRF"].parameter)
    assert "gencor[0,1]" in params
    assert "varg[0]" in params or "varg[1]" in params
