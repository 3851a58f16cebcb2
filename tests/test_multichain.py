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
