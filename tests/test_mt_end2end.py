"""End-to-end multi-trait runMCMC tests on simulated 2-trait data."""

import numpy as np
import pytest

from jwas_tpu import build_model, get_genotypes, runMCMC
from jwas_tpu.io.datasets import simulate_genomic_data_mt

SIM = simulate_genomic_data_mt(n=400, p=250, n_qtl=25, h2=(0.5, 0.4), rg=0.7,
                               re=0.2, seed=21)


def _run(method, chain_length=600, constraint=False, missing_frac=0.0,
         mt_sampler="I", fast_blocks=False, **kw):
    sim = SIM if missing_frac == 0.0 else simulate_genomic_data_mt(
        n=400, p=250, n_qtl=25, h2=(0.5, 0.4), rg=0.7, re=0.2, seed=21,
        missing_frac=missing_frac,
    )
    geno = get_genotypes(
        sim["genotypes"], method=method, name="geno", constraint=constraint,
        multi_trait_sampler=mt_sampler,
    )
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    out = runMCMC(
        model, sim["phenotypes"], chain_length=chain_length,
        burnin=chain_length // 5,
        output_samples_frequency=max(1, chain_length // 100),
        seed=11, fast_blocks=fast_blocks, output_folder="", **kw,
    )
    return out, sim


def _acc(out, sim, trait_i):
    ebv = out[f"EBV_y{trait_i+1}"].set_index("ID")["EBV"]
    ids = [f"ind{i+1}" for i in range(sim["true_bv"].shape[0])]
    return np.corrcoef(ebv.loc[ids].to_numpy(), sim["true_bv"][:, trait_i])[0, 1]


@pytest.mark.parametrize("method", ["BayesC", "RR-BLUP", "BayesL"])
def test_mt_methods_recover_bv(method):
    out, sim = _run(method)
    a1, a2 = _acc(out, sim, 0), _acc(out, sim, 1)
    assert a1 > 0.5 and a2 > 0.4, (method, a1, a2)
    rv = out["residual variance"].set_index("Covariance")["Estimate"]
    assert rv["y1_y1"] > 0


def test_mt_bayesc_samplerII():
    out, sim = _run("BayesC", mt_sampler="II", chain_length=400)
    assert _acc(out, sim, 0) > 0.5


def test_mt_mega_trait_constraint():
    out, sim = _run("BayesC", constraint=True)
    assert _acc(out, sim, 0) > 0.5
    # constraint pi is per trait
    assert len(out["pi_geno"]) == 2


def test_mt_missing_phenotypes():
    out, sim = _run("BayesC", missing_frac=0.3, chain_length=600)
    a1, a2 = _acc(out, sim, 0), _acc(out, sim, 1)
    assert a1 > 0.5, a1
    assert a2 > 0.3, a2


def test_mt_gblup():
    out, sim = _run("GBLUP", chain_length=400)
    assert _acc(out, sim, 0) > 0.45
    gv = out["genetic_variance"].set_index("Covariance")["Estimate"]
    assert gv["y1_y1"] > 0


def test_mt_fast_blocks():
    out, sim = _run("BayesC", chain_length=1200, fast_blocks=16, nreps=4)
    assert _acc(out, sim, 0) > 0.5


def test_mt_residual_covariance_recovery():
    out, sim = _run("RR-BLUP", chain_length=800)
    rv = out["residual variance"].set_index("Covariance")["Estimate"]
    Re = sim["Re"]
    assert abs(rv["y1_y2"] - Re[0, 1]) < max(1.0, 0.6 * abs(Re[0, 1]) + 0.5)
    assert 0.3 * Re[0, 0] < rv["y1_y1"] < 3.0 * Re[0, 0]


def test_mt_update_priors_frequency():
    """MT empirical-Bayes prior refresh (MCMC_BayesianAlphabet.jl:381-395)."""
    import numpy as np

    from jwas_tpu import build_model, get_genotypes, runMCMC
    from jwas_tpu.io.datasets import simulate_genomic_data_mt

    sim = simulate_genomic_data_mt(n=300, p=200, n_qtl=15, seed=5)
    geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    out = runMCMC(
        model, sim["phenotypes"], chain_length=400, burnin=80,
        output_samples_frequency=10, seed=7, update_priors_frequency=100,
        output_folder="",
    )
    R = out["residual variance"]
    assert np.all(np.isfinite(R["Estimate"].to_numpy(dtype=float)))


def test_mt_bayesb_per_locus_variances():
    """MT BayesB with per-locus (t, t) covariances
    (MTBayesABC.jl:37-52 locus_effect_variances + variance_components.jl:180-187):
    the chain must recover BVs and the per-locus variances must concentrate on
    the QTL."""
    out, sim = _run("BayesB", chain_length=800)
    a1, a2 = _acc(out, sim, 0), _acc(out, sim, 1)
    assert a1 > 0.5 and a2 > 0.4, (a1, a2)
    mv = out["marker effects variances geno"].set_index("Covariance")["Estimate"]
    assert mv["y1_y1"] > 0 and mv["y2_y2"] > 0


def test_mt_bayesb_samplerII_and_blocks():
    out, sim = _run("BayesB", mt_sampler="II", chain_length=500)
    assert _acc(out, sim, 0) > 0.5
    out, sim = _run("BayesB", chain_length=1200, fast_blocks=16, nreps=4)
    assert _acc(out, sim, 0) > 0.5


def test_mt_bayesb_mega_constraint():
    out, sim = _run("BayesB", constraint=True, chain_length=600)
    assert _acc(out, sim, 0) > 0.5


def test_mt_per_locus_ginv_matches_shared():
    """With every locus sharing the same G, the per-locus ginv code path must
    reproduce the shared-ginv path bitwise (same key => same draws)."""
    import jax
    import jax.numpy as jnp

    from jwas_tpu.ops import markers as mk
    from jwas_tpu.ops import multitrait as mt

    rng = np.random.default_rng(4)
    n, p, t, b = 40, 24, 2, 8
    X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    md = mk.build_marker_blocks(X, block_size=b)
    p_pad = md.X.shape[1]
    ycorr = jnp.asarray(rng.normal(size=(t, n)), jnp.float32)
    alpha = jnp.zeros((t, p_pad), jnp.float32)
    beta = alpha
    delta = jnp.ones((t, p_pad), jnp.float32)
    R = jnp.asarray([[1.0, 0.2], [0.2, 1.2]], jnp.float32)
    G = jnp.asarray([[0.05, 0.01], [0.01, 0.04]], jnp.float32)
    ginv = jnp.linalg.inv(G)
    ginv_p = jnp.broadcast_to(ginv[None], (p_pad, t, t))
    pi = jnp.asarray([0.5, 0.1, 0.1, 0.3], jnp.float32)
    key = jax.random.PRNGKey(3)

    for sweep in (mt.mt_abc_blocks_I, mt.mt_abc_blocks_II):
        a1, b1, d1, y1 = sweep(md, alpha, beta, delta, ycorr, None, R, ginv,
                               pi, key, nreps=2)
        a2, b2, d2, y2 = sweep(md, alpha, beta, delta, ycorr, None, R, ginv_p,
                               pi, key, nreps=2)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=0)
    for sweep in (mt.mt_abc_exact_I, mt.mt_abc_exact_II):
        a1, b1, d1, y1 = sweep(X, md.xpx[:p], alpha[:, :p], beta[:, :p],
                               delta[:, :p], ycorr, None, R, ginv, pi, key)
        a2, b2, d2, y2 = sweep(X, md.xpx[:p], alpha[:, :p], beta[:, :p],
                               delta[:, :p], ycorr, None, R,
                               jnp.broadcast_to(ginv[None], (p, t, t)), pi, key)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=0)
