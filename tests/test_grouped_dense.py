"""Group-sequential schedule for DENSE blocked sweeps (ops/markers.py:
grouped_dense_sweep) — the dense analogue of the packed grouped path.

The flat blocked sweeps update all nblocks in parallel per sync round; at
p >> n that stale set crosses the measured divergence boundary
(benchmarks/results/stability_sweep_r05.md). These tests pin (a) the
wrapper's exactness vs the flat sweep for a single group, (b) engine
config selection at p >> n, and (c) end-to-end signal recovery for ST and
MT dense models at p >> n where the flat schedule diverges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from jwas_tpu.ops import markers as mk


def _dense_problem(n=64, p=256, b=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.binomial(2, 0.4, size=(n, p)).astype(np.float32)
    X = X - X.mean(axis=0)
    beta = rng.normal(size=p) * (rng.uniform(size=p) < 0.1)
    y = (X @ beta + rng.normal(size=n)).astype(np.float32)
    md = mk.build_marker_blocks(jnp.asarray(X), block_size=b)
    return md, jnp.asarray(y), X, beta


def test_single_group_equals_flat_sweep():
    """ngroups == 1: the wrapper reproduces the flat sweep bit-for-bit with
    key = fold_in(key, 0) (the documented key convention)."""
    md, y, X, _ = _dense_problem()
    p_pad = md.X.shape[1]
    b, _, nblocks = md.grams.shape
    key = jax.random.PRNGKey(3)
    alpha = jnp.zeros((p_pad,), jnp.float32)
    beta = jnp.zeros((p_pad,), jnp.float32)
    delta = jnp.ones((p_pad,), jnp.int32)
    pi = jnp.full((p_pad,), 0.9, jnp.float32)
    vare = jnp.asarray(1.0, jnp.float32)
    varg = jnp.asarray(0.05, jnp.float32)

    flat = mk.sweep_blocks_abc(
        md, alpha, beta, delta, y, None, vare, varg, pi,
        jax.random.fold_in(key, 0), nreps=4, sync_every=2,
    )

    def cg(md_g, sts, yc, g, kg):
        a, be, d, pi_g = sts
        a, be, d, yc = mk.sweep_blocks_abc(
            md_g, a, be, d, yc, None, vare, varg, pi_g, kg,
            nreps=4, sync_every=2,
        )
        return (a, be, d, pi_g), yc

    out, yc = mk.grouped_dense_sweep(
        cg, md, (alpha, beta, delta, pi), y, key, nblocks
    )
    for a, b_ in zip(flat[:3], out[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    np.testing.assert_array_equal(np.asarray(flat[3]), np.asarray(yc))


def test_stable_group_blocks_rule():
    assert mk.stable_group_blocks(10_000, 8, 100) == 0      # flat fine
    gb = mk.stable_group_blocks(200, 8, 400)                # cap = 10 blocks
    assert 0 < gb <= 10 and 400 % gb == 0
    gb2 = mk.stable_group_blocks(50_000, 128, 16_384)
    assert gb2 in (0, 128) or 16_384 % gb2 == 0


def test_st_dense_engine_recovers_at_p_much_greater_than_n():
    """runMCMC on a dense BayesC model with p/n = 16 (flat stale set q=16,
    far past the divergence boundary): the engine must select the grouped
    dense schedule and recover the signal."""
    from jwas_tpu import build_model, get_genotypes, runMCMC
    from jwas_tpu.engine import mcmc as eng

    rng = np.random.default_rng(9)
    n, p = 200, 3200
    X = rng.binomial(2, 0.35, size=(n, p)).astype(np.float64)
    beta = np.zeros(p)
    qtl = rng.choice(p, 20, replace=False)
    beta[qtl] = rng.normal(size=20)
    g = (X - X.mean(0)) @ beta
    y = g + rng.normal(size=n) * g.std()
    ids = [f"i{k}" for k in range(n)]
    geno_df = pd.DataFrame(X, columns=[f"m{j}" for j in range(p)])
    geno_df.insert(0, "ID", ids)
    pheno = pd.DataFrame({"ID": ids, "y": y})

    seen = {}
    orig = eng.make_run_window

    def spy(cfg):
        seen["group_blocks"] = cfg.group_blocks
        return orig(cfg)

    geno = get_genotypes(geno_df, method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    eng.make_run_window = spy
    try:
        out = runMCMC(model, pheno, chain_length=800, burnin=200, seed=7,
                      fast_blocks=8, output_folder="",
                      printout_model_info=False)
    finally:
        eng.make_run_window = orig
    assert seen["group_blocks"] > 0, "engine did not pick the grouped schedule"
    vare_est = float(out["residual variance"]["Estimate"].iloc[0])
    assert np.isfinite(vare_est) and vare_est < 4 * g.var(), vare_est
    acc = np.corrcoef(out["EBV_y"].EBV, g)[0, 1]
    assert acc > 0.55, acc


def test_mt_dense_engine_recovers_at_p_much_greater_than_n():
    """Two-trait dense BayesC at p/n = 8: the MT engine selects the grouped
    schedule (the round-5 MT bench initially measured NEGATIVE accuracy on
    the flat schedule at this regime)."""
    from jwas_tpu import build_model, get_genotypes, runMCMC
    from jwas_tpu.engine import mcmc_mt as engmt

    rng = np.random.default_rng(12)
    n, p = 240, 1920
    X = rng.binomial(2, 0.4, size=(n, p)).astype(np.float64)
    Xc = X - X.mean(0)
    qtl = rng.choice(p, 16, replace=False)
    e1 = np.zeros(p)
    e2 = np.zeros(p)
    e1[qtl] = rng.normal(size=16)
    e2[qtl] = 0.7 * e1[qtl] + 0.5 * rng.normal(size=16)
    g1, g2 = Xc @ e1, Xc @ e2
    y1 = g1 + rng.normal(size=n) * g1.std()
    y2 = g2 + rng.normal(size=n) * g2.std()
    ids = [f"i{k}" for k in range(n)]
    geno_df = pd.DataFrame(X, columns=[f"m{j}" for j in range(p)])
    geno_df.insert(0, "ID", ids)
    pheno = pd.DataFrame({"ID": ids, "y1": y1, "y2": y2})

    seen = {}
    orig = engmt.make_mt_run_window

    def spy(cfg):
        seen["group_blocks"] = cfg.group_blocks
        return orig(cfg)

    geno = get_genotypes(geno_df, method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    engmt.make_mt_run_window = spy
    try:
        out = runMCMC(model, pheno, chain_length=600, burnin=150, seed=4,
                      fast_blocks=8, output_folder="",
                      printout_model_info=False)
    finally:
        engmt.make_mt_run_window = orig
    assert seen["group_blocks"] > 0
    acc1 = np.corrcoef(out["EBV_y1"].EBV, g1)[0, 1]
    acc2 = np.corrcoef(out["EBV_y2"].EBV, g2)[0, 1]
    assert acc1 > 0.5 and acc2 > 0.5, (acc1, acc2)
