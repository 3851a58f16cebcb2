"""Kernel-exactness tests for the marker samplers.

Follows the strongest test pattern of the reference suite (SURVEY.md §4,
test/unit/test_multitrait_mcmc.jl:6-60): for a one-marker model the Gibbs
conditional IS the exact posterior, so empirical frequencies from many
independent kernel invocations must match analytic posterior probabilities
computed from marginal likelihoods.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import multivariate_normal

from jwas_tpu.ops import markers as mk


def _one_marker_data(seed=0, n=30, vare=1.0, varg=0.5, effect=0.8):
    rng = np.random.default_rng(seed)
    x = rng.binomial(2, 0.4, size=n).astype(np.float64)
    x = x - x.mean()
    y = effect * x + rng.normal(0, np.sqrt(vare), n)
    return x, y


def _analytic_p_include(x, y, vare, varg, pi):
    n = len(y)
    m1 = multivariate_normal.logpdf(y, mean=np.zeros(n), cov=varg * np.outer(x, x) + vare * np.eye(n))
    m0 = multivariate_normal.logpdf(y, mean=np.zeros(n), cov=vare * np.eye(n))
    l1 = np.log(1 - pi) + m1
    l0 = np.log(pi) + m0
    return 1.0 / (1.0 + np.exp(l0 - l1))


def test_bayesc_single_marker_exact_posterior():
    vare, varg, pi = 1.0, 0.5, 0.6
    x, y = _one_marker_data(0, 30, vare, varg)
    p_inc = _analytic_p_include(x, y, vare, varg, pi)

    X = jnp.asarray(x[:, None], jnp.float32)
    xpx = jnp.asarray([x @ x], jnp.float32)
    n_rep = 8000

    def one(key):
        a0 = jnp.zeros((1,), jnp.float32)
        d0 = jnp.zeros((1,), jnp.int32)
        ycorr = jnp.asarray(y, jnp.float32)
        a, b, d, yc = mk.sweep_exact_abc(
            X, xpx, a0, a0, d0, ycorr, None, vare, varg,
            jnp.asarray([pi], jnp.float32), key,
        )
        return d[0]

    ds = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(1), n_rep))
    freq = float(jnp.mean(ds.astype(jnp.float32)))
    assert abs(freq - p_inc) < 0.02, (freq, p_inc)


def test_bayesc_blocked_matches_exact_distribution():
    vare, varg, pi = 1.0, 0.5, 0.6
    x, y = _one_marker_data(0, 30, vare, varg)
    p_inc = _analytic_p_include(x, y, vare, varg, pi)

    md = mk.build_marker_blocks(jnp.asarray(x[:, None], jnp.float32), block_size=8)
    p_pad = md.X.shape[1]
    pi_vec = jnp.ones((p_pad,), jnp.float32).at[0].set(pi)

    def one(key):
        a0 = jnp.zeros((p_pad,), jnp.float32)
        d0 = jnp.zeros((p_pad,), jnp.int32)
        a, b, d, yc = mk.sweep_blocks_abc(
            md, a0, a0, d0, jnp.asarray(y, jnp.float32), None, vare, varg,
            pi_vec, key, nreps=1,
        )
        return d[0], jnp.sum(jnp.abs(a[1:]))

    ds, pad_mass = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(2), 8000))
    assert float(pad_mass.max()) == 0.0  # padded markers stay at zero
    freq = float(jnp.mean(ds.astype(jnp.float32)))
    assert abs(freq - p_inc) < 0.02, (freq, p_inc)


def test_rrblup_single_marker_conditional():
    vare, varg = 1.0, 0.5
    x, y = _one_marker_data(1, 40, vare, varg, effect=0.5)
    lam = vare / varg
    mean_true = (x @ y) / (x @ x + lam)
    var_true = vare / (x @ x + lam)

    X = jnp.asarray(x[:, None], jnp.float32)
    xpx = jnp.asarray([x @ x], jnp.float32)

    def one(key):
        a, yc = mk.sweep_exact_c0l(
            X, xpx, jnp.zeros((1,), jnp.float32), jnp.asarray(y, jnp.float32),
            None, vare, varg, jnp.ones((1,), jnp.float32), key,
        )
        return a[0]

    draws = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(3), 8000))
    assert abs(float(draws.mean()) - mean_true) < 0.02
    assert abs(float(draws.var()) - var_true) < 0.02


def test_bayesr_single_marker_class_posterior():
    vare, sigma = 1.0, 2.0
    x, y = _one_marker_data(2, 40, vare, 0.5, effect=0.6)
    pi = np.array([0.25, 0.25, 0.25, 0.25])
    n = len(y)
    logps = []
    for k, g in enumerate(mk.BAYESR_GAMMA):
        cov = g * sigma * np.outer(x, x) + vare * np.eye(n)
        logps.append(np.log(pi[k]) + multivariate_normal.logpdf(y, np.zeros(n), cov))
    logps = np.array(logps)
    probs_true = np.exp(logps - logps.max())
    probs_true /= probs_true.sum()

    X = jnp.asarray(x[:, None], jnp.float32)
    xpx = jnp.asarray([x @ x], jnp.float32)
    pi_mat = jnp.asarray(pi[None, :], jnp.float32)

    def one(key):
        a, d, yc = mk.sweep_exact_bayesr(
            X, xpx, jnp.zeros((1,), jnp.float32), jnp.zeros((1,), jnp.int32),
            jnp.asarray(y, jnp.float32), None, vare, sigma, pi_mat, key,
        )
        return d[0]

    ds = np.asarray(jax.vmap(one)(jax.random.split(jax.random.PRNGKey(4), 10000)))
    freq = np.bincount(ds, minlength=4) / len(ds)
    np.testing.assert_allclose(freq, probs_true, atol=0.02)


def test_blocked_sweep_matches_exact_posterior_mean_small():
    """Multi-marker: blocked (nreps=1) and exact sweeps target the same
    stationary distribution; compare posterior means over a long chain."""
    rng = np.random.default_rng(5)
    n, p = 60, 16
    X = rng.binomial(2, 0.4, size=(n, p)).astype(np.float64)
    X -= X.mean(axis=0)
    beta_true = rng.normal(0, 0.4, p)
    y = X @ beta_true + rng.normal(0, 1.0, n)
    vare, varg, pi = 1.0, 0.3, 0.5

    Xj = jnp.asarray(X, jnp.float32)
    xpx = jnp.einsum("np,np->p", Xj, Xj)
    pi_vec = jnp.full((p,), pi, jnp.float32)

    def run_exact(key, iters=4000):
        def body(carry, k):
            a, b, d, yc = carry
            a, b, d, yc = mk.sweep_exact_abc(Xj, xpx, a, b, d, yc, None, vare, varg, pi_vec, k)
            return (a, b, d, yc), a
        init = (jnp.zeros((p,), jnp.float32), jnp.zeros((p,), jnp.float32),
                jnp.zeros((p,), jnp.int32), jnp.asarray(y, jnp.float32))
        _, alphas = jax.lax.scan(body, init, jax.random.split(key, iters))
        return alphas[1000:].mean(axis=0)

    md = mk.build_marker_blocks(Xj, block_size=8)
    p_pad = md.X.shape[1]
    pi_pad = jnp.ones((p_pad,), jnp.float32).at[:p].set(pi)

    def run_block(key, iters=4000):
        def body(carry, k):
            a, b, d, yc = carry
            a, b, d, yc = mk.sweep_blocks_abc(md, a, b, d, yc, None, vare, varg, pi_pad, k, nreps=1)
            return (a, b, d, yc), a[:p]
        init = (jnp.zeros((p_pad,), jnp.float32), jnp.zeros((p_pad,), jnp.float32),
                jnp.zeros((p_pad,), jnp.int32), jnp.asarray(y, jnp.float32))
        _, alphas = jax.lax.scan(body, init, jax.random.split(key, iters))
        return alphas[1000:].mean(axis=0)

    m_exact = np.asarray(run_exact(jax.random.PRNGKey(6)))
    m_block = np.asarray(run_block(jax.random.PRNGKey(7)))
    corr = np.corrcoef(m_exact, m_block)[0, 1]
    assert corr > 0.98, corr
    np.testing.assert_allclose(m_block, m_exact, atol=0.08)


def test_gblup_sweep_conditional():
    """GBLUP joint update: with orthonormal L the conditional of alpha is
    exactly N(L'y d/(d + vare/varg... ) — verify mean/var elementwise."""
    rng = np.random.default_rng(8)
    n = 20
    M = rng.normal(size=(n, n))
    G = M @ M.T / n + np.eye(n) * 0.01
    evals, evecs = np.linalg.eigh(G)
    D = np.abs(evals)
    L = evecs
    y = rng.normal(size=n)
    vare, varg = 1.0, 0.7

    lhs = 1.0 + vare / (varg * D)
    mean_true = (L.T @ y) / lhs
    var_true = vare / lhs

    def one(key):
        a, yc = mk.sweep_gblup(
            jnp.asarray(L, jnp.float32), jnp.asarray(D, jnp.float32),
            jnp.zeros((n,), jnp.float32), jnp.asarray(y, jnp.float32),
            None, vare, varg, key,
        )
        return a

    draws = np.asarray(jax.vmap(one)(jax.random.split(jax.random.PRNGKey(9), 6000)))
    np.testing.assert_allclose(draws.mean(axis=0), mean_true, atol=0.05)
    np.testing.assert_allclose(draws.var(axis=0), var_true, atol=0.05)
