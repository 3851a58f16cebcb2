"""Distribution samplers: moment checks against known values."""

import jax
import jax.numpy as jnp
import numpy as np

from jwas_tpu.ops import dists


def test_scaled_inv_chi2_mean():
    key = jax.random.PRNGKey(0)
    df, scale = 10.0, 2.0
    keys = jax.random.split(key, 20000)
    draws = jax.vmap(lambda k: dists.sample_scaled_inv_chi2(k, 0.0, 0.0, df, scale))(keys)
    # mean of scale-inv-chi2(df, scale) = df*scale/(df-2)
    assert np.isclose(float(draws.mean()), df * scale / (df - 2), rtol=0.05)


def test_sample_variance_posterior_concentrates():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (20000,)) * 3.0
    v = dists.sample_variance(jax.random.PRNGKey(2), x, x.shape[0], 4.0, 1.0)
    assert 8.0 < float(v) < 10.5


def test_inv_wishart_mean():
    key = jax.random.PRNGKey(3)
    scale = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    df = 12.0
    keys = jax.random.split(key, 4000)
    draws = jax.vmap(lambda k: dists.sample_inv_wishart(k, df, scale))(keys)
    # E[IW(df, S)] = S / (df - p - 1)
    expected = np.asarray(scale) / (df - 2 - 1)
    np.testing.assert_allclose(np.asarray(draws.mean(axis=0)), expected, rtol=0.1)


def test_wishart_mean():
    key = jax.random.PRNGKey(4)
    scale = jnp.array([[1.5, 0.3], [0.3, 0.8]])
    df = 7.0
    keys = jax.random.split(key, 4000)
    draws = jax.vmap(lambda k: dists.sample_wishart(k, df, scale))(keys)
    np.testing.assert_allclose(np.asarray(draws.mean(axis=0)), df * np.asarray(scale), rtol=0.1)


def test_pi_beta():
    # pi ~ Beta(p - k + 1, k + 1) concentrates near (p - k)/p for big p
    draws = jax.vmap(lambda k: dists.sample_pi_beta(k, 100.0, 1000.0))(
        jax.random.split(jax.random.PRNGKey(5), 2000)
    )
    assert np.isclose(float(draws.mean()), 0.9, atol=0.01)


def test_dirichlet_classes():
    delta = jnp.array([0, 0, 0, 1, 2, 3, 3, 3, 3, 3])
    draws = jax.vmap(lambda k: dists.sample_pi_dirichlet_classes(k, delta, 4))(
        jax.random.split(jax.random.PRNGKey(6), 2000)
    )
    m = np.asarray(draws.mean(axis=0))
    np.testing.assert_allclose(m, (np.array([3, 1, 1, 5]) + 1) / 14, atol=0.02)


def test_conditional_inv_wishart_unit_diag():
    key = jax.random.PRNGKey(7)
    prec = jnp.linalg.inv(jnp.array([[2.0, 0.3], [0.3, 1.5]]))
    mask = jnp.array([True, False])
    X = dists.sample_conditional_inv_wishart(key, 10.0, prec, mask)
    assert np.isclose(float(X[0, 0]), 1.0, atol=1e-6)
    assert float(X[1, 1]) != 1.0


def test_mvn_from_precision():
    key = jax.random.PRNGKey(8)
    P = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    rhs = jnp.array([1.0, 2.0])
    L = jnp.linalg.cholesky(P)
    draws = jax.vmap(lambda k: dists.sample_mvn_from_precision_chol(k, L, rhs))(
        jax.random.split(key, 20000)
    )
    mu = np.linalg.solve(np.asarray(P), np.asarray(rhs))
    np.testing.assert_allclose(np.asarray(draws.mean(axis=0)), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(np.asarray(draws).T), np.linalg.inv(P), atol=0.05)
