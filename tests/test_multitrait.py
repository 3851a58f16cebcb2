"""Multi-trait sampler tests.

Kernel exactness mirrors the reference's strongest pattern
(test_multitrait_mcmc.jl:6-60): a one-marker 2-trait BayesC model has an
analytically computable posterior over the 4 inclusion states; sampler II
draws from it directly, sampler I's chain must converge to it.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import multivariate_normal

from jwas_tpu.ops import markers as mk
from jwas_tpu.ops import multitrait as mt


def _one_marker_mt(seed=0, n=25):
    rng = np.random.default_rng(seed)
    x = rng.binomial(2, 0.4, size=n).astype(np.float64)
    x = x - x.mean()
    R = np.array([[1.0, 0.3], [0.3, 0.8]])
    G = np.array([[0.5, 0.2], [0.2, 0.4]])
    eff = np.array([0.7, -0.5])
    err = rng.multivariate_normal(np.zeros(2), R, size=n)
    Y = x[:, None] * eff[None, :] + err          # (n, 2)
    return x, Y.T, R, G


def _analytic_state_posterior(x, Ycorr, R, G, pi_vec):
    """P(state | y) for states indexed s = d1 + 2 d2 (bit k = trait k)."""
    n = len(x)
    y = Ycorr.reshape(-1)  # trait-major (t*n,)
    logps = []
    for s in range(4):
        d = np.array([s & 1, (s >> 1) & 1], dtype=np.float64)
        D = np.diag(d)
        cov = np.kron(D @ G @ D, np.outer(x, x)) + np.kron(R, np.eye(n))
        logps.append(np.log(max(pi_vec[s], 1e-300)) +
                     multivariate_normal.logpdf(y, np.zeros(2 * n), cov))
    logps = np.array(logps)
    pr = np.exp(logps - logps.max())
    return pr / pr.sum()


def test_mt_samplerII_single_marker_exact():
    x, Ycorr, R, G = _one_marker_mt()
    pi_vec = np.array([0.25, 0.25, 0.25, 0.25])
    truth = _analytic_state_posterior(x, Ycorr, R, G, pi_vec)

    X = jnp.asarray(x[:, None], jnp.float32)
    xpx = jnp.asarray([x @ x], jnp.float32)
    ginv = jnp.linalg.inv(jnp.asarray(G, jnp.float32))

    def one(key):
        a0 = jnp.zeros((2, 1), jnp.float32)
        d0 = jnp.zeros((2, 1), jnp.float32)
        a, b, d, yc = mt.mt_abc_exact_II(
            X, xpx, a0, a0, d0, jnp.asarray(Ycorr, jnp.float32), None,
            jnp.asarray(R, jnp.float32), ginv, jnp.asarray(pi_vec, jnp.float32), key,
        )
        return mt.pattern_index(d[:, 0:1])[0]

    states = np.asarray(jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), 8000)))
    freq = np.bincount(states, minlength=4) / len(states)
    np.testing.assert_allclose(freq, truth, atol=0.025)


def test_mt_samplerI_chain_converges_to_exact_posterior():
    x, Ycorr, R, G = _one_marker_mt(seed=1)
    pi_vec = np.array([0.25, 0.25, 0.25, 0.25])
    truth = _analytic_state_posterior(x, Ycorr, R, G, pi_vec)

    X = jnp.asarray(x[:, None], jnp.float32)
    xpx = jnp.asarray([x @ x], jnp.float32)
    ginv = jnp.linalg.inv(jnp.asarray(G, jnp.float32))
    Y0 = jnp.asarray(Ycorr, jnp.float32)

    def body(carry, key):
        a, b, d, yc = carry
        a, b, d, yc = mt.mt_abc_exact_I(
            X, xpx, a, b, d, yc, None, jnp.asarray(R, jnp.float32), ginv,
            jnp.asarray(pi_vec, jnp.float32), key,
        )
        return (a, b, d, yc), mt.pattern_index(d[:, 0:1])[0]

    init = (jnp.zeros((2, 1), jnp.float32), jnp.zeros((2, 1), jnp.float32),
            jnp.zeros((2, 1), jnp.float32), Y0)
    _, states = jax.lax.scan(body, init, jax.random.split(jax.random.PRNGKey(2), 20000))
    states = np.asarray(states[2000:])
    freq = np.bincount(states, minlength=4) / len(states)
    np.testing.assert_allclose(freq, truth, atol=0.04)


def test_mt_c0l_single_marker_moments():
    x, Ycorr, R, G = _one_marker_mt(seed=2)
    Rinv = np.linalg.inv(R)
    Ginv = np.linalg.inv(G)
    w = Ycorr @ x  # (2,)
    # stationary distribution of the within-marker Gibbs: N(inv(L)Rinv w, inv(L))
    L = (x @ x) * Rinv + Ginv
    mean_true = np.linalg.solve(L, Rinv @ w)
    cov_true = np.linalg.inv(L)

    X = jnp.asarray(x[:, None], jnp.float32)
    xpx = jnp.asarray([x @ x], jnp.float32)

    def body(carry, key):
        a, yc = carry
        a, yc = mt.mt_c0l_exact(
            X, xpx, a, yc, None, jnp.asarray(R, jnp.float32),
            jnp.asarray(Ginv, jnp.float32), jnp.ones((1,), jnp.float32), key,
        )
        return (a, yc), a[:, 0]

    init = (jnp.zeros((2, 1), jnp.float32), jnp.asarray(Ycorr, jnp.float32))
    _, draws = jax.lax.scan(body, init, jax.random.split(jax.random.PRNGKey(3), 20000))
    draws = np.asarray(draws[2000:])
    np.testing.assert_allclose(draws.mean(axis=0), mean_true, atol=0.03)
    np.testing.assert_allclose(np.cov(draws.T), cov_true, atol=0.03)


def test_mt_blocked_matches_exact_small():
    rng = np.random.default_rng(4)
    n, p, t = 50, 12, 2
    X = rng.binomial(2, 0.4, size=(n, p)).astype(np.float64)
    X -= X.mean(axis=0)
    R = np.array([[1.0, 0.2], [0.2, 0.9]])
    G = np.array([[0.4, 0.1], [0.1, 0.3]])
    eff = rng.normal(0, 0.5, (p, t))
    Y = (X @ eff + rng.multivariate_normal(np.zeros(t), R, size=n)).T
    pi_vec = jnp.asarray([0.25, 0.25, 0.25, 0.25], jnp.float32)
    ginv = jnp.linalg.inv(jnp.asarray(G, jnp.float32))
    Rj = jnp.asarray(R, jnp.float32)
    Xj = jnp.asarray(X, jnp.float32)
    xpx = jnp.einsum("np,np->p", Xj, Xj)
    md = mk.build_marker_blocks(Xj, block_size=8)
    p_pad = md.X.shape[1]

    def run(sweep, iters, blocked):
        def body(carry, key):
            a, b, d, yc = carry
            if blocked:
                a, b, d, yc = sweep(md, a, b, d, yc, None, Rj, ginv, pi_vec, key, nreps=1)
            else:
                a, b, d, yc = sweep(Xj, xpx, a, b, d, yc, None, Rj, ginv, pi_vec, key)
            return (a, b, d, yc), a[:, :p]

        sz = p_pad if blocked else p
        init = (jnp.zeros((t, sz), jnp.float32), jnp.zeros((t, sz), jnp.float32),
                jnp.zeros((t, sz), jnp.float32), jnp.asarray(Y, jnp.float32))
        _, alphas = jax.lax.scan(body, init, jax.random.split(jax.random.PRNGKey(5), iters))
        return np.asarray(alphas[iters // 4:]).mean(axis=0)

    m_exact = run(mt.mt_abc_exact_I, 4000, False)
    m_block = run(mt.mt_abc_blocks_I, 4000, True)
    corr = np.corrcoef(m_exact.reshape(-1), m_block.reshape(-1))[0, 1]
    assert corr > 0.97, corr


def test_mt_gblup_moments():
    rng = np.random.default_rng(6)
    n, t = 15, 2
    M = rng.normal(size=(n, n))
    Grm = M @ M.T / n + 0.01 * np.eye(n)
    evals, evecs = np.linalg.eigh(Grm)
    D = np.abs(evals)
    L = evecs
    R = np.array([[1.0, 0.2], [0.2, 0.8]])
    Gv = np.array([[0.6, 0.2], [0.2, 0.5]])
    Y = rng.normal(size=(t, n))

    iR0 = np.linalg.inv(R)
    iGM = np.linalg.inv(Gv)
    RHS = (L.T @ Y.T) @ iR0   # (n, t)
    means = np.zeros((n, t))
    for i in range(n):
        lhs = iR0 + iGM / D[i]
        means[i] = np.linalg.solve(lhs, RHS[i])

    def one(key):
        a, yc = mt.mt_gblup(
            jnp.asarray(L, jnp.float32), jnp.asarray(D, jnp.float32),
            jnp.zeros((t, n), jnp.float32), jnp.asarray(Y, jnp.float32), None,
            jnp.asarray(R, jnp.float32), jnp.asarray(Gv, jnp.float32), key,
        )
        return a

    draws = np.asarray(jax.vmap(one)(jax.random.split(jax.random.PRNGKey(7), 4000)))
    np.testing.assert_allclose(draws.mean(axis=0).T, means, atol=0.06)
