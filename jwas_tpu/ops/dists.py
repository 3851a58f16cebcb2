"""Distribution sampling primitives used by the Gibbs samplers.

Implements, functionally in JAX, the conjugate draws of the reference engine
(reference: src/1.JWAS/src/variance_components.jl, src/1.JWAS/src/markers/Pi.jl):

- scaled-inverse-chi^2 draws for scalar variances,
- inverse-Wishart draws (via Bartlett decomposition) for covariance matrices,
- conditional inverse-Wishart draws with unit-variance constraints (binary traits),
- Beta / Dirichlet draws for inclusion probabilities pi.

All samplers are pure functions of a threefry PRNG key, so chains are exactly
reproducible across shardings and across runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_chi2(key, df):
    """Draw X ~ chi^2(df). df may be a traced scalar or array."""
    # chi2(k) == 2 * Gamma(k/2, scale=1)
    return 2.0 * jax.random.gamma(key, jnp.asarray(df) / 2.0)


def sample_scaled_inv_chi2(key, sse, n, df, scale):
    """One draw from the conditional posterior of a scalar variance.

    Matches `sample_variance` in the reference (variance_components.jl:60-66):
    returns (sse + df*scale) / chi2(n + df), where `sse` is the data sum of
    squares, `n` the effective number of observations, and (df, scale) the
    prior degrees of freedom and scale.
    """
    return (sse + df * scale) / sample_chi2(key, n + df)


def sample_variance(key, x, n, df, scale, invweights=None):
    """sigma^2 | x ~ scaled-inv-chi2 with SSE = x' diag(invweights) x."""
    x = jnp.asarray(x)
    if invweights is not None:
        sse = jnp.sum(x * x * invweights)
    else:
        sse = jnp.sum(x * x)
    return sample_scaled_inv_chi2(key, sse, n, df, scale)


def _standard_wishart_chol(key, df, dim, dtype):
    """Lower-triangular Bartlett factor A of a standard Wishart(df, I) draw.

    A has sqrt(chi2(df - i)) on the diagonal (i = 0..dim-1) and N(0,1) draws
    strictly below the diagonal, so that A @ A.T ~ Wishart(df, I).
    """
    key_diag, key_off = jax.random.split(key)
    dfs = df - jnp.arange(dim, dtype=dtype)
    diag = jnp.sqrt(sample_chi2(key_diag, dfs)).astype(dtype)
    normals = jax.random.normal(key_off, (dim, dim), dtype=dtype)
    lower = jnp.tril(normals, k=-1)
    return lower + jnp.diag(diag)


def sample_wishart(key, df, scale):
    """Draw W ~ Wishart(df, scale) via the Bartlett decomposition."""
    scale = jnp.asarray(scale)
    dim = scale.shape[0]
    L = jnp.linalg.cholesky(scale)
    A = _standard_wishart_chol(key, df, dim, scale.dtype)
    LA = L @ A
    return LA @ LA.T


def sample_inv_wishart(key, df, scale):
    """Draw X ~ InverseWishart(df, scale).

    X = inv(W) with W ~ Wishart(df, inv(scale)). Matches the parameterisation
    of Distributions.jl's `InverseWishart(df, scale)` used by the reference for
    multi-trait residual/genetic covariance draws (variance_components.jl:101).
    """
    scale = jnp.asarray(scale)
    dim = scale.shape[0]
    # Solve rather than forming inv(scale) explicitly for stability.
    scale_inv = jnp.linalg.solve(scale, jnp.eye(dim, dtype=scale.dtype))
    scale_inv = 0.5 * (scale_inv + scale_inv.T)
    W = sample_wishart(key, df, scale_inv)
    X = jnp.linalg.solve(W, jnp.eye(dim, dtype=scale.dtype))
    return 0.5 * (X + X.T)


def sample_conditional_inv_wishart(key, df, precision_scale, fixed_mask):
    """Inverse-Wishart draw with diagonal entries fixed to 1 for `fixed_mask`.

    Used for multi-trait models with binary traits whose residual variance is
    fixed at 1 (reference: categorical_and_censored_trait.jl:228-260). We draw
    an unconstrained inverse-Wishart sample from the given precision scale and
    rescale rows/cols so that the masked diagonal entries equal one. This keeps
    the draw a valid covariance matrix and matches the reference's intent of
    conditioning on unit variances for binary traits.

    precision_scale: inv(scale + SSE) as in the reference call site.
    fixed_mask: boolean (ntraits,) — True where the variance is pinned at 1.
    """
    dim = precision_scale.shape[0]
    scale = jnp.linalg.solve(precision_scale, jnp.eye(dim, dtype=precision_scale.dtype))
    scale = 0.5 * (scale + scale.T)
    X = sample_inv_wishart(key, df, scale)
    d = jnp.sqrt(jnp.diagonal(X))
    s = jnp.where(fixed_mask, 1.0 / d, 1.0)
    return X * s[:, None] * s[None, :]


def sample_beta(key, a, b):
    return jax.random.beta(key, a, b)


def sample_pi_beta(key, n_included, n_total):
    """pi | delta ~ Beta(nTotal - nIncluded + 1, nIncluded + 1).

    NOTE pi is the prior probability of EXCLUSION (zero effect), following the
    reference (markers/Pi.jl:7-9).
    """
    return jax.random.beta(key, n_total - n_included + 1.0, n_included + 1.0)


def sample_dirichlet(key, alpha):
    return jax.random.dirichlet(key, alpha)


def sample_pi_dirichlet_classes(key, delta, nclasses):
    """pi over mixture classes | delta ~ Dirichlet(counts + 1).

    `delta` holds integer class labels in [0, nclasses). Matches
    markers/Pi.jl:11-17 (reference labels are 1-based; ours are 0-based).
    """
    counts = jnp.zeros((nclasses,), dtype=jnp.float32).at[delta].add(1.0)
    return jax.random.dirichlet(key, counts + 1.0)


def sample_mvn_from_precision_chol(key, chol_precision, rhs):
    """Draw x ~ N(mu, inv(P)) given L = chol(P) (lower) and rhs with mu = inv(P) rhs.

    Standard trick: mu = L^-T L^-1 rhs; x = mu + L^-T z, z ~ N(0, I).
    """
    z = jax.random.normal(key, rhs.shape, dtype=rhs.dtype)
    w = jax.scipy.linalg.solve_triangular(chol_precision, rhs, lower=True)
    mu_plus = jax.scipy.linalg.solve_triangular(
        chol_precision.T, w + z, lower=False
    )
    return mu_plus


def sample_truncated_normal(key, mean, std, lower, upper):
    """Draw from N(mean, std^2) truncated to (lower, upper)."""
    a = (lower - mean) / std
    b = (upper - mean) / std
    z = jax.random.truncated_normal(key, a, b, shape=jnp.shape(mean))
    return mean + std * z
