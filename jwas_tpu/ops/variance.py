"""Variance-component and inclusion-probability samplers.

Functional JAX equivalents of the reference variance machinery (reference:
src/1.JWAS/src/variance_components.jl, markers/Pi.jl): marker-effect variance
per Bayesian-alphabet method, the BayesL local-shrinkage Metropolis-Hastings
step, pi draws, prior-scale draws, random-effect covariance draws, and the
residual variance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jwas_tpu.ops.dists import (
    sample_chi2,
    sample_inv_wishart,
    sample_pi_beta,
    sample_scaled_inv_chi2,
)

# kept as a host tuple and converted at trace time: a module-level jnp.array
# would freeze float32-rounded values when imported before x64 is enabled,
# breaking float64 parity replays
BAYESR_GAMMA = (0.0, 0.01, 0.1, 1.0)


def sample_residual_variance_st(key, ycorr, n_obs, df, scale, invweights=None):
    """Single-trait residual variance (variance_components.jl:60-66).

    n_obs counts real observations (ycorr may be padded with zeros; zeros do
    not change the SSE).
    """
    if invweights is not None:
        sse = jnp.sum(ycorr * ycorr * invweights)
    else:
        sse = jnp.sum(ycorr * ycorr)
    return sample_scaled_inv_chi2(key, sse, n_obs, df, scale)


def sample_marker_variance_common(key, alpha, n_loci, df, scale, invweights=None):
    """sigma_alpha^2 for BayesC (n_loci = sum delta) / RR-BLUP / BayesL / GBLUP.

    variance_components.jl:159-163. `alpha` includes zeros for excluded
    markers, matching the reference's use of the full alpha vector.
    """
    if invweights is not None:
        sse = jnp.sum(alpha * alpha * invweights)
    else:
        sse = jnp.sum(alpha * alpha)
    return sample_scaled_inv_chi2(key, sse, n_loci, df, scale)


def sample_marker_variance_bayesb(key, beta, df, scale):
    """Per-marker variances for BayesB (variance_components.jl:169-172)."""
    chi = sample_chi2(key, jnp.full(beta.shape, 1.0 + df))
    return (beta * beta + df * scale) / chi


def bayesr_sigma_sufficient_statistics(alpha, delta):
    """(ssq, nnz) for the BayesR shared sigma^2 draw
    (bayesr_sigma_sufficient_statistics, variance_components.jl:68-79):
    ssq = sum_{delta>0} alpha^2 / gamma_delta over 0-based class labels,
    nnz = count of markers in nonzero classes."""
    gamma = jnp.asarray(BAYESR_GAMMA, dtype=alpha.dtype)
    nz = delta > 0
    g = gamma[jnp.clip(delta, 1, 3)]
    ssq = jnp.sum(jnp.where(nz, alpha * alpha / g, 0.0))
    nnz = jnp.sum(nz)
    return ssq, nnz


def sample_marker_variance_bayesr(key, alpha, delta, df, scale):
    """BayesR shared sigma^2 (variance_components.jl:68-79, :166-168).

    SSE = sum_{delta>0} alpha^2 / gamma_delta, df counts markers in nonzero
    classes. delta holds 0-based class labels (0 = null class).
    """
    ssq, nnz = bayesr_sigma_sufficient_statistics(alpha, delta)
    return sample_scaled_inv_chi2(key, ssq, nnz, df, scale)


def sample_bayesl_gamma(key, gamma_arr, alpha, var_eff, valid=None):
    """Metropolis-Hastings update of BayesL local shrinkage gamma_j.

    variance_components.jl:191-218 (single-trait path): candidate
    1/Gamma(0.5, 4), acceptance prob exp(Q/4 (2/gamma - candidate)) with
    Q_j = alpha_j^2 / sigma^2.
    """
    kq, kc, ku = jax.random.split(key, 3)
    del kq
    Q = alpha * alpha / var_eff
    candidate = 1.0 / (jax.random.gamma(kc, jnp.full(gamma_arr.shape, 0.5)) * 4.0)
    u = jax.random.uniform(ku, gamma_arr.shape, dtype=gamma_arr.dtype)
    accept_prob = jnp.exp(Q / 4.0 * (2.0 / gamma_arr - candidate))
    new = jnp.where(u < accept_prob, 2.0 / candidate, gamma_arr)
    if valid is not None:
        new = jnp.where(valid > 0, new, 1.0)
    return new


def sample_pi_abc(key, delta, n_markers, valid=None):
    """pi for BayesB/C: Beta(p - k + 1, k + 1), k = sum delta (Pi.jl:7-9)."""
    if valid is not None:
        k = jnp.sum(jnp.where(valid > 0, delta, 0))
    else:
        k = jnp.sum(delta)
    return sample_pi_beta(key, k.astype(jnp.float32), jnp.asarray(n_markers, jnp.float32))


def sample_pi_bayesr(key, delta, valid=None):
    """pi over the 4 BayesR classes: Dirichlet(counts + 1) (Pi.jl:11-17)."""
    w = jnp.ones(delta.shape, jnp.float32) if valid is None else (valid > 0).astype(jnp.float32)
    counts = jnp.zeros((4,), jnp.float32).at[jnp.clip(delta, 0, 3)].add(w)
    return jax.random.dirichlet(key, counts + 1.0)


def sample_scale_st(key, var_eff, df):
    """Prior-scale draw for the marker-effect variance (single-trait).

    MCMC_BayesianAlphabet.jl:330-336: Gamma(a, 1/b) with
    a = m*df/2 + 1, b = sum(df / (2 var)) + 1, m = #variances.
    """
    v = jnp.atleast_1d(var_eff)
    a = v.shape[0] * df / 2.0 + 1.0
    b = jnp.sum(df / (2.0 * v)) + 1.0
    return jax.random.gamma(key, a) / b


def sample_random_effect_vc(key, sols, Vinv_dense, df, scale):
    """Covariance of one random-effect group (sampleVCs, variance_components.jl:115-147).

    sols: (k, q) stacked solutions of the k correlated terms in the group.
    Vinv_dense: (q, q) structure matrix (identity for i.i.d.).
    Returns a (k, k) InverseWishart draw of G0 with posterior df df + q.
    """
    k, q = sols.shape
    if Vinv_dense is None:
        S = sols @ sols.T
    else:
        S = sols @ (Vinv_dense @ sols.T)
    S = 0.5 * (S + S.T)
    return sample_inv_wishart(key, df + q, scale + S)
