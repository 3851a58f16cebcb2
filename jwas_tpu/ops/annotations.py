"""Annotation-aware marker priors (AnnoBayesC / AnnoBayesR).

From-scratch JAX equivalents of the reference annotation machinery
(reference: src/1.JWAS/src/MCMC/annotation_updates.jl and
src/1.JWAS/src/markers/annotation_setup.jl):

- per-marker inclusion priors driven by functional annotations through binary
  probit submodels: truncated-normal liabilities (:43-58), coordinate Gibbs on
  the probit coefficients with a flat intercept prior and N(0, sigma2_alpha)
  slopes (:98-123), slope variance from a scaled-inv-chi2 (:135-137);
- single-trait BayesC: one probit on the inclusion indicator, per-marker
  pi_j = 1 - Phi(mu_j) (update_bayesc_binary_priors!, :179-192);
- single-trait BayesR: three nested step-up probits z_s = 1(class > s) with
  conditional active subsets, rebuilt into the 4-class per-marker prior
  (:205-273).

Everything is vectorized over markers; inactive rows are masked (weight 0)
instead of gathered, so shapes stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e30


def _norm_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0)))


def _sample_liabilities(key, mu, response, active):
    """Latent probit liabilities l ~ TruncN(mu, 1) on (-inf,0] / [0,inf)
    (sample_binary_annotation_liabilities!, :43-58). Inactive rows -> mu."""
    lower = jnp.where(response > 0, 0.0, -BIG)
    upper = jnp.where(response > 0, BIG, 0.0)
    a = jnp.clip(lower - mu, -BIG, BIG)
    b = jnp.clip(upper - mu, -BIG, BIG)
    z = jax.random.truncated_normal(key, a, b, shape=mu.shape, dtype=mu.dtype)
    return jnp.where(active > 0, mu + z, mu)


def _coordinate_gibbs(key, A, resid, coeffs, slope_var, weights):
    """Coordinate Gibbs over probit coefficients (masked rows excluded)
    (gibbs_update_binary_probit_annotation_coefficients!, :98-123).

    A: (p, k) with intercept first column; resid: (p,) latent residual;
    weights: (p,) 0/1 active rows. Intercept has a flat prior; slopes
    N(0, slope_var). Returns (coeffs, resid).
    """
    k = A.shape[1]
    zs = jax.random.normal(key, (k,), dtype=resid.dtype)
    for c in range(k):
        xk = A[:, c] * weights
        diag = jnp.dot(xk, A[:, c])
        prior_prec = 0.0 if c == 0 else 1.0 / slope_var
        inv_lhs = 1.0 / (diag + prior_prec)
        old = coeffs[c]
        ahat = inv_lhs * (jnp.dot(xk, resid) + diag * old)
        new = ahat + zs[c] * jnp.sqrt(inv_lhs)
        resid = resid + A[:, c] * (old - new)
        coeffs = coeffs.at[c].set(new)
    return coeffs, resid


def _slope_variance(key, coeffs):
    """sigma2_alpha = (sum slopes^2 + 2) / chi2(k+1)
    (sample_annotation_effect_variance, :135-137)."""
    k = coeffs.shape[0]
    sse = jnp.sum(coeffs[1:] ** 2) + 2.0
    chi = 2.0 * jax.random.gamma(key, (k + 1.0) / 2.0)
    return sse / chi


def _probit_step(key, A, response, coeffs, slope_var, active):
    """One binary probit submodel update. Returns (coeffs, slope_var, mu)."""
    k_l, k_c, k_v = jax.random.split(key, 3)
    mu = A @ coeffs
    liab = _sample_liabilities(k_l, mu, response, active)
    resid = (liab - mu) * active
    coeffs, _ = _coordinate_gibbs(k_c, A, resid, coeffs, slope_var, active)
    if A.shape[1] > 1:
        slope_var = _slope_variance(k_v, coeffs)
    mu = A @ coeffs
    return coeffs, slope_var, mu


def anno_bayesc_update(key, A, delta, coeffs, slope_var, valid):
    """Annotated single-trait BayesC prior update
    (update_bayesc_binary_priors!, :179-192).

    A: (p_pad, k); delta: (p_pad,) inclusion (1 = in); coeffs: (k,);
    slope_var: scalar. Returns (coeffs, slope_var, pi) with per-marker
    exclusion probability pi_j = 1 - Phi(mu_j); padded rows pinned at 1.
    """
    eps = 1e-7
    response = (delta > 0).astype(A.dtype)
    coeffs, slope_var, mu = _probit_step(key, A, response, coeffs, slope_var, valid)
    pi = jnp.clip(1.0 - _norm_cdf(mu), eps, 1.0 - eps)
    pi = jnp.where(valid > 0, pi, 1.0)
    return coeffs, slope_var, pi


def anno_bayesc_mt_update(key, A, delta_t, coeffs, slope_var, valid):
    """Annotated 2-trait BayesC joint-state tree probit update
    (bayesc_mt_tree_step_indicators + rebuild_bayesc_mt_tree_priors!,
    annotation_updates.jl:275-326).

    The 4 joint inclusion states {00, 10, 01, 11} are decomposed into 3 nested
    binary probits: step 1 z1 = 1(state != 00) over all markers; step 2
    z2 = 1(state == 11) over markers with state != 00; step 3
    z3 = 1(state == 10) over markers with state in {10, 01}.

    delta_t: (2, p_pad) 0/1 inclusion indicators; coeffs: (k, 3);
    slope_var: (3,). Returns (coeffs, slope_var, snp_pi) with snp_pi
    (p_pad, 4) in CANONICAL pattern order (bit k = trait k:
    s0=00, s1=10, s2=01, s3=11); padded rows pinned at [1, 0, 0, 0].
    """
    eps = 1e-7
    d1 = (delta_t[0] > 0)
    d2 = (delta_t[1] > 0)
    state = d1.astype(jnp.int32) + 2 * d2.astype(jnp.int32)   # canonical index
    dt = A.dtype
    responses = [
        (state != 0).astype(dt),        # z1: any trait active
        (state == 3).astype(dt),        # z2: both traits (given any)
        (state == 1).astype(dt),        # z3: trait-1-only (given exactly one)
    ]
    actives = [
        valid,
        valid * (state != 0).astype(dt),
        valid * ((state == 1) | (state == 2)).astype(dt),
    ]
    keys = jax.random.split(key, 3)
    mus = []
    for s in range(3):
        cs, vs, mu = _probit_step(
            keys[s], A, responses[s], coeffs[:, s], slope_var[s], actives[s]
        )
        coeffs = coeffs.at[:, s].set(cs)
        slope_var = slope_var.at[s].set(vs)
        mus.append(mu)
    p1, p2, p3 = (jnp.clip(_norm_cdf(m), eps, 1.0 - eps) for m in mus)
    # canonical order: 00, 10, 01, 11 (rebuild_bayesc_mt_tree_priors!)
    snp_pi = jnp.stack(
        [1.0 - p1, p1 * (1.0 - p2) * p3, p1 * (1.0 - p2) * (1.0 - p3), p1 * p2],
        axis=1,
    )
    base = jnp.zeros((4,), dt).at[0].set(1.0)
    snp_pi = jnp.where((valid > 0)[:, None], snp_pi, base[None, :])
    return coeffs, slope_var, snp_pi


def anno_bayesr_update(key, A, delta, coeffs, slope_var, valid):
    """Annotated single-trait BayesR nested-probit update
    (bayesr_nested_step_indicators + rebuild_bayesr_nested_priors!, :205-273).

    delta: (p_pad,) class labels in {0,1,2,3}; coeffs: (k, 3); slope_var: (3,).
    Returns (coeffs, slope_var, snp_pi) with snp_pi (p_pad, 4); padded rows
    pinned at [1, 0, 0, 0].
    """
    eps = 1e-7
    keys = jax.random.split(key, 3)
    mus = []
    for s in range(3):
        response = (delta > s).astype(A.dtype)
        active = valid if s == 0 else valid * (delta > s - 1).astype(A.dtype)
        cs, vs, mu = _probit_step(
            keys[s], A, response, coeffs[:, s], slope_var[s], active
        )
        coeffs = coeffs.at[:, s].set(cs)
        slope_var = slope_var.at[s].set(vs)
        mus.append(mu)
    p1, p2, p3 = (jnp.clip(_norm_cdf(m), eps, 1.0 - eps) for m in mus)
    snp_pi = jnp.stack(
        [1.0 - p1, p1 * (1.0 - p2), p1 * p2 * (1.0 - p3), p1 * p2 * p3], axis=1
    )
    base = jnp.zeros((4,), A.dtype).at[0].set(1.0)
    snp_pi = jnp.where((valid > 0)[:, None], snp_pi, base[None, :])
    return coeffs, slope_var, snp_pi
