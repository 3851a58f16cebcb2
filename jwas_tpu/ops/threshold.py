"""Threshold-model machinery for categorical / binary / censored traits.

From-scratch JAX equivalents of the reference latent-variable updates
(reference: src/1.JWAS/src/categorical_and_censored_trait/
categorical_and_censored_trait.jl):

- liability draws from truncated normals conditioned on the other traits'
  residuals (sample_liabilities!, :166-210), with nGibbs=5 inner passes when
  more than one trait carries a liability;
- threshold draws from Uniform(max liability below, min liability above)
  (categorical_trait_sample_threshold!, :127-163);
- the Korsgaard (1999) conditional inverse-Wishart draw that fixes binary
  traits' residual variances at 1 (sample_from_conditional_inverse_Wishart,
  :228-260).

Parameterisation (table at :16-26): single-trait categorical fixes vare=1 and
thresholds [-Inf, 0, t2.. <1, Inf]; multi-trait fixes t1=0, t2=1; binary fixes
[-Inf, 0, Inf].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

BIG = 1e30  # stand-in for +/- Inf that keeps truncated-normal math finite


def bounds_from_thresholds(thresholds_t, category_obs_t):
    """Lower/upper liability bounds per individual (update_lower_upper_bound
    _with_threshold, :98-124). category 0 = missing -> unbounded."""
    cat = category_obs_t
    lb = jnp.take(thresholds_t, jnp.clip(cat - 1, 0, thresholds_t.shape[0] - 1))
    ub = jnp.take(thresholds_t, jnp.clip(cat, 0, thresholds_t.shape[0] - 1))
    missing = cat <= 0
    lb = jnp.where(missing, -BIG, lb)
    ub = jnp.where(missing, BIG, ub)
    return lb, ub


def sample_thresholds_t(key, thresholds_t, liab_t, category_obs_t, n_cat: int,
                        start_index: int):
    """Update free thresholds of one categorical trait (:147-162).

    thresholds_t: (Tmax,) with entries [-BIG, 0, (1,) t.., BIG, pad..].
    Free thresholds are positions start_index .. n_cat-1 (0-based), i.e. the
    threshold between categories i and i+1 for i >= start_index.
    """
    keys = jax.random.split(key, max(1, n_cat))
    for i in range(start_index, n_cat):
        # threshold i sits between categories i (1-based: i) and i+1
        below = jnp.where(category_obs_t == i, liab_t, -BIG)
        above = jnp.where(category_obs_t == i + 1, liab_t, BIG)
        lo = jnp.max(below)
        hi = jnp.min(above)
        u = jax.random.uniform(keys[i], dtype=liab_t.dtype)
        thresholds_t = thresholds_t.at[i].set(lo + u * (hi - lo))
    return thresholds_t


def _truncated_normal(key, mean, std, lower, upper):
    a = jnp.clip((lower - mean) / std, -BIG, BIG)
    b = jnp.clip((upper - mean) / std, -BIG, BIG)
    z = jax.random.truncated_normal(key, a, b, shape=jnp.shape(mean),
                                    dtype=jnp.result_type(mean))
    return mean + std * z


def sample_liabilities(key, liab, ycorr, R, lower, upper,
                       latent_traits: Sequence[int], n_gibbs: int):
    """Update liabilities + residuals for latent traits (:166-210).

    liab, ycorr: (t, n); R: (t, t); lower/upper: (t, n) bounds on the liability.
    Returns (liab, ycorr). Entries with lower==upper are fixed (censored point
    observations) and left unchanged.
    """
    t = liab.shape[0]
    cmean = liab - ycorr
    keys = jax.random.split(key, n_gibbs * max(1, len(latent_traits)))
    ki = 0
    for _ in range(n_gibbs):
        for trait in latent_traits:
            others = [m for m in range(t) if m != trait]
            if others:
                idx_o = jnp.asarray(others)
                R22 = R[jnp.ix_(idx_o, idx_o)]
                R12 = R[trait][idx_o]
                d = ycorr[idx_o]                              # (t-1, n)
                w = jnp.linalg.solve(R22, R12)
                mu1 = jnp.einsum("m,mn->n", w, d)
                s2 = R[trait, trait] - R12 @ w
            else:
                mu1 = jnp.zeros(liab.shape[1], liab.dtype)
                s2 = R[trait, trait]
            lb = lower[trait] - cmean[trait]
            ub = upper[trait] - cmean[trait]
            fixed = lb >= ub
            eps = _truncated_normal(
                keys[ki], mu1, jnp.sqrt(s2),
                jnp.where(fixed, mu1 - 1.0, lb), jnp.where(fixed, mu1 + 1.0, ub),
            )
            ki += 1
            eps = jnp.where(fixed, ycorr[trait], eps)
            liab = liab.at[trait].set(cmean[trait] + eps)
            ycorr = ycorr.at[trait].set(eps)
    return liab, ycorr


def sample_conditional_inv_wishart_korsgaard(key, df, precision_scale,
                                             binary_idx: Tuple[int, ...],
                                             n_traits: int):
    """Korsgaard (1999) conditional inverse-Wishart with binary traits pinned
    to unit variance (sample_from_conditional_inverse_Wishart, :228-260).

    precision_scale = inv(scale + SSE) as passed at the reference call site
    (variance_components.jl:103). binary_idx is static.
    """
    from jwas_tpu.ops.dists import sample_wishart

    idx2 = list(binary_idx)
    idx1 = [i for i in range(n_traits) if i not in idx2]
    n1, n2 = len(idx1), len(idx2)
    V = precision_scale
    i1 = jnp.asarray(idx1)
    i2 = jnp.asarray(idx2)
    V11 = V[jnp.ix_(i1, i1)]
    V12 = V[jnp.ix_(i1, i2)]

    k1, k2 = jax.random.split(key)
    X1 = sample_wishart(k1, df, V11)
    X1inv = jnp.linalg.inv(X1)
    V11inv = jnp.linalg.inv(V11)
    V22_1 = V[jnp.ix_(i2, i2)] - V12.T @ V11inv @ V12
    mu = (V11inv @ V12)                                    # (n1, n2)
    # X2 ~ MvN(vec(mu), kron(V22_1, inv(X1))): column j has cov V22_1[j,j]*X1inv
    # with cross-column cov V22_1[j,k]*X1inv -> draw via chol factors.
    L_col = jnp.linalg.cholesky(0.5 * (V22_1 + V22_1.T))   # (n2, n2)
    L_row = jnp.linalg.cholesky(0.5 * (X1inv + X1inv.T))   # (n1, n1)
    Z = jax.random.normal(k2, (n1, n2), dtype=V.dtype)
    X2 = mu + L_row @ Z @ L_col.T
    T11 = X1inv + X2 @ X2.T
    # assemble R in [idx1; idx2] order then reorder to 0..t-1
    top = jnp.concatenate([T11, -X2], axis=1)
    bot = jnp.concatenate([-X2.T, jnp.eye(n2, dtype=V.dtype)], axis=1)
    Rp = jnp.concatenate([top, bot], axis=0)
    order = idx1 + idx2
    perm = [order.index(i) for i in range(n_traits)]
    perm = jnp.asarray(perm)
    return Rp[jnp.ix_(perm, perm)]
