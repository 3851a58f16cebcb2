"""Independent full-chain NumPy Gibbs samplers for posterior parity checks.

Plays the role of the external R reference chain in the reference repo
(benchmarks/bayesr_parity_reference.R run in full-chain mode): straightforward
per-marker single-site Gibbs samplers for BayesR and BayesC written directly
from the model definitions, importing nothing from jwas_tpu. Posterior
summaries from these chains and from the engine must agree within Monte-Carlo
error (tests/test_parity.py).

Model: y = mu + X beta + e,  e ~ N(0, vare I)
  BayesR: beta_j ~ sum_k pi_k N(0, gamma_k sigmaSq), gamma = (0, .01, .1, 1)
  BayesC: beta_j ~ pi delta_0 + (1-pi) N(0, sigmaSq)
  sigmaSq ~ scaled-inv-chi2(nub, scaleb), vare ~ scaled-inv-chi2(nue, scalee)
  optional pi ~ Dirichlet(counts+1) / Beta(counts+1) updates.
"""

from __future__ import annotations

import numpy as np

GAMMA = np.array([0.0, 0.01, 0.1, 1.0])


def numpy_bayesr_chain(X, y, *, sigma_sq0, vare0, pi0, chain_length, burnin,
                       estimate_pi=False, seed=7, nub=4.0, nue=4.0):
    """Single-site BayesR Gibbs chain; returns posterior summary dict."""
    rng = np.random.default_rng(seed)
    n, p = X.shape
    xpx = np.einsum("np,np->p", X, X)
    alpha = np.zeros(p)
    delta = np.zeros(p, dtype=np.int64)  # 0-based class labels
    mu = float(np.mean(y))
    sigma_sq = float(sigma_sq0)
    vare = float(vare0)
    pi = np.asarray(pi0, dtype=np.float64).copy()
    scaleb = (nub - 2.0) / nub * sigma_sq0
    scalee = (nue - 2.0) / nue * vare0
    ycorr = y - mu - X @ alpha

    n_saved = 0
    alpha_m = np.zeros(p)
    freq_m = np.zeros(p)
    pi_m = np.zeros(4)
    sigma_m = 0.0
    vare_m = 0.0

    for it in range(chain_length):
        # mu
        ycorr += mu
        mu = ycorr.sum() / n + rng.standard_normal() * np.sqrt(vare / n)
        ycorr -= mu
        # markers
        inv_vare = 1.0 / vare
        log_pi = np.log(np.clip(pi, 1e-300, 1.0))
        for j in range(p):
            x = X[:, j]
            old = alpha[j]
            rhs = (x @ ycorr + xpx[j] * old) * inv_vare
            var_eff = GAMMA[1:] * sigma_sq
            lhs = xpx[j] * inv_vare + 1.0 / var_eff
            inv_lhs = 1.0 / lhs
            beta_hat = inv_lhs * rhs
            logp = np.empty(4)
            logp[0] = log_pi[0]
            logp[1:] = 0.5 * (np.log(inv_lhs) - np.log(var_eff) + beta_hat * rhs) + log_pi[1:]
            m = logp.max()
            probs = np.exp(logp - m)
            probs /= probs.sum()
            k = int(np.searchsorted(np.cumsum(probs), rng.uniform()))
            k = min(k, 3)
            delta[j] = k
            if k == 0:
                alpha[j] = 0.0
                if old != 0.0:
                    ycorr += old * x
            else:
                alpha[j] = beta_hat[k - 1] + rng.standard_normal() * np.sqrt(inv_lhs[k - 1])
                ycorr += (old - alpha[j]) * x
        # pi
        if estimate_pi:
            counts = np.bincount(delta, minlength=4).astype(np.float64)
            pi = rng.dirichlet(counts + 1.0)
        # sigmaSq
        nz = delta > 0
        ssq = float(np.sum(alpha[nz] ** 2 / GAMMA[delta[nz]]))
        nnz = int(nz.sum())
        sigma_sq = (ssq + nub * scaleb) / rng.chisquare(nnz + nub)
        # vare
        vare = (float(ycorr @ ycorr) + nue * scalee) / rng.chisquare(n + nue)

        if it >= burnin:
            n_saved += 1
            alpha_m += (alpha - alpha_m) / n_saved
            freq_m += ((delta > 0).astype(np.float64) - freq_m) / n_saved
            pi_m += (pi - pi_m) / n_saved
            sigma_m += (sigma_sq - sigma_m) / n_saved
            vare_m += (vare - vare_m) / n_saved

    return {
        "alpha": alpha_m, "model_frequency": freq_m, "pi": pi_m,
        "sigma_sq": sigma_m, "vare": vare_m,
        "mean_nonzero_frequency": float(freq_m.mean()),
    }


def numpy_bayesc_chain(X, y, *, sigma_sq0, vare0, pi0, chain_length, burnin,
                       estimate_pi=True, seed=7, nub=4.0, nue=4.0):
    """Single-site BayesC Gibbs chain; pi here is P(excluded)."""
    rng = np.random.default_rng(seed)
    n, p = X.shape
    xpx = np.einsum("np,np->p", X, X)
    alpha = np.zeros(p)
    delta = np.ones(p, dtype=np.int64)
    mu = float(np.mean(y))
    sigma_sq = float(sigma_sq0)
    vare = float(vare0)
    pi = float(pi0)
    scaleb = (nub - 2.0) / nub * sigma_sq0
    scalee = (nue - 2.0) / nue * vare0
    ycorr = y - mu - X @ alpha

    n_saved = 0
    alpha_m = np.zeros(p)
    freq_m = np.zeros(p)
    pi_m = 0.0
    sigma_m = 0.0
    vare_m = 0.0

    for it in range(chain_length):
        ycorr += mu
        mu = ycorr.sum() / n + rng.standard_normal() * np.sqrt(vare / n)
        ycorr -= mu
        inv_vare = 1.0 / vare
        logpi = np.log(max(pi, 1e-300))
        logpi_comp = np.log(max(1.0 - pi, 1e-300))
        for j in range(p):
            x = X[:, j]
            old = alpha[j]
            rhs = (x @ ycorr + xpx[j] * old) * inv_vare
            lhs = xpx[j] * inv_vare + 1.0 / sigma_sq
            inv_lhs = 1.0 / lhs
            g_hat = rhs * inv_lhs
            log_delta1 = -0.5 * (np.log(lhs) + np.log(sigma_sq) - g_hat * rhs) + logpi_comp
            prob1 = 1.0 / (1.0 + np.exp(logpi - log_delta1))
            if rng.uniform() < prob1:
                delta[j] = 1
                alpha[j] = g_hat + rng.standard_normal() * np.sqrt(inv_lhs)
                ycorr += (old - alpha[j]) * x
            else:
                delta[j] = 0
                alpha[j] = 0.0
                if old != 0.0:
                    ycorr += old * x
        if estimate_pi:
            incl = int(delta.sum())
            pi = rng.beta(p - incl + 1.0, incl + 1.0)
        incl_idx = delta > 0
        ssq = float(np.sum(alpha[incl_idx] ** 2))
        nincl = int(incl_idx.sum())
        sigma_sq = (ssq + nub * scaleb) / rng.chisquare(nincl + nub)
        vare = (float(ycorr @ ycorr) + nue * scalee) / rng.chisquare(n + nue)

        if it >= burnin:
            n_saved += 1
            alpha_m += (alpha - alpha_m) / n_saved
            freq_m += (delta.astype(np.float64) - freq_m) / n_saved
            pi_m += (pi - pi_m) / n_saved
            sigma_m += (sigma_sq - sigma_m) / n_saved
            vare_m += (vare - vare_m) / n_saved

    return {
        "alpha": alpha_m, "model_frequency": freq_m, "pi": pi_m,
        "sigma_sq": sigma_m, "vare": vare_m,
        "mean_nonzero_frequency": float(freq_m.mean()),
    }
