"""Independent plain-NumPy BayesR single-iteration replay.

Plays the role of the external R reference in the reference repo
(benchmarks/bayesr_parity_reference.R, bayesr_parity_replay_reference.R): a
from-first-principles implementation of one BayesR Gibbs iteration that
consumes the *same* pre-generated draw CSV as the engine replay
(parity_replay_engine.py) and writes byte-comparable replay tables. It
deliberately imports nothing from jwas_tpu so any disagreement implicates one
of the two implementations, not shared code.

Update math per benchmarks/bayesr_parity_replay_jwas.jl:99-241:
  mu:      ycorr += mu; mu = rhs/n + z*sqrt(vare/n); ycorr -= mu
  marker:  rhs = (x'ycorr + xpx*alpha_old)/vare
           class k>=2: lhs = xpx/vare + 1/(gamma_k sigmaSq);
                       logp_k = .5(log invLhs - log varEff + betaHat*rhs)+log pi_k
           class draw: first k with cumsum(softmax(logp)) >= u
           effect:     alpha = betaHat_k + z*sqrt(invLhs_k) (0 for class 1)
  sigmaSq: (ssq + nu_b*scale_b) / chisq_draw,  ssq = sum alpha^2/gamma_class
  vare:    (ycorr'ycorr + nu_e*scale_e) / chisq_draw

Usage: python benchmarks/parity_replay_reference.py <outdir>
writes <outdir>/ref_fixed_pi/replay_{marker,scalar}_iteration1.csv
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.parity_common import (  # noqa: E402
    choose_class,
    draw_value,
    ensure_replay_dataset,
    read_parity_config,
    read_parity_initial_state,
)


def _class_probabilities(rhs, xpx, vare, sigma_sq, pi, gamma):
    nclasses = len(gamma)
    log_probs = np.zeros(nclasses)
    log_probs[0] = np.log(pi[0])
    inv_var_res = 1.0 / vare
    beta_hat = np.zeros(nclasses)
    inv_lhs_all = np.zeros(nclasses)
    for k in range(1, nclasses):
        var_effect = gamma[k] * sigma_sq
        lhs = xpx * inv_var_res + 1.0 / var_effect
        inv_lhs = 1.0 / lhs
        bh = inv_lhs * rhs
        log_probs[k] = 0.5 * (np.log(inv_lhs) - np.log(var_effect) + bh * rhs) + np.log(pi[k])
        beta_hat[k] = bh
        inv_lhs_all[k] = inv_lhs
    m = log_probs.max()
    probs = np.exp(log_probs - m)
    probs /= probs.sum()
    return probs, beta_hat, inv_lhs_all


def run_replay_reference(outdir):
    datadir = ensure_replay_dataset(outdir)
    cfg = read_parity_config(datadir)
    gamma = np.array([float(v) for v in cfg["gamma"].split(",")])
    start_pi = np.array([float(v) for v in cfg["start_pi"].split(",")])
    init = read_parity_initial_state(datadir)
    draws = pd.read_csv(os.path.join(datadir, "replay_draws_iteration1.csv"))

    geno = pd.read_csv(os.path.join(datadir, "genotypes.csv"))
    X = geno.iloc[:, 1:].to_numpy(dtype=np.float64)
    y = pd.read_csv(os.path.join(datadir, "phenotypes.csv"))["y1"].to_numpy(np.float64)
    marker_ids = init["marker_id"]
    n, p = X.shape
    xpx = np.einsum("np,np->p", X, X)

    alpha = init["beta0"].copy()
    delta = init["delta0"].copy()
    mu_old = init["mu0"]
    sigma_sq = init["sigmaSq0"]
    vare_old = init["vare0"]
    ycorr = y - mu_old - X @ alpha

    # mu update
    ycorr += mu_old
    rhs_mu = ycorr.sum()
    inv_lhs_mu = 1.0 / n
    mu_hat = inv_lhs_mu * rhs_mu
    z_mu = draw_value(draws, "mu_normal", 1)
    mu_new = mu_hat + z_mu * np.sqrt(inv_lhs_mu * vare_old)
    ycorr -= mu_new

    rows = []
    inv_var_res = 1.0 / vare_old
    for j in range(p):
        x = X[:, j]
        old_alpha = alpha[j]
        rhs = (x @ ycorr + xpx[j] * old_alpha) * inv_var_res
        probs, beta_hat, inv_lhs = _class_probabilities(
            rhs, xpx[j], vare_old, sigma_sq, start_pi, gamma
        )
        u_class = draw_value(draws, "marker_class_uniform", j + 1)
        chosen = choose_class(probs, u_class)
        delta[j] = chosen
        z_beta = draw_value(draws, "marker_beta_normal", j + 1)
        if chosen == 1:
            if old_alpha != 0.0:
                ycorr += old_alpha * x
            alpha[j] = 0.0
            bh_c = 0.0
            il_c = 0.0
        else:
            bh_c = beta_hat[chosen - 1]
            il_c = inv_lhs[chosen - 1]
            alpha[j] = bh_c + z_beta * np.sqrt(il_c)
            ycorr += (old_alpha - alpha[j]) * x
        rows.append(
            dict(
                marker_id=marker_ids[j], rhs=rhs, old_alpha=old_alpha,
                p_class1=probs[0], p_class2=probs[1], p_class3=probs[2],
                p_class4=probs[3], u_class=u_class, chosen_class=chosen,
                beta_hat_chosen=bh_c, inv_lhs_chosen=il_c, z_beta=z_beta,
                new_alpha=alpha[j], ycorr_norm_after=float(np.linalg.norm(ycorr)),
            )
        )

    # sigmaSq / vare updates (bayesr_sigma_sufficient_statistics,
    # variance_components.jl:68-79: included markers contribute alpha^2/gamma_k)
    included = delta > 1
    ssq = float(np.sum(alpha[included] ** 2 / gamma[delta[included] - 1]))
    nnz = int(included.sum())
    nub = nue = 4.0
    scaleb = (nub - 2.0) / nub * init["sigmaSq0"]
    scalee = (nue - 2.0) / nue * init["vare0"]
    chisq_sigma = draw_value(draws, "sigma_chisq", 1)
    chisq_vare = draw_value(draws, "vare_chisq", 1)
    sigma_sq_new = (ssq + nub * scaleb) / chisq_sigma
    vare_new = (float(ycorr @ ycorr) + nue * scalee) / chisq_vare

    marker_df = pd.DataFrame(rows)
    scalar_df = pd.DataFrame(
        {
            "field": ["mu_old", "mu_hat", "z_mu", "mu_new", "sigmaSq_old", "ssq",
                      "nnz", "chisq_sigma", "sigmaSq_new", "vare_old",
                      "chisq_vare", "vare_new"],
            "value": [mu_old, mu_hat, z_mu, mu_new, sigma_sq, ssq, float(nnz),
                      chisq_sigma, sigma_sq_new, vare_old, chisq_vare, vare_new],
        }
    )
    summary_dir = os.path.join(outdir, "ref_fixed_pi")
    os.makedirs(summary_dir, exist_ok=True)
    marker_df.to_csv(os.path.join(summary_dir, "replay_marker_iteration1.csv"), index=False)
    scalar_df.to_csv(os.path.join(summary_dir, "replay_scalar_iteration1.csv"), index=False)
    return summary_dir


if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit("Usage: python benchmarks/parity_replay_reference.py <outdir>")
    print("WROTE", run_replay_reference(sys.argv[1]))
