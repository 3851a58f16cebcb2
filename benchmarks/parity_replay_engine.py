"""Engine-side BayesR single-iteration replay: fixed draws through jwas_tpu.

The counterpart of the reference's `bayesr_parity_replay_jwas.jl`: loads the
parity dataset through the production `get_genotypes` path (no QC, no
centering — the parity design), replays one BayesR Gibbs iteration using the
engine's own class-probability kernel math (`bayesr_class_logprobs`,
jwas_tpu/ops/markers.py) in float64 with the pre-generated draws from
`replay_draws_iteration1.csv`, and writes replay tables in the reference
schema (replay_marker_iteration1.csv / replay_scalar_iteration1.csv,
bayesr_parity_replay_jwas.jl:139-241).

Exact equality against the independent NumPy implementation
(parity_replay_reference.py) is asserted by tests/test_parity.py.

Usage: python benchmarks/parity_replay_engine.py <outdir>
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


def run_replay_engine(outdir):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from jwas_tpu.io.genotypes import get_genotypes
    from jwas_tpu.ops.markers import bayesr_class_logprobs

    datadir = ensure_replay_dataset(outdir)
    cfg = read_parity_config(datadir)
    gamma = np.array([float(v) for v in cfg["gamma"].split(",")])
    start_pi = np.array([float(v) for v in cfg["start_pi"].split(",")])
    init = read_parity_initial_state(datadir)
    draws = pd.read_csv(os.path.join(datadir, "replay_draws_iteration1.csv"))

    geno = get_genotypes(
        os.path.join(datadir, "genotypes.csv"),
        init["sigmaSq0"],
        method="BayesR",
        Pi=start_pi,
        estimatePi=False,
        G_is_marker_variance=True,
        estimate_variance=True,
        estimate_scale=False,
        quality_control=False,
        center=False,
        double_precision=True,
    )
    X = jnp.asarray(geno.genotypes, jnp.float64)
    xpx = jnp.einsum("np,np->p", X, X)
    y = jnp.asarray(
        pd.read_csv(os.path.join(datadir, "phenotypes.csv"))["y1"].to_numpy(np.float64)
    )
    marker_ids = init["marker_id"]
    n, p = X.shape

    alpha = jnp.asarray(init["beta0"])
    delta = np.asarray(init["delta0"]).copy()
    mu_old = init["mu0"]
    sigma_sq = init["sigmaSq0"]
    vare_old = init["vare0"]
    ycorr = y - mu_old - X @ alpha

    ycorr = ycorr + mu_old
    rhs_mu = float(jnp.sum(ycorr))
    inv_lhs_mu = 1.0 / n
    mu_hat = inv_lhs_mu * rhs_mu
    z_mu = draw_value(draws, "mu_normal", 1)
    mu_new = mu_hat + z_mu * np.sqrt(inv_lhs_mu * vare_old)
    ycorr = ycorr - mu_new

    log_pi = jnp.log(jnp.asarray(start_pi))[None, :]
    inv_vare = 1.0 / vare_old

    @jax.jit
    def marker_stats(x, xpx_j, a_old, ycorr):
        """rhs + class log-probs for one marker via the production kernel
        math (bayesr_class_logprobs is the exact function the blocked and
        exact sweeps classify with)."""
        rhs_raw = jnp.dot(x, ycorr)
        log_probs, beta_hat, inv_lhs = bayesr_class_logprobs(
            rhs_raw[None], a_old[None], xpx_j[None], inv_vare, sigma_sq, log_pi
        )
        rhs = (rhs_raw + xpx_j * a_old) * inv_vare
        m = jnp.max(log_probs[0])
        probs = jnp.exp(log_probs[0] - m)
        probs = probs / jnp.sum(probs)
        return rhs, probs, beta_hat[0], inv_lhs[0]

    rows = []
    alpha = np.asarray(alpha).copy()
    ycorr = np.asarray(ycorr)
    X_np = np.asarray(X)
    for j in range(p):
        rhs, probs, beta_hat, inv_lhs = marker_stats(
            X[:, j], xpx[j], jnp.asarray(alpha[j]), jnp.asarray(ycorr)
        )
        rhs = float(rhs)
        probs = np.asarray(probs)
        u_class = draw_value(draws, "marker_class_uniform", j + 1)
        chosen = choose_class(probs, u_class)
        delta[j] = chosen
        z_beta = draw_value(draws, "marker_beta_normal", j + 1)
        old_alpha = alpha[j]
        if chosen == 1:
            if old_alpha != 0.0:
                ycorr = ycorr + old_alpha * X_np[:, j]
            alpha[j] = 0.0
            bh_c = 0.0
            il_c = 0.0
        else:
            bh_c = float(beta_hat[chosen - 2])
            il_c = float(inv_lhs[chosen - 2])
            alpha[j] = bh_c + z_beta * np.sqrt(il_c)
            ycorr = ycorr + (old_alpha - alpha[j]) * X_np[:, j]
        rows.append(
            dict(
                marker_id=marker_ids[j], rhs=rhs, old_alpha=old_alpha,
                p_class1=probs[0], p_class2=probs[1], p_class3=probs[2],
                p_class4=probs[3], u_class=u_class, chosen_class=chosen,
                beta_hat_chosen=bh_c, inv_lhs_chosen=il_c, z_beta=z_beta,
                new_alpha=alpha[j], ycorr_norm_after=float(np.linalg.norm(ycorr)),
            )
        )

    from jwas_tpu.ops.variance import bayesr_sigma_sufficient_statistics

    # engine class labels are 0-based (delta here follows the reference's
    # 1-based replay convention)
    ssq, nnz = bayesr_sigma_sufficient_statistics(
        jnp.asarray(alpha), jnp.asarray(delta - 1, jnp.int32)
    )
    ssq = float(ssq)
    nnz = int(nnz)
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
    summary_dir = os.path.join(outdir, "jwas_fixed_pi")
    os.makedirs(summary_dir, exist_ok=True)
    marker_df.to_csv(os.path.join(summary_dir, "replay_marker_iteration1.csv"), index=False)
    scalar_df.to_csv(os.path.join(summary_dir, "replay_scalar_iteration1.csv"), index=False)
    return summary_dir


if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit("Usage: python benchmarks/parity_replay_engine.py <outdir>")
    print("WROTE", run_replay_engine(sys.argv[1]))
