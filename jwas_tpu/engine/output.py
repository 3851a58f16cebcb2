"""Posterior-summary assembly: accumulators -> results dict of DataFrames.

Equivalent of `output_result` (reference: src/1.JWAS/src/output.jl:108-212).
Keys mirror the reference where applicable: "location parameters",
"residual variance", "marker effects <name>", "pi_<name>", "EBV_<trait>",
"genetic_variance", "heritability", "polygenic effects covariance matrix".
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd


def _sd(m, m2):
    return np.sqrt(np.abs(np.asarray(m2) - np.asarray(m) ** 2))


def check_finite_posteriors(vare_m, where: str = "the chain") -> None:
    """Fail-fast divergence detection: a non-finite posterior mean of the
    residual variance means the sampler exploded (most often the parallel
    blocked update at an unstable stale-set size; see grouped.STALE_FRACTION)
    — surface it instead of writing inf/nan results."""
    v = np.asarray(vare_m)
    if not np.all(np.isfinite(v)):
        raise RuntimeError(
            f"MCMC diverged: non-finite residual-variance posterior in "
            f"{where}. Typical causes: an unstable blocked-update "
            f"configuration (too many markers updated in parallel per sync "
            f"round — lower fast_blocks / sync_every), or degenerate priors. "
        )


def build_results(ws, cfg, accum, samples, opts) -> Dict[str, pd.DataFrame]:
    model = ws.model
    check_finite_posteriors(accum.vare_m)
    results: Dict[str, pd.DataFrame] = {}

    # location parameters
    names = model.term_names()
    sol_m = np.asarray(accum.sol_m)
    sol_sd = _sd(accum.sol_m, accum.sol_m2)
    rows = []
    for name, est, sd in zip(names, sol_m, sol_sd):
        trait, effect, level = name.split(":", 2)
        rows.append((trait, effect, level, float(est), float(sd)))
    results["location parameters"] = pd.DataFrame(
        rows, columns=["Trait", "Effect", "Level", "Estimate", "SD"]
    )

    # residual variance
    results["residual variance"] = pd.DataFrame(
        {
            "Covariance": [model.lhs_vec[0] + "_" + model.lhs_vec[0]],
            "Estimate": [float(np.asarray(accum.vare_m))],
            "SD": [float(_sd(accum.vare_m, accum.vare_m2))],
        }
    )

    # marker effects
    if ws.geno is not None:
        g = ws.geno
        p = cfg.n_markers
        alpha_m = np.asarray(accum.alpha_m)[:p]
        alpha_sd = _sd(accum.alpha_m, accum.alpha_m2)[:p]
        delta_m = np.asarray(accum.delta_m)[:p]
        marker_ids = (
            g.marker_ids if g.method != "GBLUP" else [str(i + 1) for i in range(p)]
        )
        results[f"marker effects {g.name}"] = pd.DataFrame(
            {
                "Trait": model.lhs_vec[0],
                "Marker_ID": marker_ids,
                "Estimate": alpha_m,
                "SD": alpha_sd,
                "Model_Frequency": delta_m,
            }
        )
        results[f"marker effects variances {g.name}"] = pd.DataFrame(
            {
                "Covariance": [model.lhs_vec[0]],
                "Estimate": [float(np.asarray(accum.varg_m))],
                "SD": [float(_sd(accum.varg_m, accum.varg_m2))],
            }
        )
        if cfg.estimate_pi and cfg.anno_steps == 0:
            if g.method == "BayesR":
                pi_m = np.asarray(accum.pi_m)
                pi_sd = _sd(accum.pi_m, accum.pi_m2)
                results[f"pi_{g.name}"] = pd.DataFrame(
                    {"pi": [f"class{i}" for i in range(4)], "Estimate": pi_m, "SD": pi_sd}
                )
            else:
                results[f"pi_{g.name}"] = pd.DataFrame(
                    {
                        "pi": ["pi"],
                        "Estimate": [float(np.asarray(accum.pi_m)[0])],
                        "SD": [float(_sd(accum.pi_m, accum.pi_m2)[0])],
                    }
                )
        if cfg.anno_steps > 0:
            # annotation probit coefficients (output.jl:151-173)
            ann_m = np.asarray(accum.ann_m)
            ann_sd = _sd(accum.ann_m, accum.ann_m2)
            k = ann_m.shape[0]
            anames = ["Intercept"] + [f"Annotation_{i}" for i in range(1, k)]
            if ann_m.ndim == 1:
                results[f"annotation coefficients {g.name}"] = pd.DataFrame(
                    {"Annotation": anames, "Estimate": ann_m, "SD": ann_sd}
                )
            else:
                nsteps = ann_m.shape[1]
                results[f"annotation coefficients {g.name}"] = pd.DataFrame(
                    {
                        "Annotation": np.repeat(anames, nsteps),
                        "Step": np.tile(np.arange(1, nsteps + 1), k),
                        "Estimate": ann_m.reshape(-1),
                        "SD": ann_sd.reshape(-1),
                    }
                )
            # pi summary under annotations: mean per-marker prior
            if g.method == "BayesR":
                results[f"pi_{g.name}"] = pd.DataFrame(
                    {
                        "pi": [f"class{i}" for i in range(4)],
                        "Estimate": np.asarray(accum.pi_m),
                        "SD": _sd(accum.pi_m, accum.pi_m2),
                    }
                )
            else:
                results[f"pi_{g.name}"] = pd.DataFrame(
                    {
                        "pi": ["pi"],
                        "Estimate": [float(np.asarray(accum.pi_m)[0])],
                        "SD": [float(_sd(accum.pi_m, accum.pi_m2)[0])],
                    }
                )
        if cfg.estimate_scale:
            results[f"ScaleEffectVar{g.name}"] = pd.DataFrame(
                {
                    "Covariance": [model.lhs_vec[0]],
                    "Estimate": [float(np.asarray(accum.scale_m))],
                    "SD": [float(_sd(accum.scale_m, accum.scale_m2))],
                }
            )

    # random-effect covariance components
    for grp, vc_m, vc_m2 in zip(ws.re_groups, accum.vc_m, accum.vc_m2):
        vc_m = np.atleast_2d(np.asarray(vc_m))
        vc_sd = np.atleast_2d(_sd(vc_m, np.asarray(vc_m2)))
        k = vc_m.shape[0]
        labels = [
            f"{grp.term_array[i]}_{grp.term_array[j]}"
            for i in range(k)
            for j in range(k)
        ]
        df_vc = pd.DataFrame(
            {"Covariance": labels, "Estimate": vc_m.reshape(-1), "SD": vc_sd.reshape(-1)}
        )
        if grp.random_type == "A":
            results["polygenic effects covariance matrix"] = df_vc
        else:
            results[f"random effect variances {grp.term_array[0]}"] = df_vc

    # EBV / PEV and heritability (from saved samples)
    if ws.output_ids and (opts.outputEBV or opts.output_heritability):
        trait = model.lhs_vec[0]
        ebv = np.asarray(accum.ebv_m)
        pev = np.abs(np.asarray(accum.ebv_m2) - ebv**2)
        results[f"EBV_{trait}"] = pd.DataFrame(
            {"ID": ws.output_ids, "EBV": ebv, "PEV": pev}
        )
        if opts.output_heritability:
            gv = np.asarray(samples["genvar"], dtype=np.float64)
            h2 = np.asarray(samples["h2"], dtype=np.float64)
            results["genetic_variance"] = pd.DataFrame(
                {
                    "Covariance": [f"{trait}_{trait}"],
                    "Estimate": [gv.mean()],
                    "SD": [gv.std()],
                }
            )
            results["heritability"] = pd.DataFrame(
                {"Covariance": [trait], "Estimate": [h2.mean()], "SD": [h2.std()]}
            )

    if opts.output_folder:
        os.makedirs(opts.output_folder, exist_ok=True)
        for key, df_out in results.items():
            if isinstance(df_out, pd.DataFrame):
                safe = key.replace(" ", "_").replace("*", ".")
                df_out.to_csv(os.path.join(opts.output_folder, safe + ".txt"), index=False)
    return results
