"""Multi-trait posterior-summary assembly (output_result, output.jl:108-212)."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd


def _sd(m, m2):
    return np.sqrt(np.abs(np.asarray(m2) - np.asarray(m) ** 2))


def _cov_df(names, mat_m, mat_sd):
    t = len(names)
    labels = [f"{names[i]}_{names[j]}" for i in range(t) for j in range(t)]
    return pd.DataFrame(
        {
            "Covariance": labels,
            "Estimate": np.asarray(mat_m).reshape(-1),
            "SD": np.asarray(mat_sd).reshape(-1),
        }
    )


def build_mt_results(ws, cfg, accum, samples, opts) -> Dict[str, pd.DataFrame]:
    from jwas_tpu.engine.output import check_finite_posteriors

    check_finite_posteriors(accum.R_m, "the multi-trait chain")
    model = ws.model
    t = cfg.n_traits
    results: Dict[str, pd.DataFrame] = {}

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

    results["residual variance"] = _cov_df(
        model.lhs_vec, accum.R_m, _sd(accum.R_m, accum.R_m2)
    )

    if ws.geno is not None:
        g = ws.geno
        p = cfg.n_markers
        alpha_m = np.asarray(accum.alpha_m)[:, :p]
        alpha_sd = _sd(accum.alpha_m, accum.alpha_m2)[:, :p]
        delta_m = np.asarray(accum.delta_m)[:, :p]
        marker_ids = g.marker_ids if g.method != "GBLUP" else [str(i + 1) for i in range(p)]
        results[f"marker effects {g.name}"] = pd.DataFrame(
            {
                "Trait": np.repeat(model.lhs_vec, p),
                "Marker_ID": np.tile(marker_ids, t),
                "Estimate": alpha_m.reshape(-1),
                "SD": alpha_sd.reshape(-1),
                "Model_Frequency": delta_m.reshape(-1),
            }
        )
        varg_m = np.asarray(accum.varg_m)
        varg_sd = _sd(accum.varg_m, accum.varg_m2)
        if varg_m.ndim == 3:
            # per-locus BayesB covariances: report the across-loci mean of the
            # per-locus posterior means (and of the per-locus SDs)
            varg_m = varg_m[:p].mean(axis=0)
            varg_sd = varg_sd[:p].mean(axis=0)
        results[f"marker effects variances {g.name}"] = _cov_df(
            model.lhs_vec, varg_m, varg_sd
        )
        if cfg.estimate_pi or cfg.anno_steps > 0:
            pi_m = np.asarray(accum.pi_m)
            pi_sd = _sd(accum.pi_m, accum.pi_m2)
            if pi_m.ndim == 2:
                # annotated: per-marker joint priors -> across-marker summary
                pi_m = pi_m[:p].mean(axis=0)
                pi_sd = pi_sd[:p].mean(axis=0)
            if cfg.constraint:
                labels = list(model.lhs_vec)
            else:
                labels = [
                    "[" + ", ".join(str(float((s >> k) & 1)) for k in range(t)) + "]"
                    for s in range(2**t)
                ]
            results[f"pi_{g.name}"] = pd.DataFrame(
                {"pi": labels, "Estimate": pi_m, "SD": pi_sd}
            )
        if cfg.anno_steps > 0 and getattr(accum, "ann_m", None) is not None:
            ann_m = np.asarray(accum.ann_m)
            ann_sd = _sd(accum.ann_m, accum.ann_m2)
            k = ann_m.shape[0]
            anames = ["Intercept"] + [f"Annotation_{i}" for i in range(1, k)]
            nsteps = ann_m.shape[1]
            results[f"annotation coefficients {g.name}"] = pd.DataFrame(
                {
                    "Annotation": np.repeat(anames, nsteps),
                    "Step": np.tile(np.arange(1, nsteps + 1), k),
                    "Estimate": ann_m.reshape(-1),
                    "SD": ann_sd.reshape(-1),
                }
            )

    for grp, vc_m, vc_m2 in zip(ws.re_groups, accum.vc_m, accum.vc_m2):
        vc_m = np.atleast_2d(np.asarray(vc_m))
        vc_sd = np.atleast_2d(_sd(vc_m, np.asarray(vc_m2)))
        df_vc = _cov_df(grp.term_array, vc_m, vc_sd)
        if grp.random_type == "A":
            results["polygenic effects covariance matrix"] = df_vc
        else:
            results[f"random effect variances {grp.term_array[0]}"] = df_vc

    if ws.output_ids and (opts.outputEBV or opts.output_heritability):
        ebv = np.asarray(accum.ebv_m)
        pev = np.abs(np.asarray(accum.ebv_m2) - ebv**2)
        for ti, trait in enumerate(model.lhs_vec):
            results[f"EBV_{trait}"] = pd.DataFrame(
                {"ID": ws.output_ids, "EBV": ebv[ti], "PEV": pev[ti]}
            )
        if opts.output_heritability:
            gv = np.asarray(samples["genvar"], dtype=np.float64)
            h2 = np.asarray(samples["h2"], dtype=np.float64)
            results["genetic_variance"] = _cov_df(
                model.lhs_vec, gv.mean(axis=0), gv.std(axis=0)
            )
            results["heritability"] = pd.DataFrame(
                {
                    "Covariance": model.lhs_vec,
                    "Estimate": h2.mean(axis=0),
                    "SD": h2.std(axis=0),
                }
            )

    if cfg.sem_edges:
        # Structural coefficients + indirect/overall marker effects
        # (SEM.jl:179-316): indirect_s = sum_{i=1..t-1} C_s^i alpha_s per
        # thinned sample; overall = direct + indirect.
        lam_m = np.asarray(accum.lam_m)
        lam_sd = _sd(accum.lam_m, accum.lam_m2)
        edge_labels = [
            f"{model.lhs_vec[j]}->{model.lhs_vec[i]}" for (i, j) in cfg.sem_edges
        ]
        results["structural coefficients"] = pd.DataFrame(
            {"Edge": edge_labels, "Estimate": lam_m, "SD": lam_sd}
        )
        if ws.geno is not None and samples["lam"]:
            g = ws.geno
            p = cfg.n_markers
            marker_ids = g.marker_ids
            ind_acc = np.zeros((t, p))
            ind_acc2 = np.zeros((t, p))
            ov_acc = np.zeros((t, p))
            ov_acc2 = np.zeros((t, p))
            n_s = len(samples["lam"])
            for lam_s, alpha_s in zip(samples["lam"], samples["alpha"]):
                C = np.zeros((t, t))
                for k_, (i, j) in enumerate(cfg.sem_edges):
                    C[i, j] = lam_s[k_]
                indirect = np.zeros((t, p))
                Ci = np.eye(t)
                for _ in range(t - 1):
                    Ci = Ci @ C
                    indirect += Ci @ alpha_s
                overall = alpha_s + indirect
                ind_acc += indirect
                ind_acc2 += indirect**2
                ov_acc += overall
                ov_acc2 += overall**2
            for key2, acc_m, acc_2 in (
                ("indirect", ind_acc / n_s, ind_acc2 / n_s),
                ("overall", ov_acc / n_s, ov_acc2 / n_s),
            ):
                results[f"{key2} marker effects {g.name}"] = pd.DataFrame(
                    {
                        "Trait": np.repeat(model.lhs_vec, p),
                        "Marker_ID": np.tile(marker_ids, t),
                        "Estimate": acc_m.reshape(-1),
                        "SD": np.sqrt(np.abs(acc_2 - acc_m**2)).reshape(-1),
                    }
                )

    if opts.output_folder:
        os.makedirs(opts.output_folder, exist_ok=True)
        for key, df_out in results.items():
            if isinstance(df_out, pd.DataFrame):
                safe = key.replace(" ", "_").replace("*", ".")
                df_out.to_csv(os.path.join(opts.output_folder, safe + ".txt"), index=False)
    return results
