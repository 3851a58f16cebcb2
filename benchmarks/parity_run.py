"""Full-chain posterior parity: jwas_tpu engine vs independent NumPy chains.

Python analogue of the reference's full-chain parity scripts
(benchmarks/bayesr_parity_jwas.jl + bayesr_parity_reference.R +
bayesr_parity_compare.jl): build the fixed parity dataset (n=40, p=12), run
long chains through the production engine and through the independent NumPy
sampler (parity_numpy_chain.py), write summary CSVs in the reference schema
(scalar_metrics.csv / pi.csv / marker_effects.csv), and print a side-by-side
comparison with abs/rel diffs and the marker-effect correlation.

Usage:
  python benchmarks/parity_run.py <outdir> [--mode fixed_pi|estimate_pi|bayesc]
                                  [--chain-length 30000] [--burnin 5000]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.parity_common import (  # noqa: E402
    DEFAULT_GAMMA,
    DEFAULT_START_PI,
    build_bayesr_parity_dataset,
    compare_parity_summaries,
    default_start_hyperparameters,
    read_parity_summary,
    write_parity_dataset,
    write_parity_summary,
)
from benchmarks.parity_numpy_chain import (  # noqa: E402
    numpy_bayesc_chain,
    numpy_bayesr_chain,
)


def run_engine_chain(datadir, *, mode, sigma_sq0, vare0, chain_length, burnin,
                     output_folder, seed=11):
    """Drive the production engine on the parity dataset; returns
    (results dict, posterior sigmaSq estimate)."""
    from jwas_tpu import build_model, get_genotypes, runMCMC

    method = "BayesC" if mode == "bayesc" else "BayesR"
    estimate_pi = mode != "fixed_pi"
    geno = get_genotypes(
        os.path.join(datadir, "genotypes.csv"),
        sigma_sq0,
        method=method,
        Pi=(0.95 if method == "BayesC" else np.asarray(DEFAULT_START_PI)),
        estimatePi=estimate_pi,
        G_is_marker_variance=True,
        estimate_variance=True,
        estimate_scale=False,
        quality_control=False,
        center=False,
        name="geno",
    )
    model = build_model("y1 = intercept + geno", vare0, genotypes=geno)
    phenotypes = pd.read_csv(os.path.join(datadir, "phenotypes.csv"))
    results = runMCMC(
        model, phenotypes,
        chain_length=chain_length, burnin=burnin,
        output_samples_frequency=1, seed=seed,
        output_folder=output_folder, outputEBV=False,
        output_heritability=False, printout_model_info=False,
    )
    sigma_sq = float(results["marker effects variances geno"]["Estimate"].iloc[0])
    return results, sigma_sq


def run_numpy_chain(datadir, *, mode, sigma_sq0, vare0, chain_length, burnin,
                    marker_ids, seed=7):
    geno = pd.read_csv(os.path.join(datadir, "genotypes.csv"))
    X = geno.iloc[:, 1:].to_numpy(dtype=np.float64)
    y = pd.read_csv(os.path.join(datadir, "phenotypes.csv"))["y1"].to_numpy(np.float64)
    if mode == "bayesc":
        out = numpy_bayesc_chain(
            X, y, sigma_sq0=sigma_sq0, vare0=vare0, pi0=0.95,
            chain_length=chain_length, burnin=burnin, estimate_pi=True, seed=seed,
        )
        pi_values = [out["pi"]]
    else:
        out = numpy_bayesr_chain(
            X, y, sigma_sq0=sigma_sq0, vare0=vare0, pi0=DEFAULT_START_PI,
            chain_length=chain_length, burnin=burnin,
            estimate_pi=(mode == "estimate_pi"), seed=seed,
        )
        pi_values = out["pi"]
    return out, pi_values


def numpy_summary_to_csvs(out, pi_values, marker_ids, outdir):
    os.makedirs(outdir, exist_ok=True)
    pd.DataFrame(
        {
            "metric": ["sigmaSq", "residual_variance", "mean_nonzero_frequency"],
            "value": [out["sigma_sq"], out["vare"], out["mean_nonzero_frequency"]],
        }
    ).to_csv(os.path.join(outdir, "scalar_metrics.csv"), index=False)
    pd.DataFrame(
        {
            "class": [f"class{i + 1}" for i in range(len(pi_values))],
            "estimate": np.asarray(pi_values, dtype=np.float64),
        }
    ).to_csv(os.path.join(outdir, "pi.csv"), index=False)
    pd.DataFrame(
        {
            "marker_id": marker_ids,
            "estimate": out["alpha"],
            "model_frequency": out["model_frequency"],
        }
    ).to_csv(os.path.join(outdir, "marker_effects.csv"), index=False)


def run_parity(outdir, mode="fixed_pi", chain_length=30000, burnin=5000,
               seed=2026, n_obs=40, n_markers=12, start_h2=0.5):
    ds = build_bayesr_parity_dataset(seed=seed, n_obs=n_obs, n_markers=n_markers)
    vare0, sigma_sq0 = default_start_hyperparameters(ds.y, n_markers, start_h2)
    datadir = os.path.join(outdir, "data")
    write_parity_dataset(
        datadir, ids=ds.ids, marker_ids=ds.marker_ids, X=ds.X, y=ds.y,
        gamma=DEFAULT_GAMMA, start_pi=DEFAULT_START_PI,
        estimate_pi=(mode != "fixed_pi"), chain_length=chain_length,
        burnin=burnin, start_h2=start_h2, start_sigma_sq=sigma_sq0,
        start_vare=vare0, seed=seed,
    )

    eng_dir = os.path.join(outdir, f"jwas_{mode}")
    results, sigma_sq = run_engine_chain(
        datadir, mode=mode, sigma_sq0=sigma_sq0, vare0=vare0,
        chain_length=chain_length, burnin=burnin,
        output_folder=os.path.join(eng_dir, "mcmc"),
    )
    fixed = mode == "fixed_pi"
    pi_key = "pi_geno" in results
    write_parity_summary(
        results, eng_dir, sigma_sq=sigma_sq,
        pi_values=None if pi_key else (
            DEFAULT_START_PI if mode != "bayesc" else [0.95]
        ),
        fixed_hyperparameters=False,
    )
    del fixed

    ref_dir = os.path.join(outdir, f"ref_{mode}")
    np_out, pi_values = run_numpy_chain(
        datadir, mode=mode, sigma_sq0=sigma_sq0, vare0=vare0,
        chain_length=chain_length, burnin=burnin, marker_ids=ds.marker_ids,
    )
    numpy_summary_to_csvs(np_out, pi_values, ds.marker_ids, ref_dir)

    report = compare_parity_summaries(
        read_parity_summary(eng_dir), read_parity_summary(ref_dir)
    )
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--mode", default="fixed_pi",
                    choices=["fixed_pi", "estimate_pi", "bayesc"])
    ap.add_argument("--chain-length", type=int, default=30000)
    ap.add_argument("--burnin", type=int, default=5000)
    args = ap.parse_args()
    report = run_parity(args.outdir, mode=args.mode,
                        chain_length=args.chain_length, burnin=args.burnin)
    print("=== scalar metrics (engine vs independent numpy chain) ===")
    print(report["scalar_report"].to_string(index=False))
    print("=== pi ===")
    print(report["pi_report"].to_string(index=False))
    print("=== marker effects (top abs diffs) ===")
    mr = report["marker_report"].sort_values("abs_diff", ascending=False)
    print(mr.head(12).to_string(index=False))
    print(f"marker-effect correlation: {report['marker_correlation']:.6f}")


if __name__ == "__main__":
    main()
