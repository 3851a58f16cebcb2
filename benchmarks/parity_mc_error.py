"""Monte-Carlo error calibration for the posterior-parity tolerances.

The parity tests (tests/test_parity.py) compare ONE engine chain against ONE
independent NumPy chain at L=8000/burnin=2000 and assert summary statistics
agree within a tolerance. Those tolerances must be justified by the
Monte-Carlo error of the statistics themselves: two *exact* independent
chains of finite length differ by O(MC error), and a tolerance below that
level fails on noise, not bias (the round-4 red test:
mean_nonzero_frequency abs_diff 0.0213 vs a 0.02 bound).

This script measures the across-seed spread of each parity summary statistic
with the independent NumPy sampler (benchmarks/parity_numpy_chain.py) on the
fixed parity dataset, and prints the implied bound for the difference of two
independent chains:  sd(diff) = sqrt(2) * sd(single chain),  bound(99%) =
2.576 * sd(diff).

Run:  python benchmarks/parity_mc_error.py [n_seeds] [chain_length]
Results (24 seeds, L=8000, burnin=2000, measured 2026-08-21, round 5):

  mode=estimate_pi  mean_nonzero_frequency: mean=0.6457 sd=0.0147
                    -> sd(diff)=0.0208, 99% bound = 0.054
                    sigmaSq rel bound99 = 0.105, residual rel = 0.022
  mode=fixed_pi     mean_nonzero_frequency: sd=0.0008, bound99 = 0.0028
                    sigmaSq rel bound99 = 0.092, residual rel = 0.0099
  BayesC (numpy_bayesc_chain, same shape):
                    mean_nonzero_frequency bound99 = 0.0146, pi = 0.0147

Bias cross-check (same session): 4 engine chains at L=8000 give
mean_nonzero_frequency 0.6601 +- 0.009 (se); the NumPy chain's long-L
asymptote is 0.6487 (4 seeds at L=100k) with a visible burn-in transient
(0.6457 at L=8k -> 0.6501 at L=30k). Engine vs asymptote differ by
0.011 +- 0.009 — within joint MC error, i.e. no demonstrable sampler
bias; the round-4 red test was MC noise on an uncalibrated bound.

The test tolerances in tests/test_parity.py are set to the 99% bounds from
this script; with 3 parity chain-comparisons in the default suite the
family-wise false-failure rate is ~3%.
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.parity_common import (  # noqa: E402
    DEFAULT_START_PI,
    build_bayesr_parity_dataset,
    default_start_hyperparameters,
)
from benchmarks.parity_numpy_chain import numpy_bayesr_chain  # noqa: E402


def measure(mode: str, n_seeds: int, chain_length: int, burnin: int):
    ds = build_bayesr_parity_dataset()
    vare0, sigma_sq0 = default_start_hyperparameters(ds.y, ds.X.shape[1])
    stats = {"mean_nonzero_frequency": [], "sigmaSq": [],
             "residual_variance": []}
    for seed in range(n_seeds):
        out = numpy_bayesr_chain(
            ds.X, ds.y, sigma_sq0=sigma_sq0, vare0=vare0,
            pi0=DEFAULT_START_PI, chain_length=chain_length, burnin=burnin,
            estimate_pi=(mode == "estimate_pi"), seed=seed,
        )
        stats["mean_nonzero_frequency"].append(out["mean_nonzero_frequency"])
        stats["sigmaSq"].append(out["sigma_sq"])
        stats["residual_variance"].append(out["vare"])
    print(f"# mode={mode} seeds={n_seeds} L={chain_length} burnin={burnin}")
    for k, v in stats.items():
        v = np.asarray(v)
        sd = v.std(ddof=1)
        sdd = sd * math.sqrt(2.0)
        print(f"{k}: mean={v.mean():.4f} sd={sd:.4f} "
              f"sd_diff={sdd:.4f} bound99={2.576 * sdd:.4f} "
              f"rel_bound99={2.576 * sdd / abs(v.mean()):.4f}")


if __name__ == "__main__":
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    for mode in ("estimate_pi", "fixed_pi"):
        measure(mode, n_seeds, L, L // 4)
