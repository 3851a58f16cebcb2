"""Convergence diagnostics and closed-form cross-validation.

From-scratch equivalents of the reference misc/diagnostics layer (reference:
src/1.JWAS/src/4.misc/misc/convergence_diagnosis.jl and pipeline/LOOCV.jl):

- `PSRF` — Gelman-Rubin potential scale reduction factor over >=2 chains
  (convergence_diagnosis.jl:31-57);
- `traceplot` — per-parameter trace plus running mean, saved to a PNG
  (convergence_diagnosis.jl:1-29); matplotlib is optional;
- `LOOCV` — closed-form leave-one-out PRESS residuals for the ridge /
  BLUP model, equation-level when p << n, individual-level otherwise
  (LOOCV.jl eMEM/eBV).

These accept in-memory arrays/DataFrames or the sample files written by
`runMCMC` (one column per parameter, one row per saved sample).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def _load_chain(obj, header: bool = True) -> np.ndarray:
    if isinstance(obj, str):
        df = pd.read_csv(obj, header=0 if header else None)
        return df.to_numpy(dtype=np.float64)
    return np.asarray(obj, dtype=np.float64)


def PSRF(*chains, header: bool = True) -> float:
    """Gelman-Rubin potential scale reduction factor (convergence_diagnosis.jl:31-57).

    chains: >=2 sample files or arrays (each one chain, any shape; flattened
    exactly as the reference flattens with mean/std over the whole table).
    Values near 1 indicate convergence.
    """
    if len(chains) < 2:
        raise ValueError("PSRF needs at least two chains")
    flat = [_load_chain(cobj, header=header).reshape(-1) for cobj in chains]
    lengths = {len(x) for x in flat}
    if len(lengths) > 1:
        # unequal-length chains: truncate to the shortest so B/W use one N
        N = min(lengths)
        flat = [x[:N] for x in flat]
    else:
        N = lengths.pop()
    if N < 2:
        raise ValueError("PSRF needs at least two samples per chain")
    means = [x.mean() for x in flat]
    variances = [x.std(ddof=1) ** 2 for x in flat]
    M = len(chains)
    means = np.asarray(means)
    B = N / (M - 1) * np.sum((means - means.mean()) ** 2)
    W = float(np.mean(variances))
    V = (N - 1) / N * W + (M + 1) / (N * M) * B
    return V / W


# sample-file kinds the writer emits WITHOUT a header row (samples_io.py).
# NOTE: marker_effects_variances_ is NOT here — ST/MT streams write it
# headerless but the RRM stream registers it WITH a coeff-pair header
# (samples_io.py:292), so that kind must be sniffed.
_HEADERLESS_KINDS = (
    "pi_", "liabilities_", "threshold_",
)


def _read_sample_file(path: str, header=None):
    """Read one MCMC sample file; returns (labels, (n_samples, k) array).

    Header presence is decided by the writer's own convention (file-name
    kind) rather than by sniffing, so marker-effect files whose IDs are all
    numeric still have their header row treated as labels, not as a sample.
    Pass header=True/False to override for files not written by runMCMC.
    """
    import os

    if header is None:
        base = os.path.basename(path)
        stem = base[13:] if base.startswith("MCMC_samples_") else base
        if stem.startswith("marker_effects_variances_"):
            header = None        # ST/MT headerless, RRM headered: sniff below
        elif any(stem.startswith(k) for k in _HEADERLESS_KINDS):
            header = False
        elif stem.startswith(("marker_effects_", "EBV_")):
            header = True        # always written with an ID header row
        if header is None:
            # mixed-convention kind or unknown origin: sniff (closed handle)
            with open(path) as fh:
                first = fh.readline().strip()
            header = False
            for tok in first.split(","):
                try:
                    float(tok)
                except ValueError:
                    header = True
                    break
    df = pd.read_csv(path, header=0 if header else None)
    labels = [str(c) for c in df.columns]
    return labels, df.to_numpy(dtype=np.float64)


def PSRF_per_parameter(*paths, max_params: int = 0) -> pd.DataFrame:
    """Per-parameter Gelman-Rubin PSRF from per-chain MCMC sample files.

    paths: the SAME parameter's sample file from >=2 chains (e.g.
    `chain_1/MCMC_samples_marker_effects_geno_y.txt`, `chain_2/...` written
    by runMCMC(..., n_chains=K, output_chain_samples=True)). One row per
    column (parameter level / marker), PSRF computed column-wise — the
    per-parameter refinement of the reference's whole-table PSRF
    (convergence_diagnosis.jl:31-57).
    """
    if len(paths) < 2:
        raise ValueError("PSRF_per_parameter needs files from >=2 chains")
    labels = None
    mats = []
    for p_ in paths:
        lab, arr = _read_sample_file(p_)
        labels = lab if labels is None else labels
        mats.append(arr)
    N = min(m.shape[0] for m in mats)
    k = min(m.shape[1] for m in mats)
    if max_params:
        k = min(k, int(max_params))
    rows = []
    for j in range(k):
        cols = [m[:N, j] for m in mats]
        if all(np.std(c) == 0.0 for c in cols):
            continue
        rows.append((labels[j], float(PSRF(*cols, header=False))))
    return pd.DataFrame(rows, columns=["parameter", "PSRF"])


def traceplot(samples, labels: Sequence[str] = (), nplots: int = 4,
              header: bool = True, save_path: str = "traceplot.png"):
    """Trace + running-mean plot of the first `nplots` parameters
    (convergence_diagnosis.jl:1-29). Returns the matplotlib figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if isinstance(samples, str):
        df = pd.read_csv(samples, header=0 if header else None)
        labels = [str(c) for c in df.columns]
        chain = df.to_numpy(dtype=np.float64)
    else:
        chain = np.atleast_2d(np.asarray(samples, dtype=np.float64))
        if chain.shape[0] == 1:
            chain = chain.T
        if not labels:
            labels = [f"param{i+1}" for i in range(chain.shape[1])]
    k = min(nplots, chain.shape[1])
    steps = np.arange(1, chain.shape[0] + 1)
    fig, axes = plt.subplots(k, 1, figsize=(8, 2.2 * k), squeeze=False)
    for i in range(k):
        ax = axes[i][0]
        ax.plot(steps, chain[:, i], lw=0.6)
        ax.plot(steps, np.cumsum(chain[:, i]) / steps, color="green", lw=1.2)
        ax.set_title(str(labels[i]), loc="left", fontsize=9)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    return fig


def LOOCV(X, y, vara: float, vare: float, verbose: bool = True) -> np.ndarray:
    """Closed-form leave-one-out PRESS residuals (LOOCV.jl).

    X: (n, p) marker covariates (no intercept column; one is added);
    y: (n,) phenotypes; vara/vare: marker-effect and residual variances.
    Returns the PRESS residuals e with e_i = (y_i - yhat_i) / (1 - h_ii).
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    n, p = X.shape
    lam = vare / vara
    if n > p:
        # marker-effects model (eMEM): ridge hat matrix on [1 X]
        Xf = np.column_stack([np.ones(n), X])
        ident = np.eye(p + 1)
        ident[0, 0] = 0.0
        H0 = np.linalg.inv(Xf.T @ Xf + ident * lam)
        beta = H0 @ (Xf.T @ y)
        h = np.einsum("ij,jk,ik->i", Xf, H0, Xf)
        e = (y - Xf @ beta) / (1.0 - h)
    else:
        # breeding-value model (eBV): u ~ N(0, XX' vara)
        Z = np.column_stack([np.ones(n), np.eye(n)])
        G = X @ X.T
        if np.linalg.matrix_rank(G) < n:
            G = G + np.eye(n) * 0.01
        Hsub = np.eye(n) + np.linalg.inv(G) * lam
        H0 = np.linalg.inv(
            np.block([[np.array([[float(n)]]), np.ones((1, n))],
                      [np.ones((n, 1)), Hsub]])
        )
        beta = H0 @ (Z.T @ y)
        h = np.einsum("ij,jk,ik->i", Z, H0, Z)
        e = (y - Z @ beta) / (1.0 - h)
    if verbose:
        print(f"mean square of error is {float(e @ e / n)}")
        print(f"prediction accuracy is {float(np.corrcoef(y, y + e)[0, 1])}")
    return e


def lsmeans(model, results) -> "pd.DataFrame":
    """Least-squares means of the fixed categorical effects (misc.jl:7-38).

    For each fixed categorical term, lsmean(level) = Estimate(level) + the
    mean contribution of every other fixed term of the same trait (covariates
    and the intercept enter at their data mean x the estimate).

    model: the fitted Model; results: the runMCMC results dict (uses the
    "location parameters" table). Returns columns Trait/Effect/Level/lsmean.
    """
    import pandas as pd

    lp = results["location parameters"]
    rows = []
    for trait in model.lhs_vec:
        terms = [t for t in model.terms
                 if t.random_type == "fixed" and t.trait_name == trait]
        contribs = {}
        for t in terms:
            effect = t.trm_str.split(":", 1)[1]
            sel = lp[(lp.Trait == trait) & (lp.Effect == effect)]
            est = sel.Estimate.to_numpy(dtype=float)
            if len(est) == 0:
                continue
            if t.n_levels == 1:
                xbar = float(np.mean(t.val)) if t.val is not None else 1.0
                contribs[effect] = ("scalar", xbar * est[0])
            else:
                contribs[effect] = ("cat", sel.Level.tolist(), est)
        for effect, c in contribs.items():
            if c[0] != "cat":
                continue
            base = 0.0
            for e2, c2 in contribs.items():
                if e2 == effect:
                    continue
                base += c2[1] if c2[0] == "scalar" else float(np.mean(c2[2]))
            for lev, e in zip(c[1], c[2]):
                rows.append((trait, effect, lev, float(e) + base))
    return pd.DataFrame(rows, columns=["Trait", "Effect", "Level", "lsmean"])


def getEBV(results, trait: str = None) -> "pd.DataFrame":
    """Return the EBV/PEV table for `trait` from a runMCMC results dict
    (the public getEBV export; internal computation at output.jl:281-306).
    With one trait the name may be omitted."""
    keys = [k for k in results if k.startswith("EBV_")]
    if trait is not None:
        key = f"EBV_{trait}"
        if key not in results:
            raise KeyError(f"no {key!r} in results; available: {keys}")
        return results[key]
    if len(keys) != 1:
        raise ValueError(f"specify the trait; available: {keys}")
    return results[keys[0]]
