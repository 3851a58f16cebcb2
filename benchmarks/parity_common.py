"""Fixed-seed BayesR parity harness: shared dataset / state / CSV machinery.

Python re-implementation of the reference parity harness semantics
(reference: benchmarks/bayesr_parity_common.jl:28-70 dataset + initial state,
:72-180 dataset/summary CSV writers, :315-369 replay-draw machinery). The CSV
schemas are kept byte-compatible with the reference so summaries written by
either implementation are directly comparable; the random numbers themselves
come from our own RNG (bitwise-matching a Julia MersenneTwister stream is not
the goal — the reference compares *replayed draws* and *posterior summaries*,
both RNG-independent).

Artifacts per dataset directory (write_parity_dataset):
  genotypes.csv phenotypes.csv config.csv initial_state.csv initial_scalars.csv
Artifacts per run summary directory (write_parity_summary):
  scalar_metrics.csv pi.csv marker_effects.csv
Replay artifacts:
  replay_draws_iteration1.csv replay_marker_iteration1.csv
  replay_scalar_iteration1.csv
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Optional

import numpy as np
import pandas as pd

DEFAULT_GAMMA = np.array([0.0, 0.01, 0.1, 1.0])
DEFAULT_START_PI = np.array([0.95, 0.03, 0.015, 0.005])
DEFAULT_REPLAY_SEED = 20260318


class ParityDataset(NamedTuple):
    ids: list
    marker_ids: list
    X: np.ndarray
    y: np.ndarray
    allele_freq: np.ndarray
    beta_true: np.ndarray
    mu_true: float


class ParityInitialState(NamedTuple):
    beta0: np.ndarray
    delta0: np.ndarray
    mu0: float
    ycorr0: np.ndarray


def build_bayesr_parity_dataset(seed=2026, n_obs=40, n_markers=12) -> ParityDataset:
    """Same dataset semantics as the reference builder
    (bayesr_parity_common.jl:28-60): binomial(2, p) genotype scores with
    allele frequencies U(0.1, 0.4), three causal markers (0.8, -0.5, 0.3),
    intercept 1.0, unit residual variance."""
    rng = np.random.default_rng(seed)
    ids = [f"id_{i + 1}" for i in range(n_obs)]
    marker_ids = [f"m{j + 1}" for j in range(n_markers)]
    allele_freq = rng.uniform(size=n_markers) * 0.3 + 0.1
    X = (
        (rng.uniform(size=(n_obs, n_markers)) < allele_freq[None, :]).astype(np.float64)
        + (rng.uniform(size=(n_obs, n_markers)) < allele_freq[None, :])
    )
    beta_true = np.zeros(n_markers)
    for idx, effect in zip(range(min(3, n_markers)), (0.8, -0.5, 0.3)):
        beta_true[idx] = effect
    mu_true = 1.0
    y = mu_true + X @ beta_true + rng.standard_normal(n_obs)
    return ParityDataset(ids, marker_ids, X, y, allele_freq, beta_true, mu_true)


def build_bayesr_parity_initial_state(y, n_markers) -> ParityInitialState:
    """Deterministic initial state (bayesr_parity_common.jl:62-70)."""
    mu0 = float(np.mean(y))
    return ParityInitialState(
        beta0=np.zeros(n_markers),
        delta0=np.ones(n_markers, dtype=np.int64),
        mu0=mu0,
        ycorr0=np.asarray(y, dtype=np.float64) - mu0,
    )


def default_start_hyperparameters(y, n_markers, start_h2=0.5,
                                  gamma=DEFAULT_GAMMA, start_pi=DEFAULT_START_PI):
    """start_vare / start_sigma_sq from var(y) (bayesr_parity_jwas.jl:98-101)."""
    vary = float(np.var(y, ddof=1))
    start_vare = vary * (1.0 - start_h2)
    start_sigma_sq = vary * start_h2 / (n_markers * float(np.sum(gamma * start_pi)))
    return start_vare, start_sigma_sq


def write_parity_dataset(outdir, *, ids, marker_ids, X, y, gamma, start_pi,
                         estimate_pi, chain_length, burnin, start_h2,
                         start_sigma_sq, start_vare, seed,
                         initial_state: Optional[ParityInitialState] = None):
    """Dataset CSV bundle in the reference schema
    (bayesr_parity_common.jl:72-136)."""
    if initial_state is None:
        initial_state = build_bayesr_parity_initial_state(y, len(marker_ids))
    os.makedirs(outdir, exist_ok=True)

    geno_df = pd.DataFrame({"ID": ids})
    for j, mid in enumerate(marker_ids):
        geno_df[mid] = X[:, j]
    geno_df.to_csv(os.path.join(outdir, "genotypes.csv"), index=False)

    pd.DataFrame({"ID": ids, "y1": y}).to_csv(
        os.path.join(outdir, "phenotypes.csv"), index=False
    )

    pd.DataFrame(
        {
            "key": ["seed", "chain_length", "burnin", "estimate_pi", "start_h2",
                    "start_sigma_sq", "start_vare", "gamma", "start_pi"],
            "value": [str(seed), str(chain_length), str(burnin),
                      str(bool(estimate_pi)).lower(), str(start_h2),
                      str(start_sigma_sq), str(start_vare),
                      ",".join(str(g) for g in gamma),
                      ",".join(str(p) for p in start_pi)],
        }
    ).to_csv(os.path.join(outdir, "config.csv"), index=False)

    pd.DataFrame(
        {
            "marker_id": marker_ids,
            "beta0": np.asarray(initial_state.beta0, dtype=np.float64),
            "delta0": np.asarray(initial_state.delta0, dtype=np.int64),
        }
    ).to_csv(os.path.join(outdir, "initial_state.csv"), index=False)

    pd.DataFrame(
        {
            "key": ["mu0", "sigmaSq0", "vare0"],
            "value": [str(initial_state.mu0), str(start_sigma_sq), str(start_vare)],
        }
    ).to_csv(os.path.join(outdir, "initial_scalars.csv"), index=False)


def read_parity_config(datadir) -> Dict[str, str]:
    cfg = pd.read_csv(os.path.join(datadir, "config.csv"))
    return {str(r.key): str(r.value) for r in cfg.itertuples()}


def read_parity_initial_state(datadir):
    """(marker_id, beta0, delta0, mu0, sigmaSq0, vare0)
    (bayesr_parity_common.jl:215-227)."""
    st = pd.read_csv(os.path.join(datadir, "initial_state.csv"))
    sc = pd.read_csv(os.path.join(datadir, "initial_scalars.csv"))
    scalar_map = {str(r.key): float(r.value) for r in sc.itertuples()}
    return {
        "marker_id": [str(m) for m in st.marker_id],
        "beta0": st.beta0.to_numpy(dtype=np.float64),
        "delta0": st.delta0.to_numpy(dtype=np.int64),
        "mu0": scalar_map["mu0"],
        "sigmaSq0": scalar_map["sigmaSq0"],
        "vare0": scalar_map["vare0"],
    }


def write_parity_summary(results: Dict[str, pd.DataFrame], outdir, *, sigma_sq,
                         geno_name="geno", pi_values=None,
                         fixed_hyperparameters=False):
    """Summary CSVs from a runMCMC results dict, reference schema
    (write_jwas_parity_summary, bayesr_parity_common.jl:138-180)."""
    os.makedirs(outdir, exist_ok=True)
    marker_effects = results[f"marker effects {geno_name}"]
    residual_variance = results["residual variance"]

    names, values = [], []
    if not fixed_hyperparameters:
        names.append("sigmaSq")
        values.append(float(sigma_sq))
    names.append("residual_variance")
    values.append(float(residual_variance["Estimate"].iloc[0]))
    names.append("mean_nonzero_frequency")
    values.append(float(marker_effects["Model_Frequency"].mean()))
    pd.DataFrame({"metric": names, "value": values}).to_csv(
        os.path.join(outdir, "scalar_metrics.csv"), index=False
    )

    pi_key = f"pi_{geno_name}"
    if pi_key in results:
        # positional 1-based class labels (normalize_pi_class_labels,
        # bayesr_parity_common.jl:7-27; the engine's table is 0-based)
        pi_df = results[pi_key]
        classes = [f"class{i + 1}" for i in range(len(pi_df))]
        pi_out = pd.DataFrame({"class": classes, "estimate": pi_df["Estimate"]})
    elif pi_values is not None:
        pi_out = pd.DataFrame(
            {
                "class": [f"class{i + 1}" for i in range(len(pi_values))],
                "estimate": np.asarray(pi_values, dtype=np.float64),
            }
        )
    else:
        raise ValueError("write_parity_summary requires pi results or pi_values")
    pi_out.to_csv(os.path.join(outdir, "pi.csv"), index=False)

    pd.DataFrame(
        {
            "marker_id": marker_effects["Marker_ID"],
            "estimate": marker_effects["Estimate"],
            "model_frequency": marker_effects["Model_Frequency"],
        }
    ).to_csv(os.path.join(outdir, "marker_effects.csv"), index=False)


def read_parity_summary(outdir):
    return {
        "scalar_metrics": pd.read_csv(os.path.join(outdir, "scalar_metrics.csv")),
        "pi": pd.read_csv(os.path.join(outdir, "pi.csv")),
        "marker_effects": pd.read_csv(os.path.join(outdir, "marker_effects.csv")),
    }


# ---------------------------------------------------------------------------
# Fixed-draw replay machinery (bayesr_parity_common.jl:315-369): one Gibbs
# iteration's raw random draws are pre-generated into a CSV so two independent
# implementations can consume byte-identical randomness.
# ---------------------------------------------------------------------------


def build_bayesr_replay_draws(n_markers, seed=DEFAULT_REPLAY_SEED) -> pd.DataFrame:
    """Draw schedule for one BayesR Gibbs iteration: 1 mu normal, p class
    uniforms, p effect normals, 2 chi-square draws
    (build_bayesr_replay_draws, bayesr_parity_common.jl:315-341)."""
    rng = np.random.default_rng(seed)
    kinds = ["mu_normal"]
    indices = [1]
    values = [rng.standard_normal()]
    for j in range(n_markers):
        kinds.append("marker_class_uniform")
        indices.append(j + 1)
        values.append(rng.uniform())
    for j in range(n_markers):
        kinds.append("marker_beta_normal")
        indices.append(j + 1)
        values.append(rng.standard_normal())
    kinds += ["sigma_chisq", "vare_chisq"]
    indices += [1, 1]
    values += list(rng.chisquare(1.0, size=2))
    return pd.DataFrame({"kind": kinds, "index": indices, "value": values})


def draw_value(draws: pd.DataFrame, kind: str, idx: int = 1) -> float:
    m = draws[(draws["kind"] == kind) & (draws["index"] == idx)]
    if len(m) != 1:
        raise ValueError(f"expected exactly one replay draw for {kind}[{idx}]")
    return float(m["value"].iloc[0])


def choose_class(probs, u_class) -> int:
    """First class whose cumulative probability reaches u (1-based;
    bayesr_parity_replay_jwas.jl:38-42)."""
    cum = np.cumsum(np.asarray(probs, dtype=np.float64))
    hits = np.nonzero(cum >= u_class)[0]
    return int(hits[0]) + 1 if len(hits) else len(probs)


def ensure_replay_dataset(outdir, *, seed=2026, n_obs=40, n_markers=12,
                          start_h2=0.5):
    """Create (once) the parity dataset + replay draw CSVs under
    <outdir>/data (ensure_replay_dataset, bayesr_parity_replay_jwas.jl:62-97)."""
    datadir = os.path.join(outdir, "data")
    if not os.path.isfile(os.path.join(datadir, "config.csv")):
        ds = build_bayesr_parity_dataset(seed=seed, n_obs=n_obs, n_markers=n_markers)
        start_vare, start_sigma_sq = default_start_hyperparameters(
            ds.y, n_markers, start_h2
        )
        write_parity_dataset(
            datadir,
            ids=ds.ids, marker_ids=ds.marker_ids, X=ds.X, y=ds.y,
            gamma=DEFAULT_GAMMA, start_pi=DEFAULT_START_PI, estimate_pi=False,
            chain_length=1, burnin=0, start_h2=start_h2,
            start_sigma_sq=start_sigma_sq, start_vare=start_vare, seed=seed,
        )
    draws_path = os.path.join(datadir, "replay_draws_iteration1.csv")
    if not os.path.isfile(draws_path):
        geno = pd.read_csv(os.path.join(datadir, "genotypes.csv"))
        build_bayesr_replay_draws(geno.shape[1] - 1).to_csv(draws_path, index=False)
    return datadir


# ---------------------------------------------------------------------------
# Comparison helpers (bayesr_parity_common.jl:371-520).
# ---------------------------------------------------------------------------

REPLAY_MARKER_COLUMNS = [
    "marker_id", "rhs", "old_alpha", "p_class1", "p_class2", "p_class3",
    "p_class4", "u_class", "chosen_class", "beta_hat_chosen", "inv_lhs_chosen",
    "z_beta", "new_alpha", "ycorr_norm_after",
]
REPLAY_SCALAR_FIELDS = [
    "mu_old", "mu_hat", "z_mu", "mu_new", "sigmaSq_old", "ssq", "nnz",
    "chisq_sigma", "sigmaSq_new", "vare_old", "chisq_vare", "vare_new",
]


def compare_replay_marker_tables(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
    merged = a.merge(b, on="marker_id", suffixes=("_a", "_b"))
    for col in REPLAY_MARKER_COLUMNS:
        if col == "marker_id":
            continue
        merged[f"{col}_abs_diff"] = np.abs(merged[f"{col}_a"] - merged[f"{col}_b"])
    return merged


def compare_replay_scalar_tables(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
    merged = a.merge(b, on="field", suffixes=("_a", "_b"))
    merged["abs_diff"] = np.abs(merged["value_a"] - merged["value_b"])
    return merged


def compare_parity_summaries(a: Dict[str, pd.DataFrame], b: Dict[str, pd.DataFrame]):
    """Scalar / pi / marker-effect comparison with the marker correlation
    headline (compare_parity_summaries, bayesr_parity_common.jl:469-496)."""
    scalars = a["scalar_metrics"].merge(b["scalar_metrics"], on="metric",
                                        suffixes=("_a", "_b"))
    scalars["abs_diff"] = np.abs(scalars["value_a"] - scalars["value_b"])
    scalars["rel_diff"] = scalars["abs_diff"] / np.maximum(
        np.abs(scalars["value_b"]), np.finfo(np.float64).eps
    )
    pi = a["pi"].merge(b["pi"], on="class", suffixes=("_a", "_b"))
    pi["abs_diff"] = np.abs(pi["estimate_a"] - pi["estimate_b"])
    markers = a["marker_effects"].merge(b["marker_effects"], on="marker_id",
                                        suffixes=("_a", "_b"))
    markers["abs_diff"] = np.abs(markers["estimate_a"] - markers["estimate_b"])
    markers["model_frequency_abs_diff"] = np.abs(
        markers["model_frequency_a"] - markers["model_frequency_b"]
    )
    corr = float(np.corrcoef(markers["estimate_a"], markers["estimate_b"])[0, 1])
    return {
        "scalar_report": scalars,
        "pi_report": pi,
        "marker_report": markers,
        "marker_correlation": corr,
    }
