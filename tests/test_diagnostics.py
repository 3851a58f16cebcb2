"""Diagnostics (PSRF, traceplot, LOOCV) and memory-guard tests.

Mirrors the reference misc/guardrail tests (reference:
test/unit/test_misc_coverage.jl, test_memory_guardrails.jl).
"""

import numpy as np
import pytest

from jwas_tpu import PSRF, LOOCV, traceplot
from jwas_tpu.utils.memory import (
    check_marker_memory_guard,
    estimate_marker_memory,
    format_bytes_human,
)


def test_psrf_converged_chains_near_one():
    rng = np.random.default_rng(0)
    chains = [rng.normal(0.0, 1.0, 4000) for _ in range(4)]
    r = PSRF(*chains)
    assert 0.98 < r < 1.02


def test_psrf_diverged_chains_large():
    rng = np.random.default_rng(1)
    a = rng.normal(0.0, 1.0, 2000)
    b = rng.normal(5.0, 1.0, 2000)
    assert PSRF(a, b) > 2.0
    with pytest.raises(ValueError):
        PSRF(a)


def test_loocv_matches_bruteforce():
    rng = np.random.default_rng(2)
    n, p = 40, 8
    X = rng.normal(size=(n, p))
    beta = rng.normal(size=p)
    y = 1.0 + X @ beta + rng.normal(0, 0.5, n)
    vara, vare = 1.0, 0.25
    e = LOOCV(X, y, vara, vare, verbose=False)

    # brute force: refit ridge leaving each observation out
    lam = vare / vara
    Xf = np.column_stack([np.ones(n), X])
    ident = np.eye(p + 1)
    ident[0, 0] = 0.0
    for i in [0, 7, 23]:
        keep = np.arange(n) != i
        Xi, yi = Xf[keep], y[keep]
        bi = np.linalg.solve(Xi.T @ Xi + ident * lam, Xi.T @ yi)
        pred = Xf[i] @ bi
        np.testing.assert_allclose(e[i], y[i] - pred, rtol=1e-8)


def test_loocv_bv_branch_runs():
    rng = np.random.default_rng(3)
    n, p = 30, 100
    X = rng.normal(size=(n, p))
    y = X @ rng.normal(size=p) * 0.1 + rng.normal(size=n)
    e = LOOCV(X, y, 1.0, 1.0, verbose=False)
    assert e.shape == (n,)
    assert np.isfinite(e).all()


def test_traceplot_writes_png(tmp_path):
    rng = np.random.default_rng(4)
    path = str(tmp_path / "trace.png")
    fig = traceplot(rng.normal(size=(200, 3)), nplots=2, save_path=path)
    assert fig is not None
    import os

    assert os.path.exists(path)


def test_memory_guard_estimate_and_policy():
    est = estimate_marker_memory(
        n_obs=50_000, n_markers=2_000_000, block_size=224, n_out=50_000, n_loc=10
    )
    # 50k x ~2M f32 = ~400 GB genotypes; must exceed a 16 GiB budget
    assert est.bytes_genotypes > 300e9
    with pytest.raises(MemoryError):
        check_marker_memory_guard(est, policy="error", total_bytes=16 * 1024**3)
    with pytest.warns(UserWarning):
        check_marker_memory_guard(est, policy="warn", total_bytes=16 * 1024**3)
    check_marker_memory_guard(est, policy="off", total_bytes=1)  # no-op
    with pytest.raises(ValueError):
        check_marker_memory_guard(est, policy="nope")
    assert format_bytes_human(1536) == "1.50 KiB"


def test_memory_guard_in_runmcmc():
    import pandas as pd

    from jwas_tpu import build_model, get_genotypes, runMCMC

    rng = np.random.default_rng(5)
    n, p = 60, 30
    X = rng.binomial(2, 0.4, (n, p)).astype(np.float32)
    ids = [f"i{k}" for k in range(n)]
    gdf = pd.DataFrame(X, columns=[f"m{j}" for j in range(p)])
    gdf.insert(0, "ID", ids)
    ph = pd.DataFrame({"ID": ids, "y": X @ rng.normal(0, 0.3, p) + rng.normal(size=n)})
    geno = get_genotypes(gdf, method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    with pytest.raises(MemoryError):
        runMCMC(model, ph, chain_length=5, output_folder="",
                memory_guard="error", memory_guard_ratio=1e-9)


def test_lsmeans_and_getEBV(tmp_path):
    """lsmeans reproduces the reference grid logic (misc.jl:7-38) on a model
    with a fixed factor + covariate; getEBV returns the EBV table."""
    import pandas as pd
    from jwas_tpu import build_model, get_genotypes, getEBV, lsmeans, runMCMC
    from jwas_tpu.io.datasets import simulate_genomic_data

    sim = simulate_genomic_data(n=200, p=80, n_qtl=8, h2=0.5, seed=2)
    ph = sim["phenotypes"].copy()
    rng = np.random.default_rng(0)
    ph["sex"] = rng.choice(["m", "f"], size=len(ph))
    ph["age"] = rng.uniform(1.0, 3.0, size=len(ph))
    ph.loc[ph.sex == "m", "y"] += 2.0

    geno = get_genotypes(sim["genotypes"], method="RR-BLUP", name="geno")
    model = build_model("y = intercept + sex + age + geno", genotypes=geno)
    from jwas_tpu import set_covariate
    set_covariate(model, "age")
    out = runMCMC(model, ph, chain_length=300, burnin=50, seed=4,
                  output_folder=str(tmp_path / "r"))

    ls = lsmeans(model, out)
    assert set(ls.columns) == {"Trait", "Effect", "Level", "lsmean"}
    sex_rows = ls[ls.Effect == "sex"].set_index("Level")
    # male lsmean should exceed female by roughly the simulated +2 shift
    assert 1.0 < sex_rows.loc["m", "lsmean"] - sex_rows.loc["f", "lsmean"] < 3.0
    # every fixed categorical level appears exactly once
    assert len(sex_rows) == 2

    ebv = getEBV(out)                     # single trait: name optional
    pd.testing.assert_frame_equal(ebv, out["EBV_y"])
    ebv2 = getEBV(out, "y")
    pd.testing.assert_frame_equal(ebv2, out["EBV_y"])
    with pytest.raises(KeyError):
        getEBV(out, "nope")


def test_read_sample_file_marker_variances_both_conventions(tmp_path):
    """marker_effects_variances_ files are headerless for ST/MT but carry a
    coeff-pair header for RRM (samples_io.py:292) — the reader must sniff
    this kind instead of assuming either convention (advisor regression)."""
    from jwas_tpu.analysis.diagnostics import _read_sample_file

    st = tmp_path / "MCMC_samples_marker_effects_variances_geno.txt"
    st.write_text("0.5\n0.6\n0.7\n")
    labels, arr = _read_sample_file(str(st))
    assert arr.shape == (3, 1)
    assert arr[0, 0] == 0.5            # first line is DATA, not a header

    rrm = tmp_path / "MCMC_samples_marker_effects_variances_geno2.txt"
    rrm.write_text(
        "coeff1_coeff1,coeff1_coeff2,coeff2_coeff2\n0.1,0.0,0.2\n0.3,0.1,0.4\n"
    )
    labels, arr = _read_sample_file(str(rrm))
    assert labels == ["coeff1_coeff1", "coeff1_coeff2", "coeff2_coeff2"]
    assert arr.shape == (2, 3)         # header consumed as labels
