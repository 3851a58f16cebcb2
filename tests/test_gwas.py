"""Window-based GWAS tests.

Mirrors the reference GWAS tests (reference: test/unit/test_gwas_windows.jl):
map-file window construction (fixed and sliding), WPPA localization of
simulated QTL windows, model frequency, two-trait window genetic
correlations, and local EBVs.
"""

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import GWAS, build_model, get_genotypes, runMCMC
from jwas_tpu.io.datasets import simulate_genomic_data


@pytest.fixture(scope="module")
def gwas_run(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("gwas"))
    sim = simulate_genomic_data(n=500, p=200, n_qtl=4, h2=0.7, seed=55)
    geno = get_genotypes(sim["genotypes"], method="BayesC", Pi=0.95, name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(model, sim["phenotypes"], chain_length=1000, burnin=200,
                  seed=12, output_folder=outdir, output_marker_samples=True,
                  output_samples_frequency=5)
    # 1 marker per 0.05 Mb -> 20 markers per 1 Mb window, 10 windows
    map_df = pd.DataFrame(
        {
            "markerID": geno.marker_ids,
            "chromosome": [1] * len(geno.marker_ids),
            "position": (np.arange(len(geno.marker_ids)) * 50_000) + 1,
        }
    )
    return sim, model, out, map_df


def test_model_frequency(gwas_run):
    sim, model, out, map_df = gwas_run
    mf = GWAS(out["_marker_sample_file"])
    assert list(mf.columns) == ["marker_ID", "modelfrequency"]
    assert mf["modelfrequency"].between(0, 1).all()
    # QTL markers should have high model frequency
    geno_ids = list(mf["marker_ID"])
    qtl_names = [f"m{q+1}" for q in sim["qtl"]]
    qtl_rows = mf[mf["marker_ID"].isin(qtl_names)]
    assert qtl_rows["modelfrequency"].mean() > mf["modelfrequency"].mean()
    del geno_ids


def test_window_gwas_localizes_qtl(gwas_run):
    sim, model, out, map_df = gwas_run
    res = GWAS(model, map_df, out["_marker_sample_file"], window_size="1 Mb")
    assert res["numSNP"].sum() == 200
    # windows containing QTL should rank top by WPPA
    qtl_windows = set(sim["qtl"] // 20 + 1)
    top = set(res.head(len(qtl_windows))["window"])
    overlap = len(top & qtl_windows)
    assert overlap >= max(1, len(qtl_windows) - 1), (
        f"QTL windows {qtl_windows} vs top {top}"
    )
    assert (res["WPPA"] <= 1).all() and (res["WPPA"] >= 0).all()


def test_sliding_window_and_props(gwas_run):
    sim, model, out, map_df = gwas_run
    res, props = GWAS(model, map_df, out["_marker_sample_file"],
                      window_size="1 Mb", sliding_window=True,
                      output_winVarProps=True)
    assert len(res) == 200            # one window per marker start
    assert props.shape[0] == 200


def test_local_ebv(gwas_run):
    sim, model, out, map_df = gwas_run
    res, lebv = GWAS(model, map_df, out["_marker_sample_file"],
                     window_size="1 Mb", local_EBV=True)
    assert lebv.shape == (500, 10)
    # sum of local EBVs across windows approximates the genomic EBV shape
    total = lebv.sum(axis=1).to_numpy()
    acc = np.corrcoef(total, sim["true_bv"])[0, 1]
    assert acc > 0.6


def test_gwas_from_packed_store_matches_dense(gwas_run):
    """GWAS accepts a Packed2BitStore: window props/WPPA match the dense-X
    run (decode is exact for integer codes) without a dense (n, p) matrix."""
    from jwas_tpu.io.packed import prepare_packed_genotypes

    sim, model, out, map_df = gwas_run
    store = prepare_packed_genotypes(sim["genotypes"])
    dense = GWAS(model, map_df, out["_marker_sample_file"], window_size="1 Mb")
    packed = GWAS(model, map_df, out["_marker_sample_file"],
                  genotypes=store, window_size="1 Mb")
    assert list(packed["window"]) == list(dense["window"])
    np.testing.assert_allclose(
        packed["prGenVar"], dense["prGenVar"], rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(packed["WPPA"], dense["WPPA"], atol=0.02)


def test_gwas_end_to_end_on_packed_run(tmp_path):
    """A storage='2bit' runMCMC (model carries NO dense genotypes) feeds the
    window GWAS directly: marker sample file -> windows + WPPA
    (GWAS.jl:138-201 workflow at the packed-backend scale)."""
    from jwas_tpu import build_model, get_genotypes, runMCMC
    from jwas_tpu.io.datasets import simulate_genomic_data
    from jwas_tpu.io.packed import prepare_packed_genotypes

    outdir = str(tmp_path / "gwas_packed")
    sim = simulate_genomic_data(n=400, p=160, n_qtl=4, h2=0.7, seed=91)
    store = prepare_packed_genotypes(sim["genotypes"])
    geno = get_genotypes(store, method="BayesC", Pi=0.95, name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    assert model.M[0].genotypes is None        # truly packed-only
    out = runMCMC(model, sim["phenotypes"], chain_length=600, burnin=150,
                  seed=31, output_folder=outdir, output_marker_samples=True,
                  output_samples_frequency=5)
    map_df = pd.DataFrame(
        {
            "markerID": geno.marker_ids,
            "chromosome": [1] * len(geno.marker_ids),
            "position": (np.arange(len(geno.marker_ids)) * 50_000) + 1,
        }
    )
    res = GWAS(model, map_df, out["_marker_sample_file"], window_size="1 Mb")
    assert res["numSNP"].sum() == 160
    assert (res["WPPA"] <= 1).all() and (res["WPPA"] >= 0).all()
    qtl_windows = set(sim["qtl"] // 20 + 1)
    top = set(res.head(len(qtl_windows))["window"])
    assert len(top & qtl_windows) >= 1


def test_window_genetic_correlation(gwas_run, tmp_path):
    sim, model, out, map_df = gwas_run
    f1 = out["_marker_sample_file"]
    # second trait = same effects -> correlation ~ +1 in QTL windows
    res = GWAS(model, map_df, [f1, f1], window_size="1 Mb",
               genetic_correlation=True)
    assert {"estimate_cov", "estimate_cor"} <= set(res.columns)
    qtl_windows = sorted(set(sim["qtl"] // 20 + 1))
    sub = res[res["window"].isin(qtl_windows)]
    # identical effect files give per-sample cor = +1 wherever the window
    # carries signal; samples with a zero-variance window contribute cor 0 by
    # convention (GWAS.jl:226-227), so rarely-included QTL dilute the mean.
    strong = sub.sort_values("estimate_cov", ascending=False).head(3)
    assert (strong["estimate_cor"] > 0.9).all()
    with pytest.raises(ValueError, match="pair"):
        GWAS(model, map_df, f1, genetic_correlation=True)


def test_gwas_backend_invariant_local_ebv(tmp_path):
    """Dense-matrix and 2-bit-packed GWAS produce identical local EBVs and
    window stats: both backends center columns (advisor regression — the
    dense path previously used raw dosages, shifting local_EBV by a
    per-window constant)."""
    import numpy as np

    from jwas_tpu import GWAS
    from jwas_tpu.io.packed import prepare_packed_genotypes

    rng = np.random.default_rng(5)
    n, p, S = 60, 40, 8
    X = rng.binomial(2, 0.4, size=(n, p)).astype(np.float64)
    ids = [f"id{i}" for i in range(n)]
    import pandas as pd

    geno_df = pd.DataFrame(X, columns=[f"m{j}" for j in range(p)])
    geno_df.insert(0, "ID", ids)
    store = prepare_packed_genotypes(geno_df)

    map_df = pd.DataFrame({
        "markerID": [f"m{j}" for j in range(p)],
        "chromosome": [1] * p,
        "position": np.arange(p) * 100_000,
    })
    map_file = tmp_path / "map.csv"
    map_df.to_csv(map_file, index=False)
    samples = rng.normal(size=(S, p)) * (rng.uniform(size=(S, p)) < 0.2)
    sf = tmp_path / "MCMC_samples_marker_effects_geno_y.txt"
    with open(sf, "w") as fh:
        fh.write(",".join(f"m{j}" for j in range(p)) + "\n")
        for s in range(S):
            fh.write(",".join(str(v) for v in samples[s]) + "\n")

    out_d = GWAS(None, str(map_file), str(sf), genotypes=X,
                 window_size="1 Mb", local_EBV=True)
    out_p = GWAS(None, str(map_file), str(sf), genotypes=store,
                 window_size="1 Mb", local_EBV=True)
    df_d, ebv_d = out_d if isinstance(out_d, tuple) else (out_d, None)
    df_p, ebv_p = out_p if isinstance(out_p, tuple) else (out_p, None)
    np.testing.assert_allclose(df_d["prGenVar"], df_p["prGenVar"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(df_d["WPPA"], df_p["WPPA"], atol=1e-12)
    if ebv_d is not None:
        for k in ebv_d:
            np.testing.assert_allclose(ebv_d[k], ebv_p[k],
                                       rtol=1e-4, atol=1e-4)
