"""Driver conveniences: printout_frequency, describe/getMCMCinfo,
add_genotypes shim, profiler flag (JWAS.jl:520-700, readgenotypes.jl:24-47,
MCMC_BayesianAlphabet.jl:417-420)."""

import warnings

import numpy as np
import pytest

from jwas_tpu import (
    add_genotypes,
    build_model,
    describe,
    getMCMCinfo,
    get_genotypes,
    runMCMC,
)
from jwas_tpu.io.datasets import simulate_genomic_data

SIM = simulate_genomic_data(n=120, p=40, n_qtl=5, h2=0.5, seed=4)


def test_printout_frequency_progress(capsys):
    geno = get_genotypes(SIM["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    runMCMC(model, SIM["phenotypes"], chain_length=100, burnin=20,
            output_samples_frequency=10, printout_frequency=20, seed=1,
            output_folder="", printout_model_info=False)
    out = capsys.readouterr().out
    assert "iteration" in out
    assert "residual variance:" in out
    assert "s window" in out


def test_describe_and_getmcmcinfo(capsys):
    geno = get_genotypes(SIM["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    runMCMC(model, SIM["phenotypes"], chain_length=20, burnin=0,
            output_samples_frequency=5, seed=1, output_folder="",
            printout_model_info=True)
    out = capsys.readouterr().out
    assert "A Linear Mixed Model was built" in out
    assert "MCMC Information:" in out
    assert "chain_length" in out
    assert "Genomic Information" in out
    # standalone printers also work post-run
    describe(model)
    getMCMCinfo(model)
    out2 = capsys.readouterr().out
    assert "Hyper-parameters Information:" in out2


def test_add_genotypes_deprecation_shim():
    model = build_model("y = intercept")
    with pytest.warns(DeprecationWarning, match="add_genotypes is deprecated"):
        g = add_genotypes(model, SIM["genotypes"], 1.0, method="BayesC",
                          name="geno")
    assert model.M and model.M[0] is g
    out = runMCMC(model, SIM["phenotypes"], chain_length=100, burnin=20,
                  output_samples_frequency=10, seed=2, output_folder="",
                  printout_model_info=False)
    acc = np.corrcoef(out["EBV_y"]["EBV"], SIM["true_bv"])[0, 1]
    assert acc > 0.5


def test_profile_flag_writes_trace(tmp_path):
    geno = get_genotypes(SIM["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    folder = str(tmp_path / "prof")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        runMCMC(model, SIM["phenotypes"], chain_length=20, burnin=0,
                output_samples_frequency=5, seed=1, output_folder=folder,
                profile=True, printout_model_info=False)
    import os

    prof_dir = os.path.join(folder, "profile")
    assert os.path.isdir(prof_dir)
    found = any(fn for _, _, fns in os.walk(prof_dir) for fn in fns)
    assert found, "no profiler trace files written"


def test_starting_value_for_location_parameters():
    """starting_value seeds the location parameters in term_names() order
    (init_mixed_model_equations, input_data_validation.jl:491-526)."""
    geno = get_genotypes(SIM["genotypes"], method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(model, SIM["phenotypes"], chain_length=50, burnin=10,
                  output_samples_frequency=5, seed=1, output_folder="",
                  starting_value=[2.5], printout_model_info=False)
    assert np.isfinite(out["location parameters"]["Estimate"]).all()
    # wrong length fails fast
    geno2 = get_genotypes(SIM["genotypes"], method="BayesC", name="geno")
    model2 = build_model("y = intercept + geno", genotypes=geno2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="starting values"):
        runMCMC(model2, SIM["phenotypes"], chain_length=10, output_folder="",
                starting_value=[1.0, 2.0, 3.0], printout_model_info=False)


def test_annotation_file_schema_validation():
    """Annotation inputs accept marker_id-keyed tables and reject constant /
    collinear designs (readgenotypes.jl:56-158)."""
    import pandas as pd
    import pytest as _pytest

    rng = np.random.default_rng(0)
    p = SIM["genotypes"].shape[1] - 1
    mids = list(SIM["genotypes"].columns[1:])
    tab = pd.DataFrame({"marker_id": mids,
                        "f1": rng.normal(size=p),
                        "f2": rng.normal(size=p)})
    shuffled = tab.sample(frac=1.0, random_state=1)
    g = get_genotypes(SIM["genotypes"], method="BayesC", name="geno",
                      annotations=shuffled)
    np.testing.assert_allclose(
        g.annotations[:, 0], tab["f1"].to_numpy(), atol=1e-12
    )

    with _pytest.raises(ValueError, match="constant column"):
        get_genotypes(SIM["genotypes"], method="BayesC", name="geno",
                      annotations=np.ones((p, 1)))
    dup = rng.normal(size=(p, 1))
    with _pytest.raises(ValueError, match="collinear"):
        get_genotypes(SIM["genotypes"], method="BayesC", name="geno",
                      annotations=np.hstack([dup, dup]))
    with _pytest.raises(ValueError, match="missing marker"):
        get_genotypes(SIM["genotypes"], method="BayesC", name="geno",
                      annotations=tab.iloc[:-3])
    with _pytest.warns(UserWarning, match="estimatePi=False is ignored"):
        get_genotypes(SIM["genotypes"], method="BayesC", name="geno",
                      estimatePi=False,
                      annotations=rng.normal(size=(p, 1)))
