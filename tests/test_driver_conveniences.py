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
