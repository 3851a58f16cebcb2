"""Admission-control compat matrix (errors_args, input_data_validation.jl:9-141).

Every unsupported method x feature combination must fail fast at workspace
preparation with a reference-style message — never deep inside jit.
"""

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import build_model, get_genotypes, runMCMC
from jwas_tpu.io.datasets import simulate_genomic_data, simulate_genomic_data_mt
from jwas_tpu.io.packed import prepare_packed_genotypes

SIM = simulate_genomic_data(n=60, p=24, n_qtl=4, h2=0.5, seed=1)
SIM_MT = simulate_genomic_data_mt(n=60, p=24, n_qtl=4, seed=1)


def _st_model(method="BayesC", **gkw):
    geno = get_genotypes(SIM["genotypes"], 1.0, method=method, name="geno", **gkw)
    return build_model("y = intercept + geno", 1.0, genotypes=geno)


def _mt_model(method="BayesC", **gkw):
    geno = get_genotypes(SIM_MT["genotypes"], np.eye(2), method=method,
                         name="geno", **gkw)
    return build_model("y1 = intercept + geno\ny2 = intercept + geno",
                       np.eye(2), genotypes=geno)


def _packed_model(method="BayesC", **gkw):
    store = prepare_packed_genotypes(SIM["genotypes"])
    geno = get_genotypes(store, 1.0, G_is_marker_variance=True, method=method,
                         name="geno", **gkw)
    return build_model("y = intercept + geno", 1.0, genotypes=geno)


def _expect(match, model, df=None, **kw):
    kw.setdefault("chain_length", 10)
    kw.setdefault("output_folder", "")
    kw.setdefault("printout_model_info", False)
    with pytest.raises(ValueError, match=match):
        runMCMC(model, SIM["phenotypes"] if df is None else df, **kw)


def test_bayesr_multitrait_rejected():
    _expect("BayesR supports single-trait", _mt_model("BayesR"),
            df=SIM_MT["phenotypes"])


def test_bayesr_rrm_rejected():
    from jwas_tpu.ops.rrm import generate_full_phi

    _expect("BayesR does not support random regression",
            _st_model("BayesR"), RRM=generate_full_phi([1.0, 2.0, 3.0, 4.0], 3))


def test_ssgblup_rejected():
    from jwas_tpu import get_pedigree
    from jwas_tpu.io.datasets import simulate_pedigree_genomic_data

    fam = simulate_pedigree_genomic_data(n_founders=10, n_gen=2, n_per_gen=20,
                                         p=20, n_qtl=3, seed=2)
    ped = get_pedigree(fam["pedigree"])
    geno = get_genotypes(fam["genotypes"], 1.0, method="GBLUP", name="geno")
    model = build_model("y = intercept + geno", 1.0, genotypes=geno)
    _expect("SSGBLUP is not available", model, df=fam["phenotypes"],
            single_step_analysis=True, pedigree=ped)


def test_single_step_without_genotypes_rejected():
    model = build_model("y = intercept")
    _expect("Genomic information is required", model, single_step_analysis=True)


def test_single_step_without_pedigree_rejected():
    _expect("pedigree is required for single-step", _st_model(),
            single_step_analysis=True)


def test_packed_double_precision_rejected():
    _expect("Float32 only", _packed_model(), double_precision=True)


def test_packed_single_step_rejected():
    _expect("does not support single-step", _packed_model(),
            single_step_analysis=True, pedigree=object())


def test_packed_heterogeneous_residuals_rejected():
    df = SIM["phenotypes"].copy()
    df["weights"] = 1.0
    _expect("does not support heterogeneous residuals", _packed_model(),
            df=df, heterogeneous_residuals=True)


def test_packed_categorical_rejected():
    store = prepare_packed_genotypes(SIM["genotypes"])
    geno = get_genotypes(store, 1.0, G_is_marker_variance=True, name="geno")
    model = build_model("y = intercept + geno", genotypes=geno,
                        categorical_trait=["y"])
    df = SIM["phenotypes"].copy()
    df["y"] = (df["y"] > df["y"].median()).astype(int) + 1
    _expect("continuous traits only", model, df=df)


def test_packed_rrblup_rejected_at_load():
    store = prepare_packed_genotypes(SIM["genotypes"])
    with pytest.raises(ValueError, match="BayesC/BayesB/BayesR only"):
        get_genotypes(store, 1.0, method="RR-BLUP", name="geno")


def test_packed_bayesr_accepted_at_load():
    """BayesR + 2-bit storage is admitted (an engine capability beyond the
    reference's BayesC-only streaming backend) with the default class Pi."""
    store = prepare_packed_genotypes(SIM["genotypes"])
    g = get_genotypes(store, 1.0, method="BayesR", name="geno")
    assert g.packed_store is not None
    pi = np.asarray(g.pi)
    assert pi.shape == (4,) and np.isclose(pi.sum(), 1.0)


def test_mt_scalar_pi_rejected():
    _expect("Pi cannot be a number in multi-trait",
            _mt_model("BayesC", Pi=0.5), df=SIM_MT["phenotypes"])


def test_mt_pi_dict_sum_rejected():
    pi = {(1.0, 1.0): 0.6, (0.0, 0.0): 0.2}   # sums to 0.8
    _expect("Summation of probabilities of Pi",
            _mt_model("BayesC", Pi=pi), df=SIM_MT["phenotypes"])


def test_mt_estimate_scale_rejected():
    _expect("estimate_scale=true is only supported for single trait",
            _mt_model("BayesC", estimate_scale=True), df=SIM_MT["phenotypes"])


def test_causal_structure_single_trait_rejected():
    _expect("Causal structures are only allowed in multi-trait",
            _st_model(), causal_structure=np.zeros((1, 1)))


def test_heterogeneous_residuals_without_weights_rejected():
    _expect("requires a 'weights' column", _st_model(),
            heterogeneous_residuals=True)


def test_censored_without_bounds_rejected():
    geno = get_genotypes(SIM["genotypes"], 1.0, name="geno")
    model = build_model("y = intercept + geno", genotypes=geno,
                        censored_trait=["y"])
    _expect("requires columns y_l and y_u", model)


def test_bad_chain_length_and_burnin_rejected():
    _expect("chain_length should be", _st_model(), chain_length=0)
    _expect("burnin should satisfy", _st_model(), chain_length=10, burnin=10)


def test_invalid_mt_sampler_rejected():
    _expect("multi_trait_sampler must be one of",
            _mt_model("BayesC", multi_trait_sampler="Z"),
            df=SIM_MT["phenotypes"])


def test_anno_mt_three_traits_rejected():
    rng = np.random.default_rng(0)
    sim3 = simulate_genomic_data_mt(n=60, p=24, n_qtl=4, seed=1, n_traits=3) \
        if "n_traits" in simulate_genomic_data_mt.__code__.co_varnames else None
    if sim3 is None:
        pytest.skip("3-trait simulator not available")
    anno = rng.normal(size=(24, 2))
    geno = get_genotypes(sim3["genotypes"], np.eye(3), method="BayesC",
                         name="geno", annotations=anno)
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno\n"
                        "y3 = intercept + geno", np.eye(3), genotypes=geno)
    _expect("exactly 2 traits", model, df=sim3["phenotypes"])
