"""Table-driven admission-matrix coverage: EVERY rule fires and is total.

The reference exhaustively exercises its errors_args matrix (reference:
src/1.JWAS/src/input_data_validation.jl:9-141); this mirror asserts, for each
rule in jwas_tpu.engine.validation.RULES, that (a) a crafted violating config
raises the rule's exact message through validate_args, and (b) every predicate
evaluates cleanly (no exception) on benign contexts — a raising predicate
would previously have been silently skipped, the exact failure mode an
admission matrix exists to prevent.
"""

import numpy as np
import pytest

from jwas_tpu.engine.validation import RULES, _ctx, validate_args


class _NS:
    """Attribute bag (SimpleNamespace with kwargs-of-kwargs convenience)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _variance(val=1.0, constraint=False, estimate_scale=False):
    return _NS(val=val, constraint=constraint, estimate_scale=estimate_scale)


def _geno(method="BayesC", packed_store=None, annotations=None, pi=0.05,
          genetic_variance_val=1.0, G_val=1.0, constraint=False,
          estimate_scale=False, multi_trait_sampler="I"):
    return _NS(
        method=method, packed_store=packed_store, annotations=annotations,
        pi=pi, genetic_variance=_NS(val=genetic_variance_val),
        G=_variance(G_val, constraint, estimate_scale),
        multi_trait_sampler=multi_trait_sampler,
    )


def _model(geno="default", n_traits=1, ped=None, traits_type=None,
           causal_structure=None):
    if geno == "default":
        geno = _geno()
    M = [] if geno is None else [geno]
    tt = traits_type if traits_type is not None else ["continuous"] * n_traits
    return _NS(
        M=M, n_models=n_traits, ped=ped, traits_type=list(tt),
        causal_structure=causal_structure, mme_pos=1,
        lhs_vec=[f"y{i+1}" for i in range(n_traits)],
    )


def _opts(**kw):
    base = dict(
        pedigree=None, single_step_analysis=False, RRM=None,
        double_precision=False, heterogeneous_residuals=False,
        causal_structure=None, chain_length=100, burnin=0, n_chains=1,
        resume=False,
    )
    base.update(kw)
    return _NS(**base)


PI_OK = {(1.0, 1.0): 0.8, (0.0, 0.0): 0.2}
PI_BAD = {(1.0, 1.0): 0.6, (0.0, 0.0): 0.2}

# one violating (model, opts) per rule, keyed by the rule's exact message
VIOLATIONS = {
    "Please provide values for the genetic variance for GBLUP analysis": (
        _model(_geno(method="GBLUP", genetic_variance_val=None, G_val=1.0)),
        _opts()),
    "SSGBLUP is not available": (
        _model(_geno(method="GBLUP")), _opts(single_step_analysis=True)),
    "BayesR supports single-trait analysis only.": (
        _model(_geno(method="BayesR", pi=PI_OK), n_traits=2), _opts()),
    "BayesR does not support random regression model (RRM).": (
        _model(_geno(method="BayesR")), _opts(RRM=np.eye(3))),
    "Annotated multi-trait BayesC currently supports exactly 2 traits.": (
        _model(_geno(annotations=object(), pi=PI_OK), n_traits=3), _opts()),
    "Annotated multi-trait BayesC supports constraint=false only.": (
        _model(_geno(annotations=object(), pi=PI_OK, constraint=True),
               n_traits=2), _opts()),
    "Annotated Bayes methods do not support random regression model (RRM).": (
        _model(_geno(annotations=object())), _opts(RRM=np.eye(3))),
    "Annotated Bayes methods do not support single-step analysis.": (
        _model(_geno(annotations=object()), ped=object()),
        _opts(single_step_analysis=True)),
    "multi_trait_sampler must be one of 'auto', 'I', or 'II'.": (
        _model(_geno(multi_trait_sampler="Z")), _opts()),
    "multi_trait_sampler overrides are supported for BayesC/BayesB only.": (
        _model(_geno(method="RR-BLUP", multi_trait_sampler="II"), n_traits=2),
        _opts()),
    "storage='2bit' supports BayesC/BayesB/BayesR only.": (
        _model(_geno(method="RR-BLUP", packed_store=object())), _opts()),
    "storage='2bit' supports single-trait analysis only.": (
        _model(_geno(packed_store=object(), pi=PI_OK), n_traits=2), _opts()),
    "storage='2bit' supports Float32 only (double_precision=False).": (
        _model(_geno(packed_store=object())), _opts(double_precision=True)),
    "storage='2bit' does not support single-step analysis.": (
        _model(_geno(packed_store=object()), ped=object()),
        _opts(single_step_analysis=True)),
    "storage='2bit' does not support random regression model (RRM).": (
        _model(_geno(packed_store=object())), _opts(RRM=np.eye(3))),
    "storage='2bit' does not support annotations.": (
        _model(_geno(packed_store=object(), annotations=object())), _opts()),
    "storage='2bit' supports continuous traits only.": (
        _model(_geno(packed_store=object()), traits_type=["categorical"]),
        _opts()),
    "storage='2bit' does not support heterogeneous residuals.": (
        _model(_geno(packed_store=object())),
        _opts(heterogeneous_residuals=True)),
    "Summation of probabilities of Pi is not equal to one.": (
        _model(_geno(pi=PI_BAD), n_traits=2), _opts()),
    "Pi cannot be a number in multi-trait analysis.": (
        _model(_geno(pi=0.5), n_traits=2), _opts()),
    "Genomic information is required for single-step analysis.": (
        _model(geno=None), _opts(single_step_analysis=True)),
    "A pedigree is required for single-step analysis.": (
        _model(), _opts(single_step_analysis=True)),
    "Causal structures are only allowed in multi-trait analysis": (
        _model(geno=None), _opts(causal_structure=np.zeros((1, 1)))),
    "Causal structures (SEM) support continuous traits only.": (
        _model(geno=None, n_traits=2,
               traits_type=["categorical", "continuous"]),
        _opts(causal_structure=np.zeros((2, 2)))),
    "estimate_scale=true is only supported for single trait now.": (
        _model(_geno(pi=PI_OK, estimate_scale=True), n_traits=2), _opts()),
    "Random regression models support a single longitudinal trait.": (
        _model(_geno(pi=PI_OK), n_traits=2), _opts(RRM=np.eye(3))),
    "Random regression models do not support single-step analysis.": (
        _model(ped=object()),
        _opts(RRM=np.eye(3), single_step_analysis=True)),
    "Random regression models support continuous traits only.": (
        _model(traits_type=["censored"]), _opts(RRM=np.eye(3))),
    "Heterogeneous residuals are not supported for categorical traits "
    "(the liability residual variance is fixed).": (
        _model(traits_type=["categorical"]),
        _opts(heterogeneous_residuals=True)),
    "Single-step analysis supports continuous traits only.": (
        _model(ped=object(), traits_type=["censored"]),
        _opts(single_step_analysis=True)),
    "chain_length should be an integer > 0.": (_model(), _opts(chain_length=0)),
    "burnin should satisfy 0 <= burnin < chain_length.": (
        _model(), _opts(chain_length=10, burnin=10)),
    "n_chains should be an integer >= 1.": (_model(), _opts(n_chains=0)),
}

BENIGN = [
    (_model(), _opts()),                                    # ST BayesC
    (_model(geno=None), _opts()),                           # no markers
    (_model(_geno(pi=PI_OK), n_traits=2), _opts()),         # MT BayesC
    (_model(_geno(packed_store=object())), _opts()),        # packed ST
    (_model(_geno(method="GBLUP")), _opts()),               # GBLUP
    (_model(_geno(method="BayesR")), _opts()),              # BayesR ST
    (_model(_geno(annotations=object())), _opts()),         # annotated ST
]


def test_every_rule_has_a_violation_case():
    missing = [r.message for r in RULES if r.message not in VIOLATIONS]
    assert not missing, f"rules without a negative test: {missing}"


@pytest.mark.parametrize("message", sorted(VIOLATIONS))
def test_rule_fires_with_exact_message(message):
    model, opts = VIOLATIONS[message]
    with pytest.raises(ValueError) as exc:
        validate_args(model, opts)
    assert str(exc.value) == message


@pytest.mark.parametrize("idx", range(len(BENIGN)))
def test_predicates_total_on_benign_configs(idx):
    """Every predicate must evaluate (no exception) on valid configs —
    validate_args no longer swallows raising rules."""
    model, opts = BENIGN[idx]
    ctx = _ctx(model, opts)
    for rule in RULES:
        assert rule.check(ctx) in (True, False)   # must not raise
    validate_args(model, opts)                    # and must pass end-to-end


def test_unbuilt_model_rejected():
    model = _model()
    model.mme_pos = 7
    with pytest.raises(ValueError, match="build your model again"):
        validate_args(model, _opts())


def test_duplicated_censored_trait_rejected():
    model = _model(geno=None, n_traits=2,
                   traits_type=["censored", "censored"])
    model.lhs_vec = ["y1", "y1"]
    with pytest.raises(ValueError, match="duplicated censored trait"):
        validate_args(model, _opts())
