"""Model builder: R-style model equations -> mixed-model structure.

From-scratch equivalent of the reference model-building layer (reference:
src/1.JWAS/src/build_MME.jl, random_effects.jl, types.jl):

- `build_model("y1 = intercept + age + animal", R)` parses equations into
  :class:`ModelTerm` objects (factors default to categorical fixed effects).
- `set_covariate` marks variables as continuous covariates.
- `set_random` declares i.i.d. ("I"), user-structured ("V"), or pedigree-based
  ("A") random effects; the pedigree path computes the sparse A-inverse.

Deliberate API difference from the reference: genotype objects are passed
explicitly (`build_model(..., genotypes=geno)`) instead of being discovered by
reflecting on `Main` module globals (build_MME.jl:88-120), which the survey
flags as a design quirk not to replicate.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import scipy.sparse as sp

from jwas_tpu.io.genotypes import Genotypes, VarianceSpec
from jwas_tpu.io.pedigree import Pedigree


@dataclass
class ModelTerm:
    """One term of a model equation, e.g. "y1:animal*age" (types.jl:9-47)."""

    trm_str: str                    # "y1:A*B"
    i_model: int                    # 0-based trait index
    trait_name: str
    factors: List[str]              # ["A", "B"] or ["intercept"]
    random_type: str = "fixed"      # fixed | I | V | A
    names: List[str] = field(default_factory=list)   # level names
    n_levels: int = 0
    start_pos: int = 0              # column offset in the full MME
    X: Optional[sp.csc_matrix] = None
    # per-observation level string & value (filled by design building)
    data: Optional[List[str]] = None
    val: Optional[np.ndarray] = None

    @property
    def n_factors(self) -> int:
        return len(self.factors)


@dataclass
class RandomEffect:
    """A declared random-effect group (types.jl:86-96)."""

    term_array: List[str]           # ["y1:animal", "y2:animal"]
    G: VarianceSpec                 # covariance among the terms (per level)
    Vinv: Optional[sp.spmatrix]     # None => identity
    names: List[str]                # level names (row order of Vinv)
    random_type: str                # "A" | "V" | "I"
    Vinv_factor: Optional[sp.spmatrix] = None  # F with Vinv = F'F (pedigree
                                    # hAi); enables exact sparse PO draws


@dataclass
class Model:
    """Model/MME container (the reference's `MME` struct, types.jl:264-346)."""

    n_models: int
    model_vec: List[str]
    terms: List[ModelTerm]
    term_dict: Dict[str, ModelTerm]
    lhs_vec: List[str]
    R: VarianceSpec
    cov_vec: List[str] = field(default_factory=list)
    random_effects: List[RandomEffect] = field(default_factory=list)
    ped: Optional[Pedigree] = None
    ped_term_vec: List[str] = field(default_factory=list)
    M: List[Genotypes] = field(default_factory=list)
    traits_type: List[str] = field(default_factory=list)
    output_ids: Optional[List[str]] = None
    output_samples_terms: List[str] = field(default_factory=list)
    mme_pos: int = 0
    obs_ids: List[str] = field(default_factory=list)
    causal_structure: Optional[np.ndarray] = None
    mcmc_info: object = None            # MCMCOptions captured by runMCMC

    def term_names(self) -> List[str]:
        """Flat list 'trait:effect:level' in MME order (getNames, build_MME.jl:385)."""
        out = []
        for trm in self.terms:
            for name in trm.names:
                out.append(f"{trm.trm_str}:{name}")
        return out


def build_model(
    model_equations: str,
    R=None,
    *,
    df: float = 4.0,
    estimate_variance: bool = True,
    estimate_scale: bool = False,
    constraint: bool = False,
    censored_trait: Sequence[str] = (),
    categorical_trait: Sequence[str] = (),
    genotypes: Union[Genotypes, Sequence[Genotypes], None] = None,
) -> Model:
    """Parse model equations and create a :class:`Model` (build_MME.jl:42-156).

    model_equations: one equation per line/';', e.g.
        "y1 = intercept + age + animal\ny2 = intercept + animal"
    R: residual variance prior mean — scalar (single-trait) or t x t matrix.
    genotypes: marker sets referenced by name in the equations.
    """
    if not isinstance(model_equations, str) or not model_equations.strip():
        raise ValueError("model equations are wrong; pass e.g. 'y = intercept + age'")
    if estimate_scale:
        raise ValueError("estimate scale for residual variance is not supported")

    eqs = [e.strip() for e in model_equations.replace(";", "\n").splitlines() if e.strip()]
    n_models = len(eqs)

    if R is not None:
        R_arr = np.atleast_2d(np.asarray(R, dtype=np.float64))
        if R_arr.shape != (n_models, n_models):
            raise ValueError(f"the residual covariance matrix is not {n_models}x{n_models}")
        if np.any(np.linalg.eigvalsh(R_arr) <= 0):
            raise ValueError("the covariance matrix is not positive definite")
    else:
        R_arr = None

    geno_list: List[Genotypes] = []
    if genotypes is not None:
        geno_list = [genotypes] if isinstance(genotypes, Genotypes) else list(genotypes)
    geno_by_name = {g.name: g for g in geno_list}

    lhs_vec: List[str] = []
    terms: List[ModelTerm] = []
    term_dict: Dict[str, ModelTerm] = {}
    used_genos: List[Genotypes] = []
    for m, eq in enumerate(eqs):
        lhs, rhs = (s.strip() for s in eq.split("="))
        lhs_vec.append(lhs)
        for trm_str in (s.strip() for s in rhs.split("+")):
            base = trm_str.split("*")[-1].strip()
            if base in geno_by_name or (len(geno_list) == 1 and base == geno_list[0].name):
                g = geno_by_name[base]
                if g not in used_genos:
                    used_genos.append(g)
                continue
            term = ModelTerm(
                trm_str=f"{lhs}:{trm_str}",
                i_model=m,
                trait_name=lhs,
                factors=[f.strip() for f in trm_str.split("*")],
            )
            terms.append(term)
            term_dict[term.trm_str] = term

    # Residual prior: scale/df transform (build_MME.jl:127-134).
    if n_models == 1:
        scale_R = None if R_arr is None else float(R_arr[0, 0]) * (df - 2.0) / df
        df_R = df
        R_val = None if R_arr is None else float(R_arr[0, 0])
    else:
        scale_R = None if R_arr is None else R_arr * (df - 1.0)
        df_R = df + n_models
        R_val = R_arr

    model = Model(
        n_models=n_models,
        model_vec=eqs,
        terms=terms,
        term_dict=term_dict,
        lhs_vec=lhs_vec,
        R=VarianceSpec(
            val=R_val,
            df=df_R,
            scale=scale_R,
            estimate_variance=estimate_variance,
            estimate_scale=estimate_scale,
            constraint=constraint,
        ),
        traits_type=["continuous"] * n_models,
    )

    for g in used_genos:
        g.n_traits = n_models
        g.trait_names = list(lhs_vec)
        if n_models != 1:
            g.G.df = g.G.df + n_models
        model.M.append(g)

    for t, lhs in enumerate(lhs_vec):
        if lhs in censored_trait:
            model.traits_type[t] = "censored"
        elif lhs in categorical_trait:
            model.traits_type[t] = "categorical"
    return model


def add_genotypes(model: Model, file, G=None, **kwargs) -> Genotypes:
    """Deprecated shim (readgenotypes.jl:24-47): attach genotypes to an
    existing model. Prefer build_model(..., genotypes=get_genotypes(...))."""
    import warnings

    warnings.warn(
        "add_genotypes is deprecated; pass genotypes=get_genotypes(...) to "
        "build_model instead",
        DeprecationWarning,
        stacklevel=2,
    )
    from jwas_tpu.io.genotypes import get_genotypes

    g = file if isinstance(file, Genotypes) else get_genotypes(file, G, **kwargs)
    g.n_traits = model.n_models
    g.trait_names = list(model.lhs_vec)
    if model.n_models != 1:
        g.G.df = g.G.df + model.n_models
    model.M.append(g)
    return g


def set_covariate(model: Model, *cov_strs: str) -> None:
    """Mark variables as continuous covariates (build_MME.jl:170-176)."""
    for s in cov_strs:
        model.cov_vec.extend(v for v in s.split() if v)


def set_random(
    model: Model,
    random_str: str,
    arg=None,
    G=None,
    *,
    Vinv=None,
    names: Sequence[str] = (),
    Vinv_factor=None,
    df: float = 4.0,
    estimate_variance: bool = True,
    estimate_scale: bool = False,
    constraint: bool = False,
) -> None:
    """Declare random effects (random_effects.jl:40-54 and :93-191).

    Usage:
        set_random(model, "animal", ped, G)         # pedigree-based ("A")
        set_random(model, "litter", G)              # i.i.d. ("I")
        set_random(model, "litter", G, Vinv=Vi, names=[...])  # structured ("V")
    """
    ped = None
    if isinstance(arg, Pedigree):
        ped = arg
    elif G is None:
        G = arg  # set_random(model, "litter", G)
    elif arg is not None:
        raise TypeError("second positional argument must be a Pedigree or the variance G")
    if constraint:
        raise ValueError("constraint for variance of random term is not supported")
    if estimate_scale:
        raise ValueError("estimate scale for variance of random term is not supported")

    if ped is not None:
        if model.ped is not None:
            raise ValueError("pedigree information can only be set once")
        model.ped = ped

    if G is not None:
        G_arr = np.atleast_2d(np.asarray(G, dtype=np.float64))
        if np.any(np.linalg.eigvalsh(G_arr) <= 0):
            raise ValueError("the covariance matrix is not positive definite")
    else:
        G_arr = None

    # Attach trait prefixes: "litter" -> ["y1:litter", "y2:litter"]
    term_array: List[str] = []
    for trm in random_str.split():
        found = False
        for m, eq in enumerate(model.model_vec):
            rhs = eq.split("=")[1]
            parts = [s.strip() for s in rhs.split("+")]
            if trm in parts or trm == "ϵ" or trm == "eps":
                term_array.append(f"{model.lhs_vec[m]}:{trm}")
                found = True
        if not found:
            raise ValueError(f"{trm} is not found in model equations")

    model_terms = [model.term_dict[t] for t in term_array if t in model.term_dict]

    if ped is not None:
        for t in model_terms:
            t.random_type = "A"
            t.names = list(ped.ids)
        hAi = ped.a_inverse_factor()
        Vinv_mat = (hAi.T @ hAi).tocsc()
        Vinv_factor = hAi
        random_type = "A"
        level_names = list(ped.ids)
        model.ped_term_vec = list(term_array)
        k = len(term_array)
        df_final = df + k
        scale = None if G_arr is None else G_arr * (df_final - k - 1.0)
    elif Vinv is not None:
        if len(names) == 0:
            raise ValueError("names must be provided together with Vinv")
        names = [str(s) for s in names]
        Vinv_mat = sp.csc_matrix(Vinv)
        if Vinv_mat.shape[0] != len(names) or len(set(names)) != len(names):
            raise ValueError("wrong size or duplicated values in Vinv and names")
        for t in model_terms:
            t.random_type = "V"
            t.names = list(names)
        random_type = "V"
        level_names = list(names)
        df_final = df + len(term_array)
        scale = None if G_arr is None else G_arr * (df_final - len(term_array) - 1.0)
    else:
        for t in model_terms:
            t.random_type = "I"
        Vinv_mat = None
        random_type = "I"
        level_names = []
        df_final = df + len(term_array)
        scale = None if G_arr is None else G_arr * (df_final - len(term_array) - 1.0)

    if G_arr is not None and len(term_array) != G_arr.shape[0]:
        raise ValueError(
            f"dimensions must match: G should be {len(term_array)}x{len(term_array)}"
        )

    model.random_effects.append(
        RandomEffect(
            term_array=list(term_array),
            G=VarianceSpec(
                val=G_arr,
                df=df_final,
                scale=scale,
                estimate_variance=estimate_variance,
                estimate_scale=estimate_scale,
                constraint=constraint,
            ),
            Vinv=Vinv_mat,
            names=level_names,
            random_type=random_type,
            Vinv_factor=Vinv_factor,
        )
    )


def outputEBV(model: Model, ids: Sequence[str]) -> None:
    """Request EBV/PEV output for specific individuals (output.jl:66-69)."""
    model.output_ids = [str(s) for s in ids]


def outputMCMCsamples(model: Model, *trm_strs: str) -> None:
    """Request MCMC sample output for location-parameter terms (output.jl:76-93)."""
    for trm_str in trm_strs:
        for m, eq in enumerate(model.model_vec):
            rhs = eq.split("=")[1]
            parts = [s.strip() for s in rhs.split("+")]
            if trm_str in parts:
                full = f"{model.lhs_vec[m]}:{trm_str}"
                if full not in model.output_samples_terms:
                    model.output_samples_terms.append(full)


def describe(model: Model) -> None:
    """Print a model summary (the reference's `describe`, JWAS.jl:520-571)."""
    print("A Linear Mixed Model was built using model equations:\n")
    for eq in model.model_vec:
        print(f"  {eq}")
    print("\nModel Information:\n")
    print(f"{'Term':<20}{'C/F':<12}{'F/R':<10}{'nLevels':>8}")
    seen = set()
    for trm in model.terms:
        base = trm.factors[-1]
        term = trm.trm_str.split(":", 1)[1]
        if term in seen:
            continue
        seen.add(term)
        if term == "intercept":
            cf = "factor"
        elif len(trm.factors) > 1:
            cf = "interaction"
        else:
            cf = "covariate" if base in model.cov_vec else "factor"
        fr = "fixed" if trm.random_type == "fixed" else "random"
        print(f"{term:<20}{cf:<12}{fr:<10}{trm.n_levels or '?':>8}")
    for g in model.M:
        print(f"{g.name:<20}{'marker':<12}{'random':<10}{g.n_markers:>8}  "
              f"method={g.method}")
    print()
    if model.mcmc_info is not None and getattr(
        model.mcmc_info, "printout_model_info", True
    ):
        getMCMCinfo(model)


def getMCMCinfo(model: Model) -> None:
    """Print MCMC + hyper-parameter information (getMCMCinfo, JWAS.jl:573-700)."""
    info = model.mcmc_info
    if info is None:
        print("MCMC information is not available\n")
        return
    print("MCMC Information:\n")
    for name in ("chain_length", "burnin", "printout_frequency",
                 "output_samples_frequency", "missing_phenotypes",
                 "update_priors_frequency", "seed", "double_precision",
                 "fast_blocks", "n_chains", "single_step_analysis",
                 "outputEBV", "output_heritability", "output_folder"):
        print(f"{name:<30}{str(getattr(info, name, None)):>24}")
    print(f"{'constraint on residual variance':<30}"
          f"{str(bool(model.R.constraint)):>20}")
    for g in model.M:
        print(f"constraint on marker effect variance for {g.name}: "
              f"{bool(g.G.constraint)}")

    print("\nHyper-parameters Information:\n")
    for re in model.random_effects:
        terms = ",".join(re.term_array)
        if re.G.val is not None:
            val = np.round(np.atleast_2d(np.asarray(re.G.val, dtype=float)), 3)
            label = ("genetic variances (polygenic):"
                     if re.random_type == "A"
                     else f"random effect variances ({terms}):")
            print(f"{label:<35}{np.array2string(val)}")
    if model.R.val is not None:
        print(f"{'residual variances:':<35}"
              f"{np.array2string(np.round(np.atleast_2d(np.asarray(model.R.val, dtype=float)), 3))}")
    for g in model.M:
        print(f"\nGenomic Information ({g.name}):\n")
        print(f"{'method':<30}{g.method:>24}")
        print(f"{'nMarkers':<30}{g.n_markers:>24}")
        print(f"{'nObs':<30}{g.n_obs:>24}")
        print(f"{'estimatePi':<30}{str(bool(g.estimate_pi)):>24}")
        if g.genetic_variance.val is not None:
            print(f"{'genetic variance':<30}"
                  f"{np.array2string(np.round(np.atleast_2d(np.asarray(g.genetic_variance.val, dtype=float)), 4)):>24}")
        if g.G.val is not None:
            print(f"{'marker effect variance':<30}"
                  f"{np.array2string(np.round(np.atleast_2d(np.asarray(g.G.val, dtype=float)), 6)):>24}")
        if not isinstance(g.pi, dict):
            print(f"{'pi':<30}{str(g.pi):>24}")
        else:
            print(f"{'pi (joint patterns)':<30}{str(g.pi):>24}")
