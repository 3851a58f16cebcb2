"""Design-matrix construction for model terms.

From-scratch equivalent of `getData`/`getX`/`getMME` (reference:
src/1.JWAS/src/build_MME.jl:183-382). Builds, per :class:`ModelTerm`, a sparse
incidence matrix over the stacked multi-trait observation vector, on the host
in numpy/scipy before anything is staged onto the device.

Semantics preserved from the reference:
- every variable defaults to a categorical fixed factor; `set_covariate`
  switches it to a continuous covariate;
- interaction terms "A*B" multiply covariate values and concatenate factor
  levels;
- missing factor levels produce an all-zero row (no effect, value kept);
- pedigree ("A") and structured ("V") random terms index the full level set of
  the structure matrix, not just observed levels.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import scipy.sparse as sp

from jwas_tpu.models.model import Model, ModelTerm

MISSING = "missing"


def _is_missing(x) -> bool:
    return x is None or (isinstance(x, float) and np.isnan(x)) or (
        isinstance(x, str) and x.strip() in ("", "missing", "NA", "nan")
    )


def get_term_data(term: ModelTerm, df: pd.DataFrame, model: Model) -> None:
    """Fill term.data (level strings) and term.val (build_MME.jl:183-221)."""
    n_obs = len(df)
    if term.factors[0] == "intercept":
        term.data = ["intercept"] * n_obs
        term.val = np.ones(n_obs)
        return

    strs: Optional[List[str]] = None
    vals = np.ones(n_obs)
    for k, factor in enumerate(term.factors):
        if factor not in df.columns:
            raise ValueError(f"column {factor!r} not found in the phenotype data")
        col = df[factor]
        if factor in model.cov_vec:
            cv = pd.to_numeric(col, errors="raise").to_numpy(dtype=np.float64)
            cv = np.where(np.isnan(cv), 0.0, cv)
            vals = vals * cv
            part = [factor] * n_obs
        else:
            part = [
                MISSING if _is_missing(v) else str(v) for v in col
            ]
        strs = part if strs is None else [f"{a} * {b}" for a, b in zip(strs, part)]
    term.data = strs
    term.val = vals


def build_term_X(term: ModelTerm, model: Model, start_pos: int) -> None:
    """Build term.X over the stacked (n_obs * n_models) rows (build_MME.jl:229-290)."""
    n_obs = len(term.data)
    n_models = model.n_models
    rows = term.i_model * n_obs + np.arange(n_obs)
    vals = np.array(term.val, dtype=np.float64, copy=True)

    # Any interaction containing a missing level is fully missing.
    data = [MISSING if MISSING in s.split(" * ") else s for s in term.data]

    if term.random_type in ("fixed", "I"):
        # Level order = order of first appearance among non-missing values.
        seen: dict = {}
        for s in data:
            if s != MISSING and s not in seen:
                seen[s] = len(seen)
        term.names = list(seen.keys())
        level_of = dict(seen)
    elif term.random_type in ("V", "A"):
        # Levels fixed by the structure matrix; the structured factor may be
        # one component of an interaction (e.g. "animal*age").
        level_of = {name: i for i, name in enumerate(term.names)}
        resolved = []
        for s in data:
            if s == MISSING:
                resolved.append(MISSING)
                continue
            hit = None
            for factor_str in s.split(" * "):
                if factor_str in level_of:
                    hit = factor_str
                    break
            if hit is None:
                raise ValueError(
                    f"level {s!r} of {term.trm_str} not found in the random-effect levels"
                )
            resolved.append(hit)
        data = resolved
    else:
        raise ValueError(f"unexpected random_type {term.random_type!r}")

    term.n_levels = len(term.names)
    cols = np.zeros(n_obs, dtype=np.int64)
    for i, s in enumerate(data):
        if s == MISSING:
            cols[i] = 0
            vals[i] = 0.0
        else:
            cols[i] = level_of[s]
    term.X = sp.csc_matrix(
        (vals, (rows, cols)), shape=(n_obs * n_models, term.n_levels)
    )
    term.X.eliminate_zeros()
    term.start_pos = start_pos


def build_design(model: Model, df: pd.DataFrame) -> sp.csc_matrix:
    """Build every term's incidence matrix and the concatenated X.

    Returns X of shape (n_obs * n_models, total_levels); also sets each term's
    start_pos and model.mme_pos.
    """
    pos = 0
    blocks = []
    for term in model.terms:
        get_term_data(term, df, model)
        build_term_X(term, model, pos)
        pos += term.n_levels
        blocks.append(term.X)
    model.mme_pos = pos
    return sp.hstack(blocks, format="csc")


def stack_phenotypes(model: Model, df: pd.DataFrame):
    """Stacked response vector and missing mask, trait-major.

    y[t * n_obs + i] = trait t of observation i; missing -> 0 with mask False.
    """
    n_obs = len(df)
    ys = []
    masks = []
    for lhs in model.lhs_vec:
        col = pd.to_numeric(df[lhs], errors="coerce").to_numpy(dtype=np.float64)
        mask = ~np.isnan(col)
        ys.append(np.where(mask, col, 0.0))
        masks.append(mask)
    return np.concatenate(ys), np.concatenate(masks)


def incidence_for_ids(target_ids: List[str], source_ids: List[str]) -> sp.csc_matrix:
    """Z with target = Z @ source (mkmat_incidence_factor, tools4genotypes.jl:334)."""
    index = {s: i for i, s in enumerate(source_ids)}
    rows = np.arange(len(target_ids))
    try:
        cols = np.array([index[s] for s in target_ids], dtype=np.int64)
    except KeyError as e:
        raise ValueError(f"{e} is not found!") from None
    vals = np.ones(len(target_ids))
    return sp.csc_matrix((vals, (rows, cols)), shape=(len(target_ids), len(source_ids)))


def output_term_X(model: Model, term: ModelTerm, output_ids: List[str], df: pd.DataFrame) -> sp.csc_matrix:
    """Incidence rows of `term` for the output individuals.

    Equivalent of the prediction-equation block of `make_incidence_matrices`
    (input_data_validation.jl:462-468): selects from the whole-data incidence
    the rows belonging to the output IDs for this term's trait.
    """
    n_obs = len(df)
    id_col = [str(x) for x in df.iloc[:, 0]]
    row_of = {}
    for i, s in enumerate(id_col):
        row_of.setdefault(s, i)
    rows = []
    for s in output_ids:
        if s not in row_of:
            raise ValueError(f"output individual {s} not found in the data")
        rows.append(term.i_model * n_obs + row_of[s])
    return term.X[rows, :]
