"""Packaged example datasets and simulation utilities.

Equivalent in role to the reference Datasets module (reference:
src/4.Datasets/): provides small demo data for docs/tests and a genomic
simulator with known truth for integration tests. All data is generated
deterministically (fixed seeds) rather than shipped as files.
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional

import numpy as np
import pandas as pd

_CACHE: Dict[str, Dict[str, pd.DataFrame]] = {}


def _demo_7animals() -> Dict[str, pd.DataFrame]:
    """A tiny dataset in the shape of the reference demo (4.Datasets demo_7animals):
    7 animals (3 founders), 3 traits, 5 markers."""
    pedigree = pd.DataFrame(
        {
            "ID": ["S1", "D1", "O1", "O2", "O3", "D2", "O4"],
            "Sire": ["0", "0", "S1", "S1", "S1", "0", "S1"],
            "Dam": ["0", "0", "D1", "D1", "D2", "0", "D2"],
        }
    )
    rng = np.random.default_rng(7)
    geno = rng.integers(0, 3, size=(7, 5))
    genotypes = pd.DataFrame(
        np.column_stack([pedigree["ID"], geno]),
        columns=["ID", "m1", "m2", "m3", "m4", "m5"],
    )
    phenotypes = pd.DataFrame(
        {
            "ID": ["S1", "D1", "O1", "O2", "O3", "D2", "O4"],
            "y1": [100.0, 50.0, 150.0, 40.0, 90.0, 105.0, 70.0],
            "y2": [10.0, 12.9, 13.0, 5.0, 7.5, 11.0, 9.0],
            "y3": [1.0, 2.0, 2.0, 1.0, 2.0, 1.0, 2.0],
            "x1": [1.0, 2.0, 3.0, 2.5, 1.5, 2.2, 1.8],
            "x2": [1, 1, 2, 2, 1, 2, 1],
            "x3": ["m", "f", "m", "f", "m", "f", "m"],
            "dam": ["0", "0", "D1", "D1", "D2", "0", "D2"],
        }
    )
    return {"phenotypes": phenotypes, "pedigree": pedigree, "genotypes": genotypes}


def simulate_genomic_data(
    n: int = 1000,
    p: int = 2000,
    n_qtl: int = 50,
    h2: float = 0.5,
    seed: int = 42,
    maf_low: float = 0.05,
) -> Dict[str, object]:
    """Simulate genotypes + a quantitative trait with known truth.

    Returns dict with 'phenotypes' (DataFrame: ID, y), 'genotypes' (DataFrame:
    ID + markers), 'true_bv' (n,), 'qtl_effects' (p,), 'h2'.
    """
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(maf_low, 1 - maf_low, size=p)
    X = rng.binomial(2, freqs[None, :], size=(n, p)).astype(np.float32)
    effects = np.zeros(p)
    qtl = rng.choice(p, size=n_qtl, replace=False)
    effects[qtl] = rng.normal(0.0, 1.0, size=n_qtl)
    bv = (X - X.mean(axis=0)) @ effects
    var_g = bv.var()
    var_e = var_g * (1 - h2) / h2 if h2 > 0 else 1.0
    y = 10.0 + bv + rng.normal(0.0, np.sqrt(var_e), size=n)
    ids = [f"ind{i+1}" for i in range(n)]
    pheno = pd.DataFrame({"ID": ids, "y": y.astype(np.float64)})
    geno = pd.DataFrame(X, columns=[f"m{j+1}" for j in range(p)])
    geno.insert(0, "ID", ids)
    return {
        "phenotypes": pheno,
        "genotypes": geno,
        "true_bv": bv,
        "qtl_effects": effects,
        "h2": h2,
        "qtl": qtl,
    }


def simulate_genomic_data_mt(
    n: int = 500,
    p: int = 400,
    n_qtl: int = 30,
    h2=(0.5, 0.3),
    rg: float = 0.6,
    re: float = 0.2,
    seed: int = 42,
    missing_frac: float = 0.0,
) -> Dict[str, object]:
    """Simulate two correlated traits with shared QTL.

    rg: genetic correlation of QTL effects; re: residual correlation.
    missing_frac: fraction of trait-2 phenotypes set to missing.
    """
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.05, 0.95, size=p)
    X = rng.binomial(2, freqs[None, :], size=(n, p)).astype(np.float32)
    Xc = X - X.mean(axis=0)
    qtl = rng.choice(p, size=n_qtl, replace=False)
    G_eff = np.array([[1.0, rg], [rg, 1.0]])
    eff = rng.multivariate_normal(np.zeros(2), G_eff, size=n_qtl)
    effects = np.zeros((p, 2))
    effects[qtl] = eff
    bv = Xc @ effects                          # (n, 2)
    var_g = bv.var(axis=0)
    var_e = var_g * (1 - np.asarray(h2)) / np.asarray(h2)
    Re = np.array(
        [
            [var_e[0], re * np.sqrt(var_e[0] * var_e[1])],
            [re * np.sqrt(var_e[0] * var_e[1]), var_e[1]],
        ]
    )
    err = rng.multivariate_normal(np.zeros(2), Re, size=n)
    y = np.array([5.0, -2.0])[None, :] + bv + err
    ids = [f"ind{i+1}" for i in range(n)]
    pheno = pd.DataFrame({"ID": ids, "y1": y[:, 0], "y2": y[:, 1]})
    if missing_frac > 0:
        miss = rng.uniform(size=n) < missing_frac
        pheno.loc[miss, "y2"] = np.nan
    geno = pd.DataFrame(X, columns=[f"m{j+1}" for j in range(p)])
    geno.insert(0, "ID", ids)
    return {
        "phenotypes": pheno,
        "genotypes": geno,
        "true_bv": bv,
        "effects": effects,
        "Re": Re,
        "qtl": qtl,
    }


def simulate_pedigree_genomic_data(
    n_founders: int = 60,
    n_gen: int = 3,
    n_per_gen: int = 120,
    p: int = 200,
    n_qtl: int = 20,
    h2: float = 0.5,
    seed: int = 11,
) -> Dict[str, object]:
    """Simulate a multi-generation pedigree with gene-dropped genotypes.

    Founders draw marker dosages Binomial(2, freq); each offspring receives
    one allele per parent (Bernoulli(dosage/2), unlinked loci). Used by
    single-step and pedigree-BLUP tests where family structure must be real.

    Returns 'pedigree' (ID, Sire, Dam), 'genotypes' (all individuals),
    'phenotypes', 'true_bv', 'ids'.
    """
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.1, 0.9, size=p)
    X = [rng.binomial(2, freqs[None, :], size=(n_founders, p))]
    ids = [f"f{i+1}" for i in range(n_founders)]
    sires = ["0"] * n_founders
    dams = ["0"] * n_founders
    gen_start = 0
    gen_ids = list(ids)
    for g in range(n_gen):
        prev = gen_ids
        prev_X = np.concatenate(X)[gen_start : gen_start + len(prev)]
        males = prev[: len(prev) // 2]
        females = prev[len(prev) // 2 :]
        s_idx = rng.integers(0, len(males), n_per_gen)
        d_idx = rng.integers(0, len(females), n_per_gen)
        row_of = {s: i for i, s in enumerate(prev)}
        Xs = prev_X[[row_of[males[i]] for i in s_idx]]
        Xd = prev_X[[row_of[females[i]] for i in d_idx]]
        child = rng.binomial(1, Xs / 2.0) + rng.binomial(1, Xd / 2.0)
        new_ids = [f"g{g+1}_{i+1}" for i in range(n_per_gen)]
        ids += new_ids
        sires += [males[i] for i in s_idx]
        dams += [females[i] for i in d_idx]
        gen_start += len(prev)
        gen_ids = new_ids
        X.append(child)
    Xall = np.concatenate(X).astype(np.float32)
    effects = np.zeros(p)
    qtl = rng.choice(p, size=n_qtl, replace=False)
    effects[qtl] = rng.normal(0.0, 1.0, size=n_qtl)
    bv = (Xall - Xall.mean(axis=0)) @ effects
    var_g = bv.var()
    var_e = var_g * (1 - h2) / h2 if h2 > 0 else 1.0
    y = 3.0 + bv + rng.normal(0.0, np.sqrt(var_e), size=len(ids))
    pedigree = pd.DataFrame({"ID": ids, "Sire": sires, "Dam": dams})
    geno = pd.DataFrame(Xall, columns=[f"m{j+1}" for j in range(p)])
    geno.insert(0, "ID", ids)
    pheno = pd.DataFrame({"ID": ids, "y": y.astype(np.float64)})
    return {
        "pedigree": pedigree,
        "genotypes": geno,
        "phenotypes": pheno,
        "true_bv": bv,
        "ids": ids,
        "var_g": float(var_g),
        "qtl_effects": effects,
    }


def dataset(name: str, dataset_name: Optional[str] = None):
    """Return a demo dataset table, or a path to it on disk.

    dataset(name): with name in {"phenotypes", "pedigree", "genotypes"} returns
    the demo_7animals table of that name as a CSV file path (mirroring the
    reference `dataset(file)` path-resolver, Datasets.jl:4-12). Pass
    dataset_name="demo_7animals" explicitly for clarity.
    """
    ds_name = dataset_name or "demo_7animals"
    if ds_name not in _CACHE:
        if ds_name == "demo_7animals":
            _CACHE[ds_name] = _demo_7animals()
        else:
            raise ValueError(f"unknown dataset {ds_name!r}")
    tables = _CACHE[ds_name]
    if name not in tables:
        raise ValueError(f"unknown table {name!r}; options: {sorted(tables)}")
    outdir = os.path.join(tempfile.gettempdir(), f"jwas_tpu_{ds_name}")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, f"{name}.csv")
    if not os.path.exists(path):
        tables[name].to_csv(path, index=False)
    return path
