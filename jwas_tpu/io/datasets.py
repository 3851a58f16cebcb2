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
    n_traits: int = 2,
) -> Dict[str, object]:
    """Simulate n_traits correlated traits with shared QTL.

    rg: genetic correlation of QTL effects (all pairs); re: residual
    correlation (all pairs). missing_frac: fraction of trait-2 phenotypes
    set to missing. h2 is cycled/truncated to n_traits entries. The default
    n_traits=2 reproduces the historical 2-trait draws exactly.
    """
    t = int(n_traits)
    if t < 2:
        raise ValueError("simulate_genomic_data_mt needs n_traits >= 2")
    rng = np.random.default_rng(seed)
    freqs = rng.uniform(0.05, 0.95, size=p)
    X = rng.binomial(2, freqs[None, :], size=(n, p)).astype(np.float32)
    Xc = X - X.mean(axis=0)
    qtl = rng.choice(p, size=n_qtl, replace=False)
    G_eff = np.full((t, t), rg)
    np.fill_diagonal(G_eff, 1.0)
    eff = rng.multivariate_normal(np.zeros(t), G_eff, size=n_qtl)
    effects = np.zeros((p, t))
    effects[qtl] = eff
    bv = Xc @ effects                          # (n, t)
    var_g = bv.var(axis=0)
    h2v = np.resize(np.asarray(h2, dtype=np.float64), t)
    var_e = var_g * (1 - h2v) / h2v
    sd_e = np.sqrt(var_e)
    Re = re * np.outer(sd_e, sd_e)
    np.fill_diagonal(Re, var_e)
    err = rng.multivariate_normal(np.zeros(t), Re, size=n)
    mu = np.resize(np.array([5.0, -2.0, 1.0, -0.5]), t)
    y = mu[None, :] + bv + err
    ids = [f"ind{i+1}" for i in range(n)]
    pheno = pd.DataFrame({"ID": ids})
    for k in range(t):
        pheno[f"y{k+1}"] = y[:, k]
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


def _drop_pedigree(rng, n_founders: int, gen_sizes, p: int, freqs):
    """Gene-drop genotypes through a random multi-generation pedigree.

    Returns (ids, sires, dams, X) with founders first, generations appended.
    """
    X = [rng.binomial(2, freqs[None, :], size=(n_founders, p))]
    ids = [str(i + 1) for i in range(n_founders)]
    sires = ["0"] * n_founders
    dams = ["0"] * n_founders
    prev_ids = list(ids)
    prev_X = X[0]
    next_id = n_founders + 1
    for size in gen_sizes:
        half = len(prev_ids) // 2
        males, females = prev_ids[:half], prev_ids[half:]
        mX, fX = prev_X[:half], prev_X[half:]
        s_idx = rng.integers(0, len(males), size)
        d_idx = rng.integers(0, len(females), size)
        child = rng.binomial(1, mX[s_idx] / 2.0) + rng.binomial(1, fX[d_idx] / 2.0)
        new_ids = [str(next_id + i) for i in range(size)]
        next_id += size
        ids += new_ids
        sires += [males[i] for i in s_idx]
        dams += [females[i] for i in d_idx]
        X.append(child)
        prev_ids, prev_X = new_ids, child
    return ids, sires, dams, np.concatenate(X).astype(np.float32)


def _scaled(bv: np.ndarray, target_var: float) -> np.ndarray:
    v = bv.var()
    return bv * np.sqrt(target_var / v) if v > 0 else bv


def _simulated_omics() -> Dict[str, pd.DataFrame]:
    """Deterministic analogue of the reference's simulated_omics dataset
    (4.Datasets/data/simulated_omics; structure documented in
    test/integration/test_simulated_omics.jl:1-8): 6,473 pedigree animals of
    which the last 3,534 are genotyped at 1,000 SNPs; 10 omics layers each
    driven by one block of 100 consecutive SNPs; trait1 = group + litter +
    direct genetic + omics contribution + residual, with total genetic
    h2 ~ 0.25 split 20% direct / 80% indirect via omics. True
    genetic_direct/indirect/total columns enable accuracy assertions.
    """
    rng = np.random.default_rng(20260818)
    p, n_geno = 1000, 3534
    gen_sizes = (1200, 1200, 1200, 1200, 1200)
    n_founders = 6473 - sum(gen_sizes)
    freqs = rng.uniform(0.05, 0.95, size=p)
    ids, sires, dams, X = _drop_pedigree(rng, n_founders, gen_sizes, p, freqs)
    n_all = len(ids)
    pedigree = pd.DataFrame({"ID": ids, "SIRE": sires, "DAM": dams})

    geno_rows = np.arange(n_all - n_geno, n_all)
    Xc = X - X.mean(axis=0)

    # direct genetic: 30 QTL anywhere; total genetic variance normalized to 1
    beta_d = np.zeros(p)
    qtl_d = rng.choice(p, size=30, replace=False)
    beta_d[qtl_d] = rng.normal(size=30)
    g_direct = _scaled(Xc @ beta_d, 0.2)

    # 10 omics layers, each driven by 8 QTL inside its 100-SNP block
    n_omics, block = 10, 100
    g_omic = np.zeros((n_all, n_omics))
    for k in range(n_omics):
        beta_k = np.zeros(p)
        qtl_k = rng.choice(np.arange(k * block, (k + 1) * block), 8, replace=False)
        beta_k[qtl_k] = rng.normal(size=8)
        g_omic[:, k] = _scaled(Xc @ beta_k, 1.0)
    w = rng.normal(size=n_omics)
    g_indirect = _scaled(g_omic @ w, 0.8)
    g_total = g_direct + g_indirect
    vg = g_total.var()

    # non-genetic structure + residual for total h2 ~ 0.25
    groups = rng.integers(1, 21, size=n_all)
    group_eff = rng.normal(0.0, np.sqrt(0.2 * vg), size=21)
    litters = rng.integers(1, 301, size=n_all)
    litter_eff = rng.normal(0.0, np.sqrt(0.1 * vg), size=301)
    e = rng.normal(0.0, np.sqrt(3.0 * vg - 0.3 * vg), size=n_all)
    trait1 = group_eff[groups] + litter_eff[litters] + g_total + e
    omics_obs = g_omic + rng.normal(0.0, 1.0, size=g_omic.shape)

    pheno = pd.DataFrame({"ID": [ids[i] for i in geno_rows],
                          "trait1": trait1[geno_rows],
                          "group": groups[geno_rows],
                          "litter": litters[geno_rows],
                          "genetic": g_direct[geno_rows]})
    for k in range(n_omics):
        pheno[f"omic{k+1}"] = omics_obs[geno_rows, k]
    pheno["genetic_direct"] = g_direct[geno_rows]
    pheno["genetic_indirect"] = g_indirect[geno_rows]
    pheno["genetic_total"] = g_total[geno_rows]

    geno = pd.DataFrame(X[geno_rows], columns=[f"m{j+1}" for j in range(p)])
    geno.insert(0, "ID", [ids[i] for i in geno_rows])
    return {"phenotypes": pheno, "pedigree": pedigree,
            "genotypes_1000snps": geno}


def _simulated_annotations() -> Dict[str, pd.DataFrame]:
    """Deterministic analogue of the reference's simulated_annotations fixture
    (4.Datasets/data/simulated_annotations/README.md): 400 training animals,
    ~964 post-MAF markers, 10 causal SNPs concentrated in the functional
    annotation class (single-trait), plus a 2-trait scenario with four
    inclusion states (00/10/01/11) driven by continuous annotation signals.
    """
    rng = np.random.default_rng(123)
    n, p = 400, 964
    freqs = rng.uniform(0.05, 0.95, size=p)
    X = rng.binomial(2, freqs[None, :], size=(n, p)).astype(np.float32)
    Xc = X - X.mean(axis=0)
    marker_ids = [f"m{j+1}" for j in range(p)]
    ids = [f"id_{i+1}" for i in range(n)]

    # single trait: functional annotation enriches causal probability
    functional = (rng.uniform(size=p) < 0.15).astype(int)
    random_anno = (rng.uniform(size=p) < 0.15).astype(int)
    func_idx = np.flatnonzero(functional)
    causal = rng.choice(func_idx, size=8, replace=False)
    causal = np.concatenate([causal, rng.choice(
        np.setdiff1d(np.arange(p), func_idx), size=2, replace=False)])
    beta = np.zeros(p)
    beta[causal] = rng.normal(size=10)
    bv = _scaled(Xc @ beta, 1.0)
    y1 = bv + rng.normal(0.0, 1.0, size=n)        # h2 = 0.5

    annotations = pd.DataFrame({"marker_id": marker_ids,
                                "functional": functional,
                                "random_anno": random_anno})
    truth = pd.DataFrame({"marker_id": marker_ids,
                          "is_causal": beta != 0.0,
                          "true_effect": beta})
    phenotypes = pd.DataFrame({"ID": ids, "y1": y1})

    # 2-trait scenario: states 00/10/01/11 driven by continuous signals
    act = rng.normal(size=p)
    plei = rng.normal(size=p)
    direction = rng.normal(size=p)
    rand_sig = rng.normal(size=p)
    z_act = 0.9 * act + 0.3 * rng.normal(size=p)
    active = z_act > np.quantile(z_act, 0.96)      # ~40 active markers
    z_shared = 0.9 * plei + 0.3 * rng.normal(size=p)
    shared = active & (z_shared > np.quantile(z_shared, 0.5))
    only1 = active & ~shared & (direction > 0)
    only2 = active & ~shared & (direction <= 0)
    b1 = np.where(shared | only1, rng.normal(size=p), 0.0)
    b2 = np.where(shared, 0.7 * b1 + 0.5 * rng.normal(size=p),
                  np.where(only2, rng.normal(size=p), 0.0))
    bv1 = _scaled(Xc @ b1, 1.0)
    bv2 = _scaled(Xc @ b2, 1.0)
    y1m = bv1 + rng.normal(0.0, 1.0, size=n)
    y2m = -10.0 + bv2 + rng.normal(0.0, 1.0, size=n)
    state = np.where(shared, "11", np.where(only1, "10",
                     np.where(only2, "01", "00")))
    annotations_mt = pd.DataFrame({"marker_id": marker_ids,
                                   "active_signal": act,
                                   "pleiotropy_signal": plei,
                                   "direction_signal": direction,
                                   "random_signal": rand_sig})
    truth_mt = pd.DataFrame({"marker_id": marker_ids, "state": state,
                             "is_active_y1": shared | only1,
                             "is_active_y2": shared | only2,
                             "is_shared": shared,
                             "true_effect_y1": b1, "true_effect_y2": b2})
    phenotypes_mt = pd.DataFrame({"ID": ids, "y1": y1m, "y2": y2m})

    geno = pd.DataFrame(X, columns=marker_ids)
    geno.insert(0, "ID", ids)
    return {"genotypes": geno, "annotations": annotations, "truth": truth,
            "phenotypes": phenotypes, "annotations_mt": annotations_mt,
            "truth_mt": truth_mt, "phenotypes_mt": phenotypes_mt}


def dataset(name: str, dataset_name: Optional[str] = None):
    """Return a demo dataset table, or a path to it on disk.

    dataset(name): with name in {"phenotypes", "pedigree", "genotypes"} returns
    the demo_7animals table of that name as a CSV file path (mirroring the
    reference `dataset(file)` path-resolver, Datasets.jl:4-12). Pass
    dataset_name="demo_7animals" explicitly for clarity.

    The packaged tables here are ORIGINAL deterministic simulations (same
    shapes/semantics as the reference's data, not its values). To reproduce
    the reference's documented examples byte-for-byte, point
    JWAS_REFERENCE_DATA at a JWAS.jl checkout's src/4.Datasets/data
    directory — files found there are returned verbatim in preference to
    the generated analogues.
    """
    ds_name = dataset_name or "demo_7animals"
    ref_root = os.environ.get("JWAS_REFERENCE_DATA", "")
    if ref_root:
        base = os.path.splitext(name)[0]
        ref_dir = os.path.join(ref_root, ds_name)
        if os.path.isdir(ref_dir):
            for cand in (name, f"{base}.txt", f"{base}.csv"):
                p = os.path.join(ref_dir, cand)
                if os.path.isfile(p):
                    return p
    if ds_name not in _CACHE:
        generators = {
            "demo_7animals": _demo_7animals,
            "simulated_omics": _simulated_omics,
            "simulated_annotations": _simulated_annotations,
        }
        if ds_name not in generators:
            raise ValueError(f"unknown dataset {ds_name!r}; "
                             f"options: {sorted(generators)}")
        _CACHE[ds_name] = generators[ds_name]()
    tables = _CACHE[ds_name]
    name = os.path.splitext(name)[0]  # accept "phenotypes.txt" style names
    if name not in tables:
        raise ValueError(f"unknown table {name!r}; options: {sorted(tables)}")
    outdir = os.path.join(tempfile.gettempdir(), f"jwas_tpu_{ds_name}")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, f"{name}.csv")
    if not os.path.exists(path):
        tables[name].to_csv(path, index=False)
    return path
