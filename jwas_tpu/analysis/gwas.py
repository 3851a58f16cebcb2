"""Window-based GWAS post-processing of MCMC marker-effect samples.

From-scratch equivalent of the reference GWAS module (reference:
src/3.GWAS/src/GWAS.jl):

- `GWAS(marker_effects_file)` — model frequency per marker (GWAS.jl:6-18).
- `GWAS(model, map_file, marker_effects_file, ...)` — window-based genetic
  variance proportions and WPPA (GWAS.jl:49-201).

The per-sample window variance computation is the hot loop
(O(samples * N * p)); it runs as batched device matmuls: for each saved sample
s, BV_s = X alpha_s and winVar_s,w = var(X_w alpha_w,s), all samples stacked
into one (p, S) matrix so every window is a single GEMM.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np
import pandas as pd


class _DenseX:
    """Uniform column access over a dense (n, p) genotype matrix.

    Columns are mean-centered to match the packed backend (store.decode
    centers), so local-EBV window columns and BV levels are backend-
    invariant; window variance proportions were already invariant."""

    def __init__(self, X):
        X = jnp.asarray(np.asarray(X), jnp.float32)
        self.X = X - jnp.mean(X, axis=0, keepdims=True)
        self.shape = (int(self.X.shape[0]), int(self.X.shape[1]))

    def cols(self, idx) -> jnp.ndarray:
        return self.X[:, np.asarray(idx, dtype=np.int64)]

    def matmul(self, A: jnp.ndarray) -> jnp.ndarray:
        return self.X @ A


class _PackedX:
    """Column access over a 2-bit packed store: windows decode on demand
    (streaming_genotypes.jl:978-1002 analogue), the full-genome breeding-value
    GEMM streams marker chunks so no dense (n, p) matrix ever exists. This is
    what makes post-hoc GWAS usable on storage='2bit' runs at p >= 1M."""

    def __init__(self, store, chunk_bytes: int = 1 << 28):
        self.store = store
        self.shape = (int(store.n_obs), int(store.n_markers))
        n = max(1, int(store.n_obs))
        self.chunk = max(1024, chunk_bytes // (4 * n))

    def cols(self, idx) -> jnp.ndarray:
        dec = self.store.decode(np.asarray(idx, dtype=np.int64))  # centered
        return jnp.asarray(dec, jnp.float32)

    def matmul(self, A: jnp.ndarray) -> jnp.ndarray:
        n, p = self.shape
        out = jnp.zeros((n, A.shape[1]), jnp.float32)
        for c0 in range(0, p, self.chunk):
            idx = np.arange(c0, min(c0 + self.chunk, p), dtype=np.int64)
            out = out + self.cols(idx) @ A[c0 : c0 + len(idx), :]
        return out


def _resolve_X(genotypes, model_or_file):
    """Accept a dense matrix, a Genotypes object (dense or packed), a
    Packed2BitStore, or take the first marker set off the model."""
    cand = genotypes
    if cand is None and hasattr(model_or_file, "M") and model_or_file.M:
        cand = model_or_file.M[0]
    if cand is None:
        return None
    store = getattr(cand, "packed_store", None)
    if store is not None:
        return _PackedX(store)
    if hasattr(cand, "decode") and hasattr(cand, "n_markers"):
        return _PackedX(cand)           # a bare Packed2BitStore
    dense = getattr(cand, "genotypes", cand)
    if dense is None:
        return None
    return _DenseX(dense)


def _read_marker_samples(path: str):
    df = pd.read_csv(path)
    marker_ids = [str(c) for c in df.columns]
    return marker_ids, df.to_numpy(dtype=np.float64)


def model_frequency(marker_effects_file: str) -> pd.DataFrame:
    """P(effect != 0) per marker over saved samples (GWAS.jl:6-18)."""
    marker_ids, samples = _read_marker_samples(marker_effects_file)
    freq = (samples != 0.0).mean(axis=0)
    return pd.DataFrame({"marker_ID": marker_ids, "modelfrequency": freq})


def _build_windows(map_df: pd.DataFrame, marker_ids: List[str],
                   window_size_mb: float, sliding: bool):
    """Map-file windows: fixed or sliding 1 Mb style (GWAS.jl:89-134)."""
    map_df = map_df.copy()
    map_df.columns = [c.lower() for c in map_df.columns]
    id_col = map_df.columns[0]
    map_df[id_col] = map_df[id_col].astype(str)
    order = {m: i for i, m in enumerate(marker_ids)}
    map_df = map_df[map_df[id_col].isin(order)].reset_index(drop=True)
    map_df["_idx"] = [order[m] for m in map_df[id_col]]
    chr_col = map_df.columns[1]
    pos_col = map_df.columns[2]
    win = int(window_size_mb * 1_000_000)
    windows = []
    for chrom, sub in map_df.groupby(chr_col, sort=False):
        pos = sub[pos_col].to_numpy(dtype=np.float64)
        idx = sub["_idx"].to_numpy()
        srt = np.argsort(pos)
        pos, idx = pos[srt], idx[srt]
        if sliding:
            for i in range(len(pos)):
                stop = pos[i] + win
                j = np.searchsorted(pos, stop, side="left")
                windows.append((str(chrom), pos[i], idx[i : j]))
        else:
            nwin = int(pos.max() // win) + 1 if len(pos) else 0
            for w in range(nwin):
                lo, hi = w * win, (w + 1) * win
                sel = (pos >= lo) & (pos < hi)
                if sel.any():
                    windows.append((str(chrom), lo, idx[sel]))
    return windows


def GWAS(
    model_or_file,
    map_file: Optional[object] = None,
    marker_effects_file: Optional[str] = None,
    *,
    genotypes: Optional[np.ndarray] = None,
    header: bool = True,
    window_size: str = "1 Mb",
    sliding_window: bool = False,
    threshold: float = 0.001,
    output_winVarProps: bool = False,
    genetic_correlation: bool = False,
    local_EBV: bool = False,
):
    """Window-based GWAS (GWAS.jl:49-249) or model frequencies.

    Single-argument form: GWAS(marker_effects_file) -> model frequencies.
    Full form: GWAS(model, map_file, marker_effects_file) with `genotypes`
    either taken from the model's marker set or passed explicitly; returns a
    DataFrame with window variance proportions and WPPA.

    genetic_correlation=True with a PAIR of marker-effect files returns
    per-window genetic covariances/correlations between the two traits
    (GWAS.jl:203-247). local_EBV=True also returns per-window local EBVs
    (X_w alpha_w posterior means) per individual.
    """
    if map_file is None:
        return model_frequency(model_or_file)
    if marker_effects_file is None:
        raise ValueError("marker_effects_file is required for window-based GWAS")

    if genetic_correlation:
        files = marker_effects_file
        if not (isinstance(files, (list, tuple)) and len(files) == 2):
            raise ValueError(
                "genetic_correlation=True requires a pair of marker-effect files"
            )
        marker_ids, samples = _read_marker_samples(files[0])
        _, samples2 = _read_marker_samples(files[1])
        if samples2.shape != samples.shape:
            raise ValueError("the two marker-effect files must match in shape")
    else:
        marker_ids, samples = _read_marker_samples(marker_effects_file)  # (S, p)
        samples2 = None
    S, p = samples.shape

    Xp = _resolve_X(genotypes, model_or_file)
    if Xp is None:
        raise ValueError(
            "genotypes are required (pass genotypes= a matrix, a Genotypes "
            "object, or a Packed2BitStore; or a model whose marker set has "
            "either dense genotypes or a packed_store)"
        )
    if Xp.shape[1] != p:
        raise ValueError("genotype columns must match the marker-effect samples")

    if isinstance(map_file, str):
        map_df = pd.read_csv(map_file, header=0 if header else None)
    else:
        map_df = map_file
    wsize = float(str(window_size).split()[0])
    windows = _build_windows(map_df, marker_ids, wsize, sliding_window)

    A = jnp.asarray(samples.T, jnp.float32)       # (p, S)

    if genetic_correlation:
        # per-window genetic covariance/correlation between traits
        # (GWAS.jl:203-247), vectorized over samples
        A2 = jnp.asarray(samples2.T, jnp.float32)
        rows = []
        for w, (chrom, start, idx) in enumerate(windows):
            Xw = Xp.cols(idx)
            B1 = Xw @ A[idx, :]                    # (n, S)
            B2 = Xw @ A2[idx, :]
            B1c = B1 - B1.mean(axis=0, keepdims=True)
            B2c = B2 - B2.mean(axis=0, keepdims=True)
            n_ind = B1.shape[0]
            cov_s = jnp.sum(B1c * B2c, axis=0) / (n_ind - 1)
            sd = jnp.sqrt(jnp.sum(B1c**2, axis=0) * jnp.sum(B2c**2, axis=0)) / (
                n_ind - 1
            )
            cor_s = jnp.where(sd > 0, cov_s / jnp.maximum(sd, 1e-30), 0.0)
            cov_np = np.nan_to_num(np.asarray(cov_s))
            cor_np = np.nan_to_num(np.asarray(cor_s))
            rows.append(
                (
                    "cor(t1,t2)", w + 1, chrom, float(start), len(idx),
                    marker_ids[idx[0]], marker_ids[idx[-1]],
                    float(cov_np.mean()), float(cov_np.std()),
                    float(cor_np.mean()), float(cor_np.std()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "trait", "window", "chr", "wStart", "numSNP", "start_SNP",
                "end_SNP", "estimate_cov", "std_cov", "estimate_cor", "std_cor",
            ],
        )

    BV = Xp.matmul(A)                              # (n, S)
    gen_var = jnp.var(BV, axis=0)                  # (S,)

    rows = []
    win_props = np.zeros((len(windows), S))
    local_ebv = {}
    for w, (chrom, start, idx) in enumerate(windows):
        BVw = Xp.cols(idx) @ A[idx, :]
        vw = jnp.var(BVw, axis=0)
        prop = np.asarray(vw / jnp.maximum(gen_var, 1e-30))
        win_props[w] = prop
        wppa = float((prop > threshold).mean())
        if local_EBV:
            local_ebv[f"window{w+1}"] = np.asarray(BVw.mean(axis=1))
        rows.append(
            (
                w + 1,
                chrom,
                float(start),
                len(idx),
                marker_ids[idx[0]],
                marker_ids[idx[-1]],
                float(prop.mean()),
                wppa,
            )
        )
    out = pd.DataFrame(
        rows,
        columns=[
            "window", "chr", "start", "numSNP", "start_SNP", "end_SNP",
            "prGenVar", "WPPA",
        ],
    )
    out = out.sort_values("WPPA", ascending=False).reset_index(drop=True)
    extras = []
    if output_winVarProps:
        extras.append(win_props)
    if local_EBV:
        extras.append(pd.DataFrame(local_ebv))
    if extras:
        return (out, *extras)
    return out
