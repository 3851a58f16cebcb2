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
):
    """Window-based GWAS (GWAS.jl:49-249) or model frequencies.

    Single-argument form: GWAS(marker_effects_file) -> model frequencies.
    Full form: GWAS(model, map_file, marker_effects_file) with `genotypes`
    either taken from the model's marker set or passed explicitly; returns a
    DataFrame with window variance proportions and WPPA.
    """
    if map_file is None:
        return model_frequency(model_or_file)
    if marker_effects_file is None:
        raise ValueError("marker_effects_file is required for window-based GWAS")

    marker_ids, samples = _read_marker_samples(marker_effects_file)  # (S, p)
    S, p = samples.shape

    X = genotypes
    if X is None and hasattr(model_or_file, "M") and model_or_file.M:
        X = np.asarray(model_or_file.M[0].genotypes)
    if X is None:
        raise ValueError("genotype matrix is required (pass genotypes=...)")
    if X.shape[1] != p:
        raise ValueError("genotype columns must match the marker-effect samples")

    if isinstance(map_file, str):
        map_df = pd.read_csv(map_file, header=0 if header else None)
    else:
        map_df = map_file
    wsize = float(str(window_size).split()[0])
    windows = _build_windows(map_df, marker_ids, wsize, sliding_window)

    A = jnp.asarray(samples.T, jnp.float32)       # (p, S)
    Xd = jnp.asarray(X, jnp.float32)
    BV = Xd @ A                                    # (n, S)
    gen_var = jnp.var(BV, axis=0)                  # (S,)

    rows = []
    win_props = np.zeros((len(windows), S))
    for w, (chrom, start, idx) in enumerate(windows):
        BVw = Xd[:, idx] @ A[idx, :]
        vw = jnp.var(BVw, axis=0)
        prop = np.asarray(vw / jnp.maximum(gen_var, 1e-30))
        win_props[w] = prop
        wppa = float((prop > threshold).mean())
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
    if output_winVarProps:
        return out, win_props
    return out
