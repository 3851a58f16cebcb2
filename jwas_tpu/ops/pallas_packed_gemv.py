"""Pallas decode-fused GEMVs over the 2-bit packed genotype store.

The XLA packed GEMVs (ops/packed.py packed_rhs / packed_matvec) decode each
marker chunk to a float32 tile before the dot, so XLA materializes n*p*4
bytes of decoded X per pass — 16x the packed bytes and the dominant HBM
traffic of the residual-sync rounds at the north-star problem size. These
kernels fuse the 2-bit decode into the GEMV: only the packed bytes (n*p/4)
cross HBM; decode + multiply-accumulate happen in VMEM registers.

Layout trick: a packed byte holds codes for observations 4i..4i+3, so the
four 2-bit planes `(packed >> 2s) & 3` are STRIDED observation slices
n = 4i + s. The observation vector enters pre-strided as (4, n_pad/4)
(w_strided[s, i] = w[4i + s]) and the matvec emits the same strided layout,
un-strided by the caller — no in-kernel gather or 3D reshape needed.

Centering + missing (code 3 -> marker mean m_k, then subtract m_k):
  x_kn = (c==3 ? m_k : c) - m_k
  X'w:  out_k = sum_n c w  +  (m_k - 3) sum_{miss} w  -  m_k sum_n w
  Xv :  out_n = sum_k c v_k + sum_k miss_kn (m_k - 3) v_k - sum_k m_k v_k

Exactness: identical real-number math to ops/packed.py (tested in interpret
mode); only float summation order differs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _strided_w(w, bpm: int):
    """(n,) -> (4, bpm) with w_strided[s, i] = w[4i + s]; zero-padded."""
    n_pad = 4 * bpm
    w_pad = jnp.zeros((n_pad,), w.dtype).at[: w.shape[0]].set(w)
    return w_pad.reshape(bpm, 4).T


def _fit_tile_k(tile_k: int, p_pad: int, bpm: int,
                budget: int = 12 * 1024 * 1024) -> int:
    """Shrink the marker-tile height so the kernel's VMEM footprint (packed
    tile + per-plane f32 decode temps, ~10 bytes/code measured) fits scoped
    VMEM at any observation count; keep it a divisor of p_pad."""
    cap = max(8, budget // (bpm * 10))
    while tile_k > cap:
        tile_k //= 2
    while p_pad % tile_k:
        tile_k //= 2
    return max(1, tile_k)


def _rhs_kernel(packed_ref, means_ref, wst_ref, wsum_ref, out_ref):
    """One k-tile: out_k = X_k' w, decode fused (see module docs).

    All values stay 2-D (sublane, lane): Mosaic rejects 1-D vector layouts
    in reductions ("Not implemented: Offset change" on v5e), so lane
    reductions keepdims to (K, 1) and the means column is used as (K, 1).
    """
    tile = packed_ref[:, :].astype(jnp.int32)
    acc_cw = jnp.zeros((tile.shape[0], 1), jnp.float32)
    acc_miss = jnp.zeros((tile.shape[0], 1), jnp.float32)
    for s in range(4):
        codes = ((tile >> (2 * s)) & 3).astype(jnp.float32)   # (K, bpm)
        ws = wst_ref[s:s + 1, :]                               # (1, bpm)
        acc_cw += jnp.sum(codes * ws, axis=1, keepdims=True)
        acc_miss += jnp.sum(
            jnp.where(codes == 3.0, ws, 0.0), axis=1, keepdims=True
        )
    m = means_ref[:, :]                                        # (K, 1)
    out_ref[:, :] = acc_cw + (m - 3.0) * acc_miss - m * wsum_ref[0]


@partial(jax.jit, static_argnames=("tile_k", "interpret"))
def packed_rhs_fused(packed, means, w, tile_k: int = 256,
                     interpret: bool = False):
    """X' w with in-kernel 2-bit decode. packed: (p_pad, bpm) uint8 with
    p_pad % tile_k == 0; w: (n,). Returns (p_pad,) float32."""
    p_pad, bpm = packed.shape
    tile_k = _fit_tile_k(tile_k, p_pad, bpm)
    wst = _strided_w(w.astype(jnp.float32), bpm)
    wsum = jnp.sum(w.astype(jnp.float32))[None]
    grid = (p_pad // tile_k,)
    out = pl.pallas_call(
        _rhs_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_k, bpm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bpm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_k, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        interpret=interpret,
    )(packed, means.astype(jnp.float32)[:, None], wst, wsum)
    return out[:, 0]


def _matvec_kernel(packed_ref, means_ref, v_ref, out_ref):
    """One k-tile: strided partials of X v accumulated across grid cells.

    2-D only (see _rhs_kernel): sublane reductions keepdims to (1, bpm) and
    the means/v columns stay (K, 1). The per-observation constant -m'v is
    NOT applied here — summed over grid tiles it telescopes to the full
    means @ v, which the caller subtracts with one XLA dot."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    tile = packed_ref[:, :].astype(jnp.int32)
    v2 = v_ref[:, :]                                          # (K, 1)
    mcol = (means_ref[:, :] - 3.0) * v2                       # (K, 1)
    for s in range(4):
        codes = ((tile >> (2 * s)) & 3).astype(jnp.float32)   # (K, bpm)
        part = jnp.sum(codes * v2, axis=0, keepdims=True)     # (1, bpm)
        part += jnp.sum(
            jnp.where(codes == 3.0, mcol, 0.0), axis=0, keepdims=True
        )
        out_ref[s:s + 1, :] += part


@partial(jax.jit, static_argnames=("n_obs", "tile_k", "interpret"))
def packed_matvec_fused(packed, means, v, n_obs: int, tile_k: int = 256,
                        interpret: bool = False):
    """X @ v with in-kernel 2-bit decode. v: (p_pad,). Returns (n_obs,)."""
    p_pad, bpm = packed.shape
    tile_k = _fit_tile_k(tile_k, p_pad, bpm)
    grid = (p_pad // tile_k,)
    out_st = pl.pallas_call(
        _matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_k, bpm), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, bpm), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, bpm), jnp.float32),
        interpret=interpret,
    )(packed, means.astype(jnp.float32)[:, None], v.astype(jnp.float32)[:, None])
    # the -m'v per-observation constant, telescoped out of the kernel; it
    # applies to every (s, column) including sub-byte padding columns,
    # which the slice below drops
    out_st = out_st - jnp.dot(
        means.astype(jnp.float32), v.astype(jnp.float32)
    )
    return out_st.T.reshape(-1)[:n_obs]
