"""Device-side 2-bit packed genotype operations.

TPU-native replacement for the reference's decode-one-marker CPU loop
(reference: src/1.JWAS/src/markers/streaming_genotypes.jl:978-1027): the
packed (p, ceil(n/4)) uint8 matrix lives in HBM at 1/16 the dense f32
footprint; marker tiles are decoded to centered float32 on the fly and fused
into the surrounding GEMVs by XLA, so the blocked Gibbs sweep never holds a
dense X.

Decode: code c in {0,1,2} is the dosage, 3 = missing -> marker mean, then
center by the mean (missing decodes to exactly 0 after centering).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PackedMarkers(NamedTuple):
    """All-array pytree; static sizes come from shapes (n_obs =
    row_perm.shape[0], p_pad = packed.shape[0])."""

    packed: jnp.ndarray     # (p_pad, bpm) uint8, marker-major
    means: jnp.ndarray      # (p_pad,) f32
    row_perm: jnp.ndarray   # (n_obs,) int32 store-row index per observation
    xpx: jnp.ndarray        # (p_pad,) diag X'R^-1 X
    grams: jnp.ndarray      # (b, b, nblocks) fast-blocks Gram tiles
    valid: jnp.ndarray      # (p_pad,)


def offload_packed_to_host(pm: "PackedMarkers") -> "PackedMarkers":
    """Move the 2-bit store to pinned HOST memory (TPU memory offloading):
    the sync GEMVs then stream marker chunks over PCIe each round while only
    the Gram tiles + chain state stay HBM-resident — the runtime analogue of
    the reference's out-of-core decode loop (streaming_genotypes.jl:978-1027)
    for stores larger than one chip's HBM (N=500k x P=2M: 250 GB packed vs
    ~1 GB of Gram tiles at b=128).

    No-op (with a warning) on backends without a pinned_host memory space.
    """
    import warnings

    import jax

    try:
        dev = pm.packed.devices().pop() if hasattr(pm.packed, "devices") else (
            jax.devices()[0]
        )
        sharding = jax.sharding.SingleDeviceSharding(
            dev, memory_kind="pinned_host"
        )
        packed_h = jax.device_put(pm.packed, sharding)
        means_h = jax.device_put(pm.means, sharding)
        return pm._replace(packed=packed_h, means=means_h)
    except Exception as e:  # pragma: no cover - backend-dependent
        warnings.warn(f"host offload of the packed store unavailable: {e}")
        return pm


def _to_device_memory(x):
    """Inside-jit transfer of a host-resident chunk into device (HBM) memory
    (the explicit move the XLA memory-offloading model requires); a no-op
    annotation when the operand already lives on device or the backend has a
    single memory space."""
    import jax

    try:
        dev = jax.devices()[0]
        return jax.device_put(
            x, jax.sharding.SingleDeviceSharding(dev, memory_kind="device")
        )
    except Exception:  # pragma: no cover - backend-dependent
        return x


def decode_tile(packed_rows, means_rows, row_perm, dtype=jnp.float32,
                n_obs: int = 0):
    """Decode (k, bpm) packed rows -> centered (n_obs, k) float tile.

    row_perm=None is the identity fast path (observations already in store
    order): the permutation gather is skipped and only the first `n_obs`
    decoded columns are kept (the tail is sub-byte padding)."""
    shifts = jnp.asarray([0, 2, 4, 6], jnp.uint8)
    codes = (packed_rows[:, :, None] >> shifts[None, None, :]) & jnp.uint8(3)
    codes = codes.reshape(packed_rows.shape[0], -1)            # (k, 4*bpm)
    x = codes.astype(dtype)
    m = means_rows.astype(dtype)[:, None]
    x = jnp.where(x == 3.0, m, x) - m
    if row_perm is None:
        return x[:, :n_obs].T                                   # (n_obs, k)
    return x[:, row_perm].T                                     # (n_obs, k)


def _pick_chunk(p_pad: int, b: int, target: int = 4096) -> int:
    """Largest multiple of b that divides p_pad and is <= target."""
    nblocks = max(1, p_pad // b)
    k = max(1, min(nblocks, max(1, target // b)))
    while nblocks % k:
        k -= 1
    return k * b


@partial(jax.jit, static_argnames=("chunk", "n_obs", "host_store"))
def packed_matvec(pm: PackedMarkers, v, chunk: int = 0, n_obs: int = 0,
                  host_store: bool = False):
    """X @ v without densifying X: scan over marker chunks of the packed
    store, decoding each tile into VMEM-sized registers (streaming_mul_alpha!,
    :1009-1027, but tiled and on-device). n_obs is required (static) when
    pm.row_perm is None (identity fast path). host_store=True streams each
    packed chunk from pinned host memory (out-of-core mode)."""
    p_pad = pm.packed.shape[0]
    if chunk <= 0:
        chunk = _pick_chunk(p_pad, pm.grams.shape[0])
    nchunks = p_pad // chunk
    dtype = v.dtype
    n = pm.row_perm.shape[0] if pm.row_perm is not None else n_obs

    def body(acc, k):
        rows = jax.lax.dynamic_slice(pm.packed, (k * chunk, 0),
                                     (chunk, pm.packed.shape[1]))
        mns = jax.lax.dynamic_slice(pm.means, (k * chunk,), (chunk,))
        if host_store:
            rows = _to_device_memory(rows)
            mns = _to_device_memory(mns)
        vs = jax.lax.dynamic_slice(v, (k * chunk,), (chunk,))
        X = decode_tile(rows, mns, pm.row_perm, dtype, n_obs=n)
        return acc + X @ vs, None

    acc0 = jnp.zeros((n,), dtype)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(nchunks))
    return acc


@partial(jax.jit, static_argnames=("chunk", "host_store"))
def packed_rhs(pm: PackedMarkers, w, chunk: int = 0, host_store: bool = False):
    """X' w over the packed store, tiled (the rhs0 of the blocked sweep)."""
    p_pad = pm.packed.shape[0]
    if chunk <= 0:
        chunk = _pick_chunk(p_pad, pm.grams.shape[0])
    nchunks = p_pad // chunk
    dtype = w.dtype
    n = w.shape[0]

    def body(_, k):
        rows = jax.lax.dynamic_slice(pm.packed, (k * chunk, 0),
                                     (chunk, pm.packed.shape[1]))
        mns = jax.lax.dynamic_slice(pm.means, (k * chunk,), (chunk,))
        if host_store:
            rows = _to_device_memory(rows)
            mns = _to_device_memory(mns)
        X = decode_tile(rows, mns, pm.row_perm, dtype, n_obs=n)
        return None, X.T @ w

    _, parts = jax.lax.scan(body, None, jnp.arange(nchunks))
    return parts.reshape(-1)


@partial(jax.jit, static_argnames=("nreps", "sync_every", "chunk", "host_store"))
def sweep_blocks_abc_packed(pm: PackedMarkers, alpha, beta, delta, ycorr,
                            rinv, vare, var_eff, pi, key, nreps: int = 1,
                            sync_every=None, chunk: int = 0,
                            host_store: bool = False):
    """Fast-blocks BayesA/B/C sweep over the packed store.

    Identical math to markers.sweep_blocks_abc (BayesABC block path,
    BayesABC.jl:111-188) — the only difference is that the two O(n*p) GEMVs
    bounding the inner block rounds stream decoded tiles instead of reading a
    dense X. Constraint parity with the reference streaming backend: this is
    the single-trait spike-slab path (input_data_validation.jl:81-111).
    """
    from jwas_tpu.ops import markers as mk

    b = pm.grams.shape[0]
    nblocks = pm.grams.shape[2]
    dtype = ycorr.dtype
    inv_vare = 1.0 / vare
    var_eff_b = mk._to_jmajor(
        jnp.broadcast_to(jnp.asarray(var_eff, dtype), (nblocks * b,)), nblocks, b
    )
    pi_c = jnp.clip(pi.astype(dtype), 1e-10, 1.0)
    log_pi = mk._to_jmajor(jnp.log(pi_c), nblocks, b)
    log_pi_comp = mk._to_jmajor(jnp.log1p(-pi_c + 1e-12), nblocks, b)
    xpx_b = mk._to_jmajor(pm.xpx, nblocks, b)

    md = mk.MarkerBlocks(pm.packed, pm.xpx, pm.grams, pm.valid)

    def step(carry, inp):
        alpha_b, beta_b, delta_b, rhs_b = carry
        j, u, z = inp
        a_j = alpha_b[j]
        a_new, b_new, d_new = mk._abc_update(
            rhs_b[j], a_j, xpx_b[j], inv_vare, var_eff_b[j],
            log_pi[j], log_pi_comp[j], u, z,
        )
        rhs_b = rhs_b + (a_j - a_new)[None, :] * pm.grams[j]
        return (
            alpha_b.at[j].set(a_new),
            beta_b.at[j].set(b_new),
            delta_b.at[j].set(d_new),
            rhs_b,
        )

    def round_fn(stt, kr, reps):
        alpha_b, beta_b, delta_b, ycorr = stt
        w = ycorr if rinv is None else rinv * ycorr
        rhs0 = mk._to_jmajor(
            packed_rhs(pm, w, chunk=chunk, host_store=host_store), nblocks, b
        )
        ku, kz = jax.random.split(kr)
        us = jax.random.uniform(ku, (reps * b, nblocks), dtype=dtype)
        zs = jax.random.normal(kz, (reps * b, nblocks), dtype=dtype)
        alpha_start = alpha_b
        alpha_b, beta_b, delta_b, _ = mk._blocked_round(
            md, step, (alpha_b, beta_b, delta_b, rhs0), (us, zs), reps, b
        )
        ycorr = ycorr + packed_matvec(
            pm, mk._from_jmajor(alpha_start - alpha_b), chunk=chunk,
            n_obs=ycorr.shape[0], host_store=host_store,
        )
        return (alpha_b, beta_b, delta_b, ycorr)

    alpha_b, beta_b, delta_b, ycorr = mk._sync_rounds(
        nreps, sync_every, key, round_fn,
        (mk._to_jmajor(alpha, nblocks, b), mk._to_jmajor(beta, nblocks, b),
         mk._to_jmajor(delta, nblocks, b), ycorr),
    )
    return (
        mk._from_jmajor(alpha_b),
        mk._from_jmajor(beta_b),
        mk._from_jmajor(delta_b),
        ycorr,
    )


@partial(jax.jit, static_argnames=("nreps", "sync_every", "chunk", "host_store",
                                   "use_pallas", "interpret"))
def sweep_blocks_bayesr_packed(pm: PackedMarkers, alpha, delta, ycorr,
                               rinv, vare, sigma_sq, pi, key, nreps: int = 1,
                               sync_every=None, chunk: int = 0,
                               host_store: bool = False,
                               use_pallas: bool = False,
                               interpret: bool = False):
    """Fast-blocks BayesR 4-class sweep over the packed store.

    Identical math to markers.sweep_blocks_bayesr (BayesR.jl:99-193) with the
    O(n*p) sync GEMVs streaming decoded tiles from the 2-bit store — the
    configuration the reference cannot run (its streaming backend is
    BayesC-only, input_data_validation.jl:81-111). pi: (p_pad, 4) class
    priors (padded rows [1,0,0,0]); delta: (p_pad,) int32 class labels.
    """
    from jwas_tpu.ops import markers as mk

    b = pm.grams.shape[0]
    nblocks = pm.grams.shape[2]
    dtype = ycorr.dtype
    inv_vare = 1.0 / vare
    log_pi = jnp.transpose(
        jnp.log(jnp.clip(pi.astype(dtype), 1e-12, 1.0)).reshape(nblocks, b, 4),
        (1, 0, 2),
    )  # (b, nblocks, 4)
    xpx_b = mk._to_jmajor(pm.xpx, nblocks, b)

    def step(carry, inp):
        alpha_b, delta_b, rhs_b = carry
        j, g, z = inp
        a_j = alpha_b[j]
        a_new, k_new = mk._bayesr_update(
            rhs_b[j], a_j, xpx_b[j], inv_vare, sigma_sq, log_pi[j], g, z
        )
        rhs_b = rhs_b + (a_j - a_new)[None, :] * pm.grams[j]
        return (alpha_b.at[j].set(a_new), delta_b.at[j].set(k_new), rhs_b)

    def round_fn(stt, kr, reps):
        alpha_b, delta_b, ycorr = stt
        w = ycorr if rinv is None else rinv * ycorr
        rhs0 = mk._to_jmajor(
            packed_rhs(pm, w, chunk=chunk, host_store=host_store), nblocks, b
        )
        kg, kz = jax.random.split(kr)
        alpha_start = alpha_b
        if use_pallas:
            from jwas_tpu.ops.pallas_sweep import bayesr_inner_rounds_pallas

            alpha_b, delta_b, _ = bayesr_inner_rounds_pallas(
                pm.grams, xpx_b, log_pi, alpha_b, delta_b, rhs0,
                inv_vare, sigma_sq, kg, kz, nreps=reps, interpret=interpret,
            )
        else:
            gum = jax.random.gumbel(kg, (reps * b, nblocks, 4), dtype=dtype)
            zs = jax.random.normal(kz, (reps * b, nblocks), dtype=dtype)
            alpha_b, delta_b, _ = mk._blocked_round(
                None, step, (alpha_b, delta_b, rhs0), (gum, zs), reps, b
            )
        ycorr = ycorr + packed_matvec(
            pm, mk._from_jmajor(alpha_start - alpha_b), chunk=chunk,
            n_obs=ycorr.shape[0], host_store=host_store,
        )
        return (alpha_b, delta_b, ycorr)

    alpha_b, delta_b, ycorr = mk._sync_rounds(
        nreps, sync_every, key, round_fn,
        (mk._to_jmajor(alpha, nblocks, b), mk._to_jmajor(delta, nblocks, b),
         ycorr),
    )
    return (
        mk._from_jmajor(alpha_b),
        mk._from_jmajor(delta_b),
        ycorr,
    )


def packed_markers_from_arrays(packed, means, valid, row_perm, n_obs: int,
                               block_size: int, rinv=None, dtype=jnp.float32,
                               gram_chunk: int = 8) -> PackedMarkers:
    """Device-side PackedMarkers constructor: precompute the fast-blocks Gram
    tiles + xpx from decoded tiles (GibbsMats analogue,
    tools4genotypes.jl:237-275). packed (p_pad, bpm) uint8 / means (p_pad,) /
    valid (p_pad,) may already live on device; row_perm=None is the identity
    fast path (observations in store order)."""
    b = block_size
    p_pad = packed.shape[0]
    assert p_pad % b == 0
    nblocks = p_pad // b
    packed = jnp.asarray(packed)
    means = jnp.asarray(means)
    valid = jnp.asarray(valid)
    rinv_d = None if rinv is None else jnp.asarray(rinv, dtype)
    row_perm_d = None if row_perm is None else jnp.asarray(row_perm)

    # packed/means enter as jit ARGUMENTS: a closure capture would bake the
    # multi-GB packed store into the executable as a lowering constant
    @partial(jax.jit, static_argnames=("nblk",))
    def gram_group(packed_a, means_a, rp, rv, k0, nblk):
        rows = jax.lax.dynamic_slice(
            packed_a, (k0 * b, 0), (nblk * b, packed_a.shape[1])
        )
        mns = jax.lax.dynamic_slice(means_a, (k0 * b,), (nblk * b,))
        X = decode_tile(rows, mns, rp, dtype, n_obs=n_obs)   # (n, nblk*b)
        Xb = X.reshape(n_obs, nblk, b)
        Xw = Xb if rv is None else Xb * rv[:, None, None]
        g = jnp.einsum("nkb,nkc->bck", Xw, Xb)               # (b, b, nblk)
        xpx = jnp.einsum("nkb,nkb->kb", Xw, Xb).reshape(-1)  # (nblk*b,)
        return g, xpx

    grams_parts, xpx_parts = [], []
    for k0 in range(0, nblocks, gram_chunk):
        nblk = min(gram_chunk, nblocks - k0)
        g, xpx = gram_group(packed, means, row_perm_d, rinv_d, k0, nblk)
        grams_parts.append(g)
        xpx_parts.append(xpx)
    grams = jnp.concatenate(grams_parts, axis=2)
    xpx = jnp.concatenate(xpx_parts)
    xpx = jnp.where(valid > 0, jnp.maximum(xpx, 1e-10), 1.0)

    return PackedMarkers(
        packed=packed, means=means, row_perm=row_perm_d,
        xpx=xpx, grams=grams, valid=valid,
    )


def build_packed_markers(store, obs_ids, block_size: int, rinv=None,
                         dtype=jnp.float32, gram_chunk: int = 8,
                         mesh=None, marker_axis: str = "marker") -> PackedMarkers:
    """Stage a host Packed2BitStore on device and precompute the fast-blocks
    Gram tiles from decoded tiles (GibbsMats analogue, tools4genotypes.jl:237-275).

    obs_ids selects/permutes store rows to the phenotype order (row gather on
    device after decode — packed bits are never repacked). An identity
    permutation is detected and elided.

    When `mesh` has a `marker_axis` with extent > 1, the packed store is
    marker-sharded across the mesh and the Gram precompute runs as a
    shard_map (each device decodes + Grams only its local blocks —
    parallel.distributed.sharded_packed_markers); every returned leaf is a
    global sharded array laid out as `st_data_shardings` expects.
    """
    import numpy as np

    index = {s: i for i, s in enumerate(store.obs_ids)}
    try:
        perm = np.asarray([index[s] for s in obs_ids], dtype=np.int32)
    except KeyError as e:
        raise ValueError(f"individual {e} has no genotypes") from None
    if len(perm) == store.n_obs and (perm == np.arange(store.n_obs)).all():
        perm = None

    n_shards = 0
    if mesh is not None and marker_axis in tuple(getattr(mesh, "axis_names", ())):
        n_shards = int(mesh.shape[marker_axis])

    p = store.n_markers
    b = block_size
    align = b * n_shards if n_shards > 1 else b
    p_pad = -(-p // align) * align
    packed_np = store.packed
    if p_pad != p:
        pad = np.zeros((p_pad - p, store.bytes_per_marker), dtype=np.uint8)
        packed_np = np.concatenate([packed_np, pad], axis=0)
    means_np = np.zeros(p_pad, dtype=np.float32)
    means_np[:p] = store.means
    valid_np = np.zeros(p_pad, dtype=np.float32)
    valid_np[:p] = 1.0

    if n_shards > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from jwas_tpu.parallel.distributed import sharded_packed_markers

        packed_g = jax.device_put(
            packed_np, NamedSharding(mesh, P(marker_axis, None))
        )
        means_g = jax.device_put(means_np, NamedSharding(mesh, P(marker_axis)))
        valid_g = jax.device_put(valid_np, NamedSharding(mesh, P(marker_axis)))
        return sharded_packed_markers(
            packed_g, means_g, valid_g, len(obs_ids), b, mesh, marker_axis,
            row_perm=perm, rinv=rinv, dtype=dtype, gram_chunk=gram_chunk,
        )

    return packed_markers_from_arrays(
        packed_np, means_np, valid_np, perm, len(obs_ids), b,
        rinv=rinv, dtype=dtype, gram_chunk=gram_chunk,
    )
