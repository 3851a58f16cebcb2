"""Pallas blocked-sweep kernel: bit-parity with the XLA scan path.

Runs in interpret mode on the CPU test mesh; on real TPU hardware the same
kernel compiles via Mosaic. The kernel consumes identical RNG draws, so
outputs must match sweep_blocks_abc exactly (up to float associativity in
the rhs update, which is identical here).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jwas_tpu.ops import markers as mk
from jwas_tpu.ops.pallas_sweep import sweep_blocks_abc_pallas


@pytest.mark.parametrize("nreps", [1, 3])
def test_pallas_matches_xla_scan(nreps):
    rng = np.random.default_rng(0)
    n, p, b = 64, 128 * 8 * 2, 8          # nblocks = 256 -> 2 grid cells
    X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    md = mk.build_marker_blocks(X, block_size=b)
    assert md.grams.shape[2] % 128 == 0

    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    alpha = jnp.asarray(rng.normal(size=(md.X.shape[1],)) * 0.1, jnp.float32)
    beta = alpha
    delta = jnp.ones_like(alpha).astype(jnp.int32)
    pi = jnp.where(md.valid > 0, 0.9, 1.0).astype(jnp.float32)
    key = jax.random.PRNGKey(7)
    vare = jnp.asarray(1.3, jnp.float32)
    varg = jnp.asarray(0.02, jnp.float32)

    a1, b1, d1, y1 = mk.sweep_blocks_abc(
        md, alpha, beta, delta, y, None, vare, varg, pi, key, nreps=nreps
    )
    a2, b2, d2, y2 = sweep_blocks_abc_pallas(
        md, alpha, beta, delta, y, None, vare, varg, pi, key, nreps=nreps,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("nreps", [1, 3])
def test_bayesr_pallas_matches_xla_scan(nreps):
    """Resident-Gram BayesR kernel == XLA blocked BayesR sweep (same draws:
    the kernel generates the identical gumbel/normal panels internally)."""
    from jwas_tpu.ops.pallas_sweep import sweep_blocks_bayesr_pallas

    rng = np.random.default_rng(5)
    n, p, b = 64, 128 * 8, 8                 # nblocks = 128
    X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    md = mk.build_marker_blocks(X, block_size=b)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    alpha = jnp.zeros((p,), jnp.float32)
    delta = jnp.zeros((p,), jnp.int32)
    pi = jnp.broadcast_to(
        jnp.asarray([0.9, 0.05, 0.03, 0.02], jnp.float32), (p, 4)
    )
    key = jax.random.PRNGKey(13)
    vare = jnp.asarray(1.2, jnp.float32)
    sigma_sq = jnp.asarray(0.4, jnp.float32)

    a1, d1, y1 = mk.sweep_blocks_bayesr(
        md, alpha, delta, y, None, vare, sigma_sq, pi, key,
        nreps=nreps, sync_every=2,
    )
    a2, d2, y2 = sweep_blocks_bayesr_pallas(
        md, alpha, delta, y, None, vare, sigma_sq, pi, key,
        nreps=nreps, sync_every=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4,
                               atol=1e-5)


def test_dma_kernel_path_matches_xla(monkeypatch):
    """The per-step-DMA kernel variant (used when the Gram tile exceeds the
    resident budget) stays bit-compatible with the XLA scan."""
    import jwas_tpu.ops.pallas_sweep as ps

    monkeypatch.setattr(ps, "RESIDENT_BUDGET", 0)
    rng = np.random.default_rng(2)
    n, p, b = 48, 128 * 8, 8
    X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    md = mk.build_marker_blocks(X, block_size=b)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    alpha = jnp.zeros((p,), jnp.float32)
    delta = jnp.ones((p,), jnp.int32)
    pi = jnp.full((p,), 0.9, jnp.float32)
    key = jax.random.PRNGKey(3)
    a1, b1, d1, y1 = mk.sweep_blocks_abc(
        md, alpha, alpha, delta, y, None, jnp.float32(1.1), jnp.float32(0.05),
        pi, key, nreps=2,
    )
    a2, b2, d2, y2 = ps.sweep_blocks_abc_pallas(
        md, alpha, alpha, delta, y, None, jnp.float32(1.1), jnp.float32(0.05),
        pi, key, nreps=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4,
                               atol=1e-5)


def test_pallas_packed_matches_packed_xla():
    """Pallas inner rounds + packed residual syncs == packed XLA sweep
    (the north-star single-chip path; same draws, same sync rounds)."""
    from jwas_tpu.ops.packed import (
        packed_markers_from_arrays,
        sweep_blocks_abc_packed,
    )
    from jwas_tpu.ops.pallas_sweep import sweep_blocks_abc_pallas_packed

    rng = np.random.default_rng(3)
    n, b, nblocks = 52, 8, 128
    p = b * nblocks
    codes = rng.integers(0, 3, size=(p, n)).astype(np.uint8)
    # pack marker-major rows: 4 codes per byte, low bits first
    n_pad = -(-n // 4) * 4
    codes_pad = np.zeros((p, n_pad), np.uint8)
    codes_pad[:, :n] = codes
    packed = (
        codes_pad[:, 0::4]
        | (codes_pad[:, 1::4] << 2)
        | (codes_pad[:, 2::4] << 4)
        | (codes_pad[:, 3::4] << 6)
    )
    means = codes.mean(axis=1).astype(np.float32)
    valid = np.ones(p, np.float32)
    pm = packed_markers_from_arrays(packed, means, valid, None, n, b)

    X = (codes.astype(np.float32) - means[:, None]).T
    y = jnp.asarray(X @ (rng.normal(size=p) * 0.05) + rng.normal(size=n),
                    jnp.float32)
    alpha = jnp.zeros((p,), jnp.float32)
    beta = alpha
    delta = jnp.ones((p,), jnp.int32)
    pi = jnp.full((p,), 0.9, jnp.float32)
    key = jax.random.PRNGKey(11)
    vare = jnp.asarray(1.1, jnp.float32)
    varg = jnp.asarray(0.05, jnp.float32)

    a1, b1, d1, y1 = sweep_blocks_abc_packed(
        pm, alpha, beta, delta, y, None, vare, varg, pi, key,
        nreps=4, sync_every=2,
    )
    a2, b2, d2, y2 = sweep_blocks_abc_pallas_packed(
        pm, alpha, beta, delta, y, None, vare, varg, pi, key,
        nreps=4, sync_every=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)
