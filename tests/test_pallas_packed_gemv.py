"""Decode-fused Pallas GEMVs == XLA tiled packed GEMVs (interpret mode).

Covers missing codes (2-bit code 3 -> marker mean), centering algebra, the
strided-observation layout, and sub-byte padding columns.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from jwas_tpu.ops.packed import (
    packed_markers_from_arrays,
    packed_matvec,
    packed_rhs,
)
from jwas_tpu.ops.pallas_packed_gemv import packed_matvec_fused, packed_rhs_fused


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(0)
    n, p = 53, 512
    codes = rng.integers(0, 4, size=(p, n)).astype(np.uint8)   # incl. missing
    n_pad = -(-n // 4) * 4
    cp = np.zeros((p, n_pad), np.uint8)
    cp[:, :n] = codes
    packed = (cp[:, 0::4] | (cp[:, 1::4] << 2) | (cp[:, 2::4] << 4)
              | (cp[:, 3::4] << 6))
    means = np.array(
        [codes[j][codes[j] < 3].mean() if (codes[j] < 3).any() else 0.0
         for j in range(p)],
        np.float32,
    )
    pm = packed_markers_from_arrays(packed, means, np.ones(p, np.float32),
                                    None, n, 8)
    # dense ground truth
    X = np.where(codes == 3, means[:, None], codes).astype(np.float64)
    X = (X - means[:, None]).T                                  # (n, p)
    return pm, X, n, p


def test_rhs_fused_matches_xla_and_dense(store):
    pm, X, n, p = store
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=n), jnp.float32)
    r_xla = np.asarray(packed_rhs(pm, w))
    r_fused = np.asarray(packed_rhs_fused(pm.packed, pm.means, w, interpret=True))
    np.testing.assert_allclose(r_fused, r_xla, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(r_fused, X.T @ np.asarray(w), rtol=1e-3, atol=1e-3)


def test_matvec_fused_matches_xla_and_dense(store):
    pm, X, n, p = store
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.normal(size=p), jnp.float32)
    m_xla = np.asarray(packed_matvec(pm, v, n_obs=n))
    m_fused = np.asarray(
        packed_matvec_fused(pm.packed, pm.means, v, n_obs=n, interpret=True)
    )
    np.testing.assert_allclose(m_fused, m_xla, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(m_fused, X @ np.asarray(v), rtol=1e-3, atol=1e-3)


def test_fused_with_marker_padding(store):
    """Padded marker rows (zeros, mean 0) contribute exactly nothing."""
    pm, X, n, p = store
    rng = np.random.default_rng(3)
    pad = 64
    packed_pad = np.concatenate(
        [np.asarray(pm.packed), np.zeros((pad, pm.packed.shape[1]), np.uint8)]
    )
    means_pad = np.concatenate([np.asarray(pm.means), np.zeros(pad, np.float32)])
    w = jnp.asarray(rng.normal(size=n), jnp.float32)
    r = np.asarray(packed_rhs_fused(jnp.asarray(packed_pad),
                                    jnp.asarray(means_pad), w, interpret=True))
    np.testing.assert_allclose(r[p:], 0.0, atol=1e-4)
    v = np.zeros(p + pad, np.float32)
    v[:p] = rng.normal(size=p)
    m = np.asarray(packed_matvec_fused(jnp.asarray(packed_pad),
                                       jnp.asarray(means_pad),
                                       jnp.asarray(v), n_obs=n, interpret=True))
    np.testing.assert_allclose(m, X @ v[:p].astype(np.float64),
                               rtol=1e-3, atol=1e-3)
