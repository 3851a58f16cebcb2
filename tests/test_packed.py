"""2-bit packed genotype backend tests.

Mirrors the reference streaming tests (reference:
test/unit/test_streaming_codec.jl — packed-vs-dense decode equality marker by
marker; test_streaming_constraints.jl — unsupported-configuration rejections),
plus an end-to-end packed BayesC chain checked for accuracy against the dense
path.
"""

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import (
    Packed2BitStore,
    build_model,
    get_genotypes,
    prepare_packed_genotypes,
    runMCMC,
)
from jwas_tpu.io.datasets import simulate_genomic_data
from jwas_tpu.io.packed import _native_lib


def _geno_df(n=90, p=37, seed=7, missing_frac=0.05):
    rng = np.random.default_rng(seed)
    X = rng.integers(0, 3, size=(n, p)).astype(np.float32)
    if missing_frac:
        miss = rng.uniform(size=X.shape) < missing_frac
        X[miss] = 9.0
    ids = [f"i{k}" for k in range(n)]
    df = pd.DataFrame(X, columns=[f"m{j}" for j in range(p)])
    df.insert(0, "ID", ids)
    return df, X


def test_pack_decode_roundtrip():
    df, X = _geno_df()
    store = prepare_packed_genotypes(df)
    assert store.packed.shape == (37, (90 + 3) // 4)
    # decode equals mean-imputed centered dense, marker by marker
    miss = X == 9.0
    cnt = np.maximum((~miss).sum(axis=0), 1)
    means = np.where(miss, 0, X).sum(axis=0) / cnt
    dense = np.where(miss, means[None, :], X) - means[None, :]
    dec = store.decode(np.arange(37))
    np.testing.assert_allclose(dec, dense, atol=1e-5)
    # uncentered decode
    dec_u = store.decode([0, 5], center=False)
    np.testing.assert_allclose(dec_u + means[[0, 5]][None, :],
                               dec[:, [0, 5]] + 2 * means[[0, 5]][None, :],
                               atol=1e-5)


def test_native_and_numpy_paths_agree(monkeypatch):
    df, X = _geno_df(seed=9)
    lib = _native_lib()
    store_native = prepare_packed_genotypes(df)
    import jwas_tpu.io.packed as pk

    monkeypatch.setattr(pk, "_LIB", None)
    monkeypatch.setattr(pk, "_LIB_TRIED", True)
    store_np = prepare_packed_genotypes(df)
    np.testing.assert_array_equal(store_native.packed, store_np.packed)
    np.testing.assert_allclose(store_native.means, store_np.means, atol=1e-6)
    np.testing.assert_allclose(
        store_native.decode(np.arange(10)), store_np.decode(np.arange(10)),
        atol=1e-6,
    )
    if lib is None:
        pytest.skip("native packer unavailable; compared numpy with numpy")


def test_save_load_roundtrip(tmp_path):
    df, _ = _geno_df(seed=11)
    path = str(tmp_path / "geno")
    store = prepare_packed_genotypes(df, save_path=path)
    loaded = Packed2BitStore.load(path)
    np.testing.assert_array_equal(store.packed, loaded.packed)
    assert loaded.obs_ids == store.obs_ids
    np.testing.assert_allclose(loaded.means, store.means)


def test_device_ops_match_dense():
    import jax.numpy as jnp

    from jwas_tpu.ops.packed import (
        build_packed_markers,
        packed_matvec,
        packed_rhs,
    )
    from jwas_tpu.ops import markers as mk

    df, X = _geno_df(n=60, p=50, seed=13, missing_frac=0.0)
    store = prepare_packed_genotypes(df)
    obs = [f"i{k}" for k in range(59, -1, -1)]        # reversed order
    pm = build_packed_markers(store, obs, block_size=16)
    dense = store.decode(np.arange(50))[::-1]          # same reversed rows
    v = np.random.default_rng(0).normal(size=pm.packed.shape[0]).astype(np.float32)
    v[50:] = 0.0
    got = np.asarray(packed_matvec(pm, jnp.asarray(v)))
    np.testing.assert_allclose(got, dense @ v[:50], rtol=2e-4, atol=1e-3)
    w = np.random.default_rng(1).normal(size=60).astype(np.float32)
    got_rhs = np.asarray(packed_rhs(pm, jnp.asarray(w)))
    np.testing.assert_allclose(got_rhs[:50], dense.T @ w, rtol=2e-4, atol=1e-3)
    # Gram tiles match dense blocked Grams
    md = mk.build_marker_blocks(jnp.asarray(dense), block_size=16)
    np.testing.assert_allclose(np.asarray(pm.grams)[:, :, :3],
                               np.asarray(md.grams)[:, :, :3], rtol=1e-3,
                               atol=1e-2)


def test_packed_end_to_end_accuracy():
    sim = simulate_genomic_data(n=400, p=150, n_qtl=15, h2=0.6, seed=77)
    store = prepare_packed_genotypes(sim["genotypes"])
    geno = get_genotypes(store, method="BayesC", name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    out = runMCMC(model, sim["phenotypes"], chain_length=600, burnin=150,
                  seed=5, output_folder="")
    acc = np.corrcoef(out["EBV_y"].EBV, sim["true_bv"])[0, 1]
    assert acc > 0.85, f"packed BayesC EBV accuracy {acc:.3f}"


def test_packed_constraints():
    df, _ = _geno_df(n=40, p=20, seed=15)
    with pytest.raises(ValueError, match="BayesC/BayesB"):
        get_genotypes(df, method="RR-BLUP", storage="2bit", name="geno")
    store = prepare_packed_genotypes(df)
    geno = get_genotypes(store, method="BayesC", name="geno")
    model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                        genotypes=geno)
    ph = pd.DataFrame({"ID": [f"i{k}" for k in range(40)],
                       "y1": np.random.default_rng(0).normal(size=40),
                       "y2": np.random.default_rng(1).normal(size=40)})
    with pytest.raises(ValueError, match="single-trait"):
        runMCMC(model, ph, chain_length=5, output_folder="")


def test_low_memory_conversion_matches_dense(tmp_path):
    """Out-of-core two-pass conversion (streaming_genotypes.jl:658-789) must
    produce a byte-identical store to the in-memory path."""
    df, X = _geno_df(n=203, p=41, seed=13, missing_frac=0.08)
    csv = str(tmp_path / "geno.csv")
    df.to_csv(csv, index=False)

    dense = prepare_packed_genotypes(csv)
    lowmem = prepare_packed_genotypes(
        csv, low_memory=True, save_path=str(tmp_path / "store"), chunk_rows=64
    )
    assert lowmem.n_obs == dense.n_obs
    assert lowmem.marker_ids == dense.marker_ids
    np.testing.assert_array_equal(np.asarray(lowmem.packed), dense.packed)
    np.testing.assert_allclose(lowmem.means, dense.means, rtol=1e-12)
    # decode equality marker by marker (test_streaming_codec.jl:21-51)
    cols = list(range(41))
    np.testing.assert_allclose(lowmem.decode(cols), dense.decode(cols), atol=0)
    # manifest reload round-trips
    re = Packed2BitStore.load(str(tmp_path / "store"))
    np.testing.assert_array_equal(re.packed, dense.packed)


def test_low_memory_maf_filter(tmp_path):
    df, X = _geno_df(n=100, p=20, seed=3, missing_frac=0.0)
    # make two markers fixed -> MAF filter must drop them
    df.iloc[:, 1] = 0.0
    df.iloc[:, 5] = 2.0
    csv = str(tmp_path / "g.csv")
    df.to_csv(csv, index=False)
    st = prepare_packed_genotypes(
        csv, low_memory=True, MAF=0.01, save_path=str(tmp_path / "s"),
        chunk_rows=32,
    )
    assert st.n_markers == 18
    assert "m0" not in st.marker_ids and "m4" not in st.marker_ids


def test_low_memory_disk_guard(tmp_path):
    df, _ = _geno_df(n=40, p=10)
    csv = str(tmp_path / "g.csv")
    df.to_csv(csv, index=False)
    with pytest.raises(RuntimeError, match="disk_guard"):
        prepare_packed_genotypes(
            csv, low_memory=True, save_path=str(tmp_path / "s"),
            disk_guard_ratio=1e-12,
        )


def test_low_memory_requires_path_and_save(tmp_path):
    df, _ = _geno_df(n=12, p=4)
    with pytest.raises(TypeError):
        prepare_packed_genotypes(df, low_memory=True, save_path="x")
    csv = str(tmp_path / "g.csv")
    df.to_csv(csv, index=False)
    with pytest.raises(ValueError):
        prepare_packed_genotypes(csv, low_memory=True)


def test_load_mmap_matches_ram(tmp_path):
    """mmap=True loads the .j2b as a memory map (for stores larger than free
    RAM); contents and downstream decode are identical to the RAM load."""
    df, _ = _geno_df(n=52, p=24, seed=19)
    path = str(tmp_path / "geno")
    prepare_packed_genotypes(df, save_path=path)
    ram = Packed2BitStore.load(path)
    mm = Packed2BitStore.load(path, mmap=True)
    assert isinstance(mm.packed, np.memmap)
    np.testing.assert_array_equal(np.asarray(mm.packed), ram.packed)
    np.testing.assert_allclose(mm.decode([0, 3]), ram.decode([0, 3]), atol=0)
