"""Packaged dataset analogues (reference: src/4.Datasets)."""

import numpy as np
import pandas as pd
import pytest

from jwas_tpu.io.datasets import dataset


def test_simulated_annotations_tables():
    geno = pd.read_csv(dataset("genotypes", dataset_name="simulated_annotations"))
    anno = pd.read_csv(dataset("annotations.csv", dataset_name="simulated_annotations"))
    truth = pd.read_csv(dataset("truth", dataset_name="simulated_annotations"))
    ph = pd.read_csv(dataset("phenotypes", dataset_name="simulated_annotations"))
    assert geno.shape == (400, 965)
    assert list(anno.columns) == ["marker_id", "functional", "random_anno"]
    assert truth.is_causal.sum() == 10
    # causal markers are enriched in the functional class
    m = truth.merge(anno, on="marker_id")
    assert m[m.is_causal].functional.mean() > m.functional.mean()
    assert len(ph) == 400

    tmt = pd.read_csv(dataset("truth_mt", dataset_name="simulated_annotations"),
                      dtype={"state": str})
    assert set(tmt.state) <= {"00", "01", "10", "11"}
    assert (tmt.state != "00").sum() > 10
    pmt = pd.read_csv(dataset("phenotypes_mt", dataset_name="simulated_annotations"))
    assert list(pmt.columns) == ["ID", "y1", "y2"]


def test_simulated_omics_consistency():
    ph = pd.read_csv(dataset("phenotypes", dataset_name="simulated_omics"))
    ped = pd.read_csv(dataset("pedigree", dataset_name="simulated_omics"))
    geno = pd.read_csv(dataset("genotypes_1000snps", dataset_name="simulated_omics"))
    assert len(ped) == 6473 and len(ph) == 3534
    assert geno.shape == (3534, 1001)
    # genotyped IDs are a subset of the pedigree
    assert set(ph.ID.astype(str)) <= set(ped.ID.astype(str))
    np.testing.assert_allclose(
        ph.genetic_total, ph.genetic_direct + ph.genetic_indirect, atol=1e-9
    )
    # direct:indirect genetic variance split ~ 20:80 (test_simulated_omics.jl:6-7)
    r = ph.genetic_direct.var() / ph.genetic_total.var()
    assert 0.1 < r < 0.35


def test_unknown_dataset_errors():
    with pytest.raises(ValueError, match="unknown dataset"):
        dataset("phenotypes", dataset_name="nope")
    with pytest.raises(ValueError, match="unknown table"):
        dataset("nope", dataset_name="demo_7animals")


def test_dataset_reference_data_hook(tmp_path, monkeypatch):
    """JWAS_REFERENCE_DATA points at a reference checkout's data dir: files
    found there are returned verbatim (byte-for-byte example reproduction),
    falling back to the generated analogues otherwise."""
    import os

    from jwas_tpu.io.datasets import dataset

    ref = tmp_path / "data" / "demo_7animals"
    ref.mkdir(parents=True)
    (ref / "phenotypes.txt").write_text("ID,y\na1,1.0\n")
    monkeypatch.setenv("JWAS_REFERENCE_DATA", str(tmp_path / "data"))
    p = dataset("phenotypes")
    assert p == str(ref / "phenotypes.txt")
    assert open(p).read() == "ID,y\na1,1.0\n"
    # a table the checkout does not carry falls back to the simulation
    p2 = dataset("genotypes")
    assert os.path.isfile(p2) and "jwas_tpu_demo_7animals" in p2
