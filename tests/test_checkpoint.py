"""Checkpoint / resume: an interrupted-and-resumed chain must be bitwise
identical to an uninterrupted one (the RNG key lives inside the chain state,
so resuming replays the exact stream). The reference has no checkpointing
(SURVEY.md §5); this is a new capability for long pod runs."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from jwas_tpu import build_model, get_genotypes, runMCMC
from jwas_tpu.io.datasets import simulate_genomic_data, simulate_genomic_data_mt
from jwas_tpu.utils import checkpoint as ckpt


def _run(sim, tmp_path, tag, **kw):
    geno = get_genotypes(sim["genotypes"], method=kw.pop("method", "BayesC"),
                         name="geno")
    model = build_model("y = intercept + geno", genotypes=geno)
    base = dict(chain_length=60, burnin=10, output_samples_frequency=5,
                seed=42, output_folder=str(tmp_path / tag))
    base.update(kw)
    return runMCMC(model, sim["phenotypes"], **base)


def test_st_resume_bitwise_identical(tmp_path):
    sim = simulate_genomic_data(n=120, p=60, n_qtl=8, h2=0.5, seed=7)
    ck_a = str(tmp_path / "ck_a")

    full = _run(sim, tmp_path, "a", checkpoint_frequency=20,
                checkpoint_folder=ck_a, checkpoint_keep=10)

    ckpts = sorted(glob.glob(os.path.join(ck_a, "ckpt_*.npz")))
    assert len(ckpts) >= 2, "expected multiple checkpoints"

    # "interrupt": keep only an intermediate checkpoint, resume from it
    ck_b = str(tmp_path / "ck_b")
    os.makedirs(ck_b)
    shutil.copy(ckpts[0], ck_b)

    resumed = _run(sim, tmp_path, "b", checkpoint_frequency=20,
                   checkpoint_folder=ck_b, checkpoint_keep=10, resume=True)

    np.testing.assert_array_equal(
        full["EBV_y"].EBV.to_numpy(), resumed["EBV_y"].EBV.to_numpy()
    )
    np.testing.assert_array_equal(
        full["marker effects geno"].Estimate.to_numpy(),
        resumed["marker effects geno"].Estimate.to_numpy(),
    )
    pd.testing.assert_frame_equal(full["residual variance"],
                                  resumed["residual variance"])


def test_st_resume_without_checkpoint_is_fresh_run(tmp_path):
    """resume=True with an empty checkpoint folder runs from scratch."""
    sim = simulate_genomic_data(n=60, p=30, n_qtl=5, h2=0.5, seed=3)
    plain = _run(sim, tmp_path, "p")
    fresh = _run(sim, tmp_path, "q", resume=True,
                 checkpoint_folder=str(tmp_path / "empty"))
    np.testing.assert_array_equal(
        plain["EBV_y"].EBV.to_numpy(), fresh["EBV_y"].EBV.to_numpy()
    )


def test_mt_resume_bitwise_identical(tmp_path):
    sim = simulate_genomic_data_mt(n=100, p=40, n_qtl=6, seed=11)
    ck_a = str(tmp_path / "ck_a")

    def run_mt(tag, **kw):
        geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
        model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                            genotypes=geno)
        return runMCMC(
            model, sim["phenotypes"], chain_length=60, burnin=10,
            output_samples_frequency=5, seed=5,
            output_folder=str(tmp_path / tag), **kw,
        )

    full = run_mt("a", checkpoint_frequency=20, checkpoint_folder=ck_a,
                  checkpoint_keep=10)
    ckpts = sorted(glob.glob(os.path.join(ck_a, "ckpt_*.npz")))
    assert len(ckpts) >= 2

    ck_b = str(tmp_path / "ck_b")
    os.makedirs(ck_b)
    shutil.copy(ckpts[0], ck_b)
    resumed = run_mt("b", checkpoint_frequency=20, checkpoint_folder=ck_b,
                     checkpoint_keep=10, resume=True)

    for trait in ("y1", "y2"):
        np.testing.assert_array_equal(
            full[f"EBV_{trait}"].EBV.to_numpy(),
            resumed[f"EBV_{trait}"].EBV.to_numpy(),
        )
    pd.testing.assert_frame_equal(full["residual variance"],
                                  resumed["residual variance"])


def test_multichain_resume_bitwise_identical(tmp_path):
    """n_chains>1: the stacked multichain state is one pytree; an
    interrupted-and-resumed 3-chain run must be bitwise identical to the
    uninterrupted one (results AND per-chain PSRF table)."""
    sim = simulate_genomic_data(n=120, p=60, n_qtl=8, h2=0.5, seed=9)
    ck_a = str(tmp_path / "ck_a")

    full = _run(sim, tmp_path, "a", n_chains=3, checkpoint_frequency=20,
                checkpoint_folder=ck_a, checkpoint_keep=10)
    ckpts = sorted(glob.glob(os.path.join(ck_a, "ckpt_*.npz")))
    assert len(ckpts) >= 2, "expected multiple checkpoints"

    ck_b = str(tmp_path / "ck_b")
    os.makedirs(ck_b)
    shutil.copy(ckpts[0], ck_b)
    resumed = _run(sim, tmp_path, "b", n_chains=3, checkpoint_frequency=20,
                   checkpoint_folder=ck_b, checkpoint_keep=10, resume=True)

    np.testing.assert_array_equal(
        full["EBV_y"].EBV.to_numpy(), resumed["EBV_y"].EBV.to_numpy()
    )
    np.testing.assert_array_equal(
        full["marker effects geno"].Estimate.to_numpy(),
        resumed["marker effects geno"].Estimate.to_numpy(),
    )
    pd.testing.assert_frame_equal(full["residual variance"],
                                  resumed["residual variance"])
    pd.testing.assert_frame_equal(full["PSRF"], resumed["PSRF"])


def test_multichain_update_priors_runs(tmp_path):
    """update_priors_frequency with n_chains>1: per-chain marker-scale
    refresh + pooled shared-prior refresh (documented divergence), and the
    run stays accurate."""
    sim = simulate_genomic_data(n=200, p=80, n_qtl=8, h2=0.5, seed=31)
    out = _run(sim, tmp_path, "up", n_chains=2, chain_length=400, burnin=80,
               update_priors_frequency=100)
    acc = np.corrcoef(out["EBV_y"].EBV, sim["true_bv"])[0, 1]
    assert acc > 0.8, f"multichain update-priors EBV accuracy {acc:.3f}"


def test_mt_multichain_resume_bitwise_identical(tmp_path):
    """MT driver, n_chains>1: interrupted-and-resumed equals uninterrupted."""
    sim = simulate_genomic_data_mt(n=100, p=40, n_qtl=6, seed=12)
    ck_a = str(tmp_path / "ck_a")

    def run_mt(tag, **kw):
        geno = get_genotypes(sim["genotypes"], method="BayesC", name="geno")
        model = build_model("y1 = intercept + geno\ny2 = intercept + geno",
                            genotypes=geno)
        return runMCMC(
            model, sim["phenotypes"], chain_length=60, burnin=10,
            output_samples_frequency=5, seed=5, n_chains=2,
            output_folder=str(tmp_path / tag), **kw,
        )

    full = run_mt("a", checkpoint_frequency=20, checkpoint_folder=ck_a,
                  checkpoint_keep=10)
    ckpts = sorted(glob.glob(os.path.join(ck_a, "ckpt_*.npz")))
    assert len(ckpts) >= 2

    ck_b = str(tmp_path / "ck_b")
    os.makedirs(ck_b)
    shutil.copy(ckpts[0], ck_b)
    resumed = run_mt("b", checkpoint_frequency=20, checkpoint_folder=ck_b,
                     checkpoint_keep=10, resume=True)

    for trait in ("y1", "y2"):
        np.testing.assert_array_equal(
            full[f"EBV_{trait}"].EBV.to_numpy(),
            resumed[f"EBV_{trait}"].EBV.to_numpy(),
        )
    pd.testing.assert_frame_equal(full["residual variance"],
                                  resumed["residual variance"])
    if "PSRF" in full:
        pd.testing.assert_frame_equal(full["PSRF"], resumed["PSRF"])


def test_checkpoint_keep_prunes(tmp_path):
    sim = simulate_genomic_data(n=60, p=30, n_qtl=5, h2=0.5, seed=3)
    ck = str(tmp_path / "ck")
    _run(sim, tmp_path, "a", checkpoint_frequency=10, checkpoint_folder=ck,
         checkpoint_keep=2)
    assert len(glob.glob(os.path.join(ck, "ckpt_*.npz"))) == 2


def test_checkpoint_shape_mismatch_raises(tmp_path):
    tree = {"a": np.arange(4.0), "b": (np.ones((2, 2)), None)}
    path = ckpt.save_checkpoint(str(tmp_path), 10, tree, {"s": [np.ones(3)]},
                                {"w_next": 1, "prior_epoch": 0})
    carry, samples, meta = ckpt.load_checkpoint(path, tree)
    np.testing.assert_array_equal(carry["a"], tree["a"])
    assert carry["b"][1] is None
    assert len(samples["s"]) == 1 and meta["iters"] == 10

    bad = {"a": np.arange(5.0), "b": (np.ones((2, 2)), None)}
    with pytest.raises(ValueError, match="shape"):
        ckpt.load_checkpoint(path, bad)
    with pytest.raises(ValueError, match="leaves"):
        ckpt.load_checkpoint(path, {"a": np.arange(4.0)})


def test_sparse_location_resume_bitwise_identical(tmp_path):
    """Checkpoint/resume composes with the sparse location-MME engine
    (pedigree model forced onto the PO-CG path): interrupted-and-resumed
    equals uninterrupted bitwise."""
    from jwas_tpu import get_pedigree, set_random

    rng = np.random.default_rng(5)
    n = 80
    ids = [f"s{i}" for i in range(n)]
    sire = ["missing" if i < 4 else ids[int(rng.integers(0, i))]
            for i in range(n)]
    dam = ["missing" if i < 4 else ids[int(rng.integers(0, i))]
          for i in range(n)]
    ped = get_pedigree(pd.DataFrame({"ID": ids, "S": sire, "D": dam}))
    y = 1.0 + rng.normal(size=n)
    df = pd.DataFrame({"ID": ids, "y": y})

    def run(tag, ck, resume=False):
        model = build_model("y = intercept + ID")
        set_random(model, "ID", ped, np.array(1.0))
        return runMCMC(model, df, chain_length=60, burnin=10,
                       output_samples_frequency=5, seed=42,
                       output_folder=str(tmp_path / tag),
                       sparse_location=True, checkpoint_frequency=20,
                       checkpoint_folder=ck, checkpoint_keep=10,
                       resume=resume, printout_model_info=False)

    ck_a = str(tmp_path / "ck_sa")
    full = run("sa", ck_a)
    ckpts = sorted(glob.glob(os.path.join(ck_a, "ckpt_*.npz")))
    assert len(ckpts) >= 2
    ck_b = str(tmp_path / "ck_sb")
    os.makedirs(ck_b)
    shutil.copy(ckpts[0], ck_b)
    resumed = run("sb", ck_b, resume=True)
    np.testing.assert_array_equal(
        full["EBV_y"].EBV.to_numpy(), resumed["EBV_y"].EBV.to_numpy()
    )
    pd.testing.assert_frame_equal(full["residual variance"],
                                  resumed["residual variance"])
