"""Smoke coverage for the standalone data-prep/analysis tools (the
reference's tools/script/* equivalents): each runs end-to-end on the
synthetic fixture / a fake BOP tree and produces well-formed output."""

import json
import os
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA:CPU integration compiles


class TestRegionStats:
    def test_synthetic_stats(self, capsys):
        from pose_estimation_tpu.tools.region_stats import main
        main(["--synthetic", "--num_regions", "8"])
        out = json.loads(capsys.readouterr().out)
        assert len(out) == 4
        for rec in out.values():
            assert rec["num_regions"] == 8
            assert 0 < rec["radius_max"] < rec["diameter"]
            assert rec["population_min"] >= 0


class TestSampleModel:
    def test_emits_kps_and_corners(self, tmp_path):
        from pose_estimation_tpu.data.testing import write_fake_bop_tree
        from pose_estimation_tpu.tools.sample_model import main
        root = str(tmp_path)
        write_fake_bop_tree(root, num_objects=2, frames_per_object=1)
        out = os.path.join(root, "prep")
        main(["--models_dir", os.path.join(root, "models"), "--out", out,
              "--num_model_points", "64", "--num_regions", "16"])
        pkls = sorted(f for f in os.listdir(out) if f.endswith(".pkl"))
        assert len(pkls) == 2
        d = pickle.load(open(os.path.join(out, pkls[0]), "rb"))
        assert d["model_points"].shape == (64, 3)
        assert d["fps_centers"].shape == (16, 3)
        assert d["kps_8"].shape == (8, 3)       # kps_orb9_fps 8-kps analog
        assert d["corners"].shape == (8, 3)     # bbox corners
        # corners span the extent box exactly
        np.testing.assert_allclose(d["corners"].min(0), d["lf_border"],
                                   atol=1e-6)
        np.testing.assert_allclose(d["corners"].max(0),
                                   d["lf_border"] + d["extent"], atol=1e-6)
        assert os.path.isfile(os.path.join(out, "models_info.json"))


class TestRefineDeclarative:
    def test_refinement_improves_translation(self, capsys):
        from pose_estimation_tpu.tools.refine_declarative import main
        main(["--frames", "4", "--iters", "6", "--rot_deg", "5",
              "--trans_mm", "20"])
        out = json.loads(capsys.readouterr().out)
        # trimmed ICP against the depth cloud must recover most of the
        # translation error (rotation may alias on smooth blobs — see the
        # tool docstring)
        assert out["after"]["trans_mm"] < out["before"]["trans_mm"] * 0.7
        assert np.isfinite(out["mean_residual_mm"])


def test_convergence_merge_variants_preserves_concurrent_entries():
    """Regression for the RESULTS clobber race: a run snapshotting the
    file at launch must not erase variants another process landed while
    it trained (the capacity run erased the committed region_decoded
    entry this way — 7e0ef26 history). merge_variants overlays this
    run's entries onto the file's current contents, winning only name
    collisions."""
    from pose_estimation_tpu.tools.train_synthetic_convergence import (
        merge_variants)

    on_disk = [{"variant": "raw_xyz", "overall": {"add_ok": 0.9}},
               {"variant": "region_decoded", "overall": {"add_ok": 0.8}}]
    produced = [{"variant": "raw_xyz", "overall": {"add_ok": 0.96}}]
    merged = merge_variants(on_disk, produced)
    by_name = {v["variant"]: v for v in merged}
    assert set(by_name) == {"raw_xyz", "region_decoded"}
    assert by_name["raw_xyz"]["overall"]["add_ok"] == 0.96  # ours wins
    assert by_name["region_decoded"]["overall"]["add_ok"] == 0.8  # kept
