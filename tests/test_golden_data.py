"""Reader regression tests against the FROZEN golden mini-datasets.

tests/golden/ holds committed format-exact bytes (generated once by
tests/golden/generate_golden.py, then frozen) carrying the real-corpus
quirks: multi-object gt.yml with decoy entries, per-image BOP
depth_scale variants, jpg-only rgb frames, EXR channels under three
compressions, pose-less variant-mask instances. Unlike the
test-generated trees (data/testing.py), a parser regression here cannot
hide behind a matching writer change — the bytes never move.
(VERDICT r4 missing #3 / task 7.)
"""

import json
import os

import numpy as np
import pytest

pytest.importorskip("cv2")

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
EXPECTED = json.load(open(os.path.join(GOLDEN, "expected.json")))


class TestGoldenBOP:
    @pytest.fixture(scope="class")
    def ds(self):
        from pose_estimation_tpu.data.linemod import LinemodBOPDataset
        return LinemodBOPDataset(os.path.join(GOLDEN, "bop"), split="test",
                                 object_ids=[1, 2], num_regions=16)

    def test_index_has_all_instances(self, ds):
        # im0: obj1; im1: obj2; im2: obj1 AND obj2 (multi-instance entry)
        assert len(ds) == 4
        pairs = sorted((im, oid) for (_, im, oid, *_rest) in ds.index)
        assert pairs == [(0, 1), (1, 2), (2, 1), (2, 2)]

    def test_poses_match_frozen_values(self, ds):
        for (_, im, oid, r, t, _k, ds_) in ds.index:
            exp = EXPECTED["bop"][f"{im}/{oid}"]
            np.testing.assert_allclose(r.reshape(-1), exp["r"], atol=1e-5)
            np.testing.assert_allclose(t, exp["t"], atol=1e-6)
            assert ds_ == exp["depth_scale"]

    def test_jpg_only_rgb_frame_loads(self, ds):
        i = next(i for i, e in enumerate(ds.index) if e[1] == 1)
        frame = ds[i]
        assert frame["rgb"].shape == (240, 320, 3)
        assert frame["rgb"].max() > 0.1

    def test_depth_scale_applied(self, ds):
        """The 0.1-depth_scale frame must come back in true meters: the
        masked depth sits at the stored t_z (+- object radius); a reader
        ignoring scene_camera depth_scale is 10x off."""
        for i, entry in enumerate(ds.index):
            _, im, oid, _r, t, _k, _ds = entry
            frame = ds[i]
            m = frame["mask"]
            if m.sum() < 50:
                continue
            med = float(np.median(frame["depth"][m]))
            assert abs(med - t[2]) < 0.15, (im, oid, med, t[2])

    def test_multi_instance_frame_yields_disjoint_masks(self, ds):
        idx = [i for i, e in enumerate(ds.index) if e[1] == 2]
        assert len(idx) == 2
        f1, f2 = ds[idx[0]], ds[idx[1]]
        assert f1["obj_id"] != f2["obj_id"]
        overlap = (f1["mask"] & f2["mask"]).sum()
        assert overlap <= min(f1["mask"].sum(), f2["mask"].sum()) * 0.2

    def test_batchable(self, ds, key):
        from pose_estimation_tpu.data.batching import make_batch
        batch = make_batch(ds, list(range(len(ds))), key, 64, 128)
        assert batch["img"].shape[0] == len(ds)
        assert np.isfinite(np.asarray(batch["cloud"])).all()


class TestGoldenClassic:
    def test_train_list_and_pose_entry_selection(self):
        """gt.yml frames list a DECOY obj-5 entry first; the reader must
        pick obj 1's pose by obj_id (batchdataset.py:230-236)."""
        from pose_estimation_tpu.data.linemod import LinemodClassicDataset
        ds = LinemodClassicDataset(os.path.join(GOLDEN, "classic"),
                                   mode="train", cls_type="ape",
                                   num_regions=16)
        assert len(ds) == 3  # real x3, no synthetic lists in the tree
        frame = ds[0]
        exp = EXPECTED["classic"]["0"]
        assert not np.allclose(frame["t"], exp["decoy_t"], atol=1e-3)
        np.testing.assert_allclose(frame["r"].reshape(-1), exp["r"],
                                   atol=1e-5)
        np.testing.assert_allclose(frame["t"], exp["t"], atol=1e-6)
        assert frame["mask"].sum() > 100

    def test_eval_mode_segnet_masks(self):
        from pose_estimation_tpu.data.linemod import LinemodClassicDataset
        ds = LinemodClassicDataset(os.path.join(GOLDEN, "classic"),
                                   mode="eval", cls_type="ape",
                                   num_regions=16)
        assert len(ds) == 1
        frame = ds[0]
        exp = EXPECTED["classic"]["1"]
        np.testing.assert_allclose(frame["t"], exp["t"], atol=1e-6)
        assert frame["mask"].sum() > 100

    def test_dispatch_picks_classic(self):
        from pose_estimation_tpu.data.linemod import (
            LinemodClassicDataset, LinemodDataset)
        ds = LinemodDataset(os.path.join(GOLDEN, "classic"), mode="train",
                            cls_type="ape")
        assert isinstance(ds, LinemodClassicDataset)


class TestGoldenClearGrasp:
    @pytest.fixture(scope="class")
    def ds(self):
        from pose_estimation_tpu.data.cleargrasp import ClearGraspDataset
        return ClearGraspDataset(os.path.join(GOLDEN, "cleargrasp"),
                                 split="train")

    def test_poseless_instance_skipped(self, ds):
        # frame 0 has variant-mask value 2 with "pose": None
        assert len(ds) == 2
        assert all(inst.instance_id == 1 for inst in ds.instances)

    def test_world_pose_json_roundtrip(self, ds):
        """quaternion+location in the blender world frame must come back
        as the camera-frame (r, t) frozen in expected.json — covers the
        quaternion order (x,y,z,w), the flip convention, and fov-derived
        intrinsics (cleargrasp/dataset.py:204-239)."""
        for fi in range(2):
            exp = EXPECTED["cleargrasp"][str(fi)]
            inst = ds.instances[fi]
            np.testing.assert_allclose(inst.r.reshape(-1), exp["r"],
                                       atol=1e-5)
            np.testing.assert_allclose(inst.t, exp["t"], atol=1e-5)

    def test_exr_channels_decode_from_frozen_bytes(self, ds):
        """depth (ZIP), normals (ZIPS), variant mask (NONE) all decode
        from the committed bytes; the variant mask carves the instance."""
        frame = ds[0]
        assert frame["depth"].shape == (240, 320)
        assert frame["normal"].shape == (240, 320, 3)
        assert frame["mask"].sum() > 100
        # pose-less instance-2 pixels are NOT in instance-1's mask
        assert not frame["mask"][:20, :20].any()
        n = frame["normal"][frame["mask"]]
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0,
                                   atol=1e-2)

    def test_depth_pose_consistency(self, ds):
        """Masked depth backprojected with the fov-derived K must land on
        the gt-posed model points — ties EXR decode, json pose math and
        intrinsics together (wrong any-of-them scatters the cloud)."""
        for fi in range(2):
            frame = ds[fi]
            m = frame["mask"] & (frame["depth"] > 0.1)
            v, u = np.nonzero(m)
            sel = slice(None, None, max(1, len(u) // 400))
            z = frame["depth"][v[sel], u[sel]]
            k = frame["k"]
            px = (u[sel] - k[0, 2]) * z / k[0, 0]
            py = (v[sel] - k[1, 2]) * z / k[1, 1]
            cloud = np.stack([px, py, z], -1)
            target = (ds.model_points(0, 800) @ frame["r"].T + frame["t"])
            d = np.linalg.norm(cloud[:, None] - target[None], axis=-1)
            assert np.median(d.min(-1)) < 0.01

    def test_transparent_batchable(self, ds):
        from pose_estimation_tpu.data.transparent_batching import (
            frame_to_transparent_sample)
        rng = np.random.RandomState(0)
        frame = ds[0]
        frame["sym"] = 0.0
        s = frame_to_transparent_sample(frame, ds.model_points(0, 500),
                                        rng, img_size=128, num_model=256)
        assert s["img"].shape == (128, 128, 3)
        assert np.isfinite(s["target"]).all()
        assert s["mask"].sum() > 10


class TestGoldenBytesAreFrozen:
    def test_trees_exist_and_nonempty(self):
        for sub, n_min in (("bop", 10), ("classic", 10), ("cleargrasp", 8)):
            files = []
            for dirpath, _dirs, fnames in os.walk(os.path.join(GOLDEN, sub)):
                files += [os.path.join(dirpath, f) for f in fnames]
            assert len(files) >= n_min, (sub, files)
            assert all(os.path.getsize(f) > 0 for f in files)
