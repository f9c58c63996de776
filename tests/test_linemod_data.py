"""Real-data path: fake on-disk BOP tree -> reader -> batch -> CLI train+eval.

Round-1 gap: nothing exercised the disk readers end-to-end, and
make_batch's objects[cls_id] keying crashed on LinemodBOPDataset's
BOP-id-keyed dict. These tests run the actual CLI against a real
directory tree written by data/testing.write_fake_bop_tree.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA:CPU integration compiles

from pose_estimation_tpu.data.testing import write_fake_bop_tree

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def bop_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fake_bop"))
    objs = write_fake_bop_tree(root, num_objects=2, frames_per_object=4,
                               depth_scale=0.5)
    return root, objs


class TestBOPReader:
    def test_index_and_objects(self, bop_tree):
        from pose_estimation_tpu.data.linemod import LinemodBOPDataset
        root, objs = bop_tree
        ds = LinemodBOPDataset(root, split="test", cls_type="all",
                               num_regions=16,
                               object_ids=[1, 2], sym_ids=set())
        assert len(ds) == 8
        assert len(ds.objects_by_cls) == 2
        # diameter must come from models_info (true max-pairwise), not the
        # bbox diagonal (which is strictly larger)
        with open(os.path.join(root, "models", "models_info.json")) as f:
            info = json.load(f)
        for oid in (1, 2):
            obj = ds.objects[oid]
            assert abs(obj.diameter - info[str(oid)]["diameter"] / 1000.0) \
                < 1e-6
            bbox_diag = float(np.linalg.norm(obj.extent))
            assert obj.diameter < bbox_diag

    def test_depth_scale_applied(self, bop_tree):
        """depth png stores units of 0.5mm; reader must return meters."""
        from pose_estimation_tpu.data.linemod import LinemodBOPDataset
        root, objs = bop_tree
        ds = LinemodBOPDataset(root, split="test", cls_type="all",
                               num_regions=16,
                               object_ids=[1, 2], sym_ids=set())
        frame = ds[0]
        d = frame["depth"][frame["mask"]]
        assert d.size > 50
        # synthetic poses put the object 0.6-1.1 m away
        assert 0.4 < float(np.median(d)) < 1.3

    def test_cls_id_is_zero_based_and_batchable(self, bop_tree, key):
        from pose_estimation_tpu.data.batching import make_batch
        from pose_estimation_tpu.data.linemod import LinemodBOPDataset
        root, objs = bop_tree
        ds = LinemodBOPDataset(root, split="test", cls_type="all",
                               num_regions=16,
                               object_ids=[1, 2], sym_ids=set())
        cls_ids = {ds[i]["cls_id"] for i in range(len(ds))}
        assert cls_ids == {0, 1}
        batch = make_batch(ds, [0, 4], key, crop_size=32, num_points=64)
        assert batch["img"].shape == (2, 32, 32, 3)
        assert batch["cloud"].shape == (2, 64, 3)
        assert set(np.asarray(batch["cls"]).tolist()) == {0, 1}

    def test_eval_detection_bboxes(self, bop_tree, key):
        """yolov3 eval bboxes (lm_bop.py:100-101,170): when
        test_bboxes/bbox_yolov3_all.json exists, eval frames carry the
        detection crop and the batch pipeline crops from it."""
        from pose_estimation_tpu.data.batching import make_batch
        from pose_estimation_tpu.data.linemod import LinemodBOPDataset
        root, objs = bop_tree
        bb_dir = os.path.join(root, "test", "test_bboxes")
        os.makedirs(bb_dir, exist_ok=True)
        # fabricate detections near the gt (oid/im_id keys)
        ds0 = LinemodBOPDataset(root, split="test", cls_type="all",
                                num_regions=16, object_ids=[1, 2],
                                sym_ids=set())
        dets = {}
        for i in range(len(ds0)):
            sdir, im_id, oid, r, t, k, dsc = ds0.index[i]
            f = ds0[i]
            rows = np.any(f["mask"], 1)
            cols = np.any(f["mask"], 0)
            rmin, rmax = np.where(rows)[0][[0, -1]]
            cmin, cmax = np.where(cols)[0][[0, -1]]
            dets[f"{oid}/{im_id}"] = [{"bbox_est": [
                int(cmin) - 2, int(rmin) - 2,
                int(cmax - cmin) + 4, int(rmax - rmin) + 4]}]
        with open(os.path.join(bb_dir, "bbox_yolov3_all.json"), "w") as f:
            json.dump(dets, f)

        ds = LinemodBOPDataset(root, split="test", cls_type="all",
                               num_regions=16, object_ids=[1, 2],
                               sym_ids=set(), eval_bboxes=True)
        frame = ds[0]
        assert "det_center" in frame and "det_side" in frame
        batch = make_batch(ds, [0, 1], key, crop_size=32, num_points=64)
        assert batch["img"].shape == (2, 32, 32, 3)
        # crop center must track the detection, not stray defaults
        np.testing.assert_allclose(np.asarray(batch["bbox_center"][0]),
                                   frame["det_center"], atol=1e-4)

    def test_render_split_background_paste(self, tmp_path_factory):
        """BOP frames from an empty-background render split get a pasted
        background over non-rendered pixels (the reference's COCO paste
        for `render`-type frames, lm_bop.py:235-244); real/test splits
        keep the original pixels."""
        from pose_estimation_tpu.data.linemod import LinemodBOPDataset
        root = str(tmp_path_factory.mktemp("fake_bop_synt"))
        write_fake_bop_tree(root, num_objects=1, frames_per_object=2,
                            splits=("train_synt", "test"))
        synt = LinemodBOPDataset(root, split="train_synt", cls_type="all",
                                 num_regions=16, object_ids=[1],
                                 sym_ids=set())
        test = LinemodBOPDataset(root, split="test", cls_type="all",
                                 num_regions=16, object_ids=[1],
                                 sym_ids=set())
        import cv2
        fs = synt[0]
        # test-split frames keep the decoded png exactly
        ft = test[0]
        png = cv2.cvtColor(cv2.imread(os.path.join(
            root, "test", "000001", "rgb", "000000.png")),
            cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        np.testing.assert_allclose(ft["rgb"], png, atol=1e-6)
        # render-split background pixels were replaced...
        png_s = cv2.cvtColor(cv2.imread(os.path.join(
            root, "train_synt", "000001", "rgb", "000000.png")),
            cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        bg = ~fs["mask"]
        assert np.abs(fs["rgb"][bg] - png_s[bg]).max() > 0.05
        # ...while rendered (object) pixels are untouched
        np.testing.assert_allclose(fs["rgb"][fs["mask"]],
                                   png_s[fs["mask"]], atol=1e-6)
        # and the paste redraws per epoch (set_epoch reshuffle semantics)
        before = synt[0]["rgb"].copy()
        synt.set_epoch(1)
        after = synt[0]["rgb"]
        assert np.abs(before[bg] - after[bg]).max() > 0.01

    def test_single_class_selection(self, bop_tree):
        from pose_estimation_tpu.data.linemod import LinemodBOPDataset
        root, objs = bop_tree
        ds = LinemodBOPDataset(root, split="test", cls_type="ape",
                               num_regions=16, sym_ids=set(),
                               object_ids=None)  # ape -> BOP id 1
        assert len(ds) == 4
        assert all(ds[i]["cls_id"] == 0 for i in range(2))


@pytest.fixture(scope="module")
def classic_tree(tmp_path_factory):
    from pose_estimation_tpu.data.testing import write_fake_classic_tree
    root = str(tmp_path_factory.mktemp("fake_classic"))
    objs = write_fake_classic_tree(root, num_objects=2,
                                   frames_per_object=4, syn_per_object=2)
    return root, objs


class TestClassicReader:
    def test_train_list_composition(self, classic_tree):
        """real x3 + sampled renders (batchdataset.py:130-145)."""
        from pose_estimation_tpu.data.linemod import LinemodClassicDataset
        root, objs = classic_tree
        ds = LinemodClassicDataset(root, mode="train", cls_type="all",
                                   num_regions=16, num_syn=2, part_syn=True)
        # per object: 2 real (train.txt half) x3 + 2 renders = 8
        assert len(ds) == 16
        kinds = [ds.index[i][0] for i in range(len(ds))]
        assert kinds.count("real") == 12 and kinds.count("syn") == 4

    def test_real_and_syn_frames_consistent(self, classic_tree):
        from pose_estimation_tpu.data.linemod import LinemodClassicDataset
        root, objs = classic_tree
        ds = LinemodClassicDataset(root, mode="train", cls_type="all",
                                   num_regions=16, num_syn=2)
        real_i = next(i for i in range(len(ds)) if ds.index[i][0] == "real")
        syn_i = next(i for i in range(len(ds)) if ds.index[i][0] == "syn")
        for i in (real_i, syn_i):
            f = ds[i]
            assert f["mask"].sum() > 50
            d = f["depth"][f["mask"]]
            assert 0.4 < float(np.median(d)) < 1.3
            # labels regenerated: coordinate nonzero exactly on mask
            assert (np.any(f["coordinate"] != 0, -1) == f["mask"]).mean() \
                > 0.99

    def test_eval_mode_uses_segnet_masks(self, classic_tree):
        from pose_estimation_tpu.data.linemod import LinemodClassicDataset
        root, objs = classic_tree
        ds = LinemodClassicDataset(root, mode="eval", cls_type="ape",
                                   num_regions=16)
        assert len(ds) == 2  # test.txt half
        f = ds[0]
        assert f["mask"].sum() > 50

    def test_augmentation_changes_rgb_and_adds_tnoise(self, classic_tree):
        from pose_estimation_tpu.data.linemod import LinemodClassicDataset
        root, objs = classic_tree
        ds = LinemodClassicDataset(root, mode="train", cls_type="all",
                                   num_regions=16, num_syn=2,
                                   add_noise=True, noise_trans=0.03)
        f = ds[0]
        assert "t_noise" in f
        assert np.abs(f["t_noise"]).max() <= 0.03
        ds0 = LinemodClassicDataset(root, mode="train", cls_type="all",
                                    num_regions=16, num_syn=2)
        f0 = ds0[0]
        assert not np.allclose(f["rgb"], f0["rgb"])

    def test_augmentation_redraws_each_epoch(self, classic_tree):
        """set_epoch must change the jitter/noise draws (the reference's
        torchvision transforms re-sample every visit); same epoch must
        stay deterministic."""
        from pose_estimation_tpu.data.linemod import LinemodClassicDataset
        root, objs = classic_tree
        ds = LinemodClassicDataset(root, mode="train", cls_type="all",
                                   num_regions=16, num_syn=2,
                                   add_noise=True, noise_trans=0.03)
        f_e0 = ds[0]
        ds.set_epoch(1)
        f_e1 = ds[0]
        assert not np.allclose(f_e0["rgb"], f_e1["rgb"])
        assert not np.allclose(f_e0["t_noise"], f_e1["t_noise"])
        ds.set_epoch(0)
        f_e0b = ds[0]
        assert np.allclose(f_e0["rgb"], f_e0b["rgb"])

    def test_dispatch_picks_classic(self, classic_tree, bop_tree):
        from pose_estimation_tpu.data.linemod import (
            LinemodBOPDataset, LinemodClassicDataset, LinemodDataset)
        croot, _ = classic_tree
        broot, _ = bop_tree
        assert isinstance(LinemodDataset(croot, mode="train",
                                         cls_type="ape"),
                          LinemodClassicDataset)
        assert isinstance(LinemodDataset(broot, mode="test",
                                         cls_type="all"),
                          LinemodBOPDataset)


class TestAugmentOps:
    def test_color_jitter_bounded(self):
        from pose_estimation_tpu.data.augment import color_jitter
        rng = np.random.RandomState(0)
        img = rng.rand(32, 32, 3).astype(np.float32)
        out = color_jitter(rng, img)
        assert out.shape == img.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.allclose(out, img)

    def test_background_paste_only_touches_background(self):
        from pose_estimation_tpu.data.augment import (
            BackgroundBank, paste_background)
        rng = np.random.RandomState(0)
        rgb = np.ones((16, 16, 3), np.float32) * 0.5
        mask = np.zeros((16, 16), np.int32)
        mask[4:12, 4:12] = 1
        out = paste_background(rng, rgb, mask, BackgroundBank())
        np.testing.assert_allclose(out[4:12, 4:12], 0.5)
        assert not np.allclose(out[0:4], 0.5)

    def test_tnoise_shifts_cloud_and_target_consistently(self, classic_tree,
                                                         key):
        """cloud, target and target_t must shift by the SAME vector so the
        pose loss geometry stays consistent (DenseFusion noise_trans)."""
        from pose_estimation_tpu.data.batching import make_batch
        from pose_estimation_tpu.data.linemod import LinemodClassicDataset
        root, objs = classic_tree
        kw = dict(mode="train", cls_type="all", num_regions=16, num_syn=2)
        ds_n = LinemodClassicDataset(root, add_noise=True,
                                     noise_trans=0.05, **kw)
        ds_0 = LinemodClassicDataset(root, **kw)
        bn = make_batch(ds_n, [0], key, crop_size=32, num_points=64)
        b0 = make_batch(ds_0, [0], key, crop_size=32, num_points=64)
        shift_t = np.asarray(bn["target_t"] - b0["target_t"])[0]
        assert np.abs(shift_t).max() > 1e-4  # noise actually applied
        shift_target = np.asarray(bn["target"] - b0["target"])[0]
        np.testing.assert_allclose(
            shift_target, np.broadcast_to(shift_t, shift_target.shape),
            atol=1e-5)
        shift_cloud = np.asarray(bn["cloud"] - b0["cloud"])[0]
        np.testing.assert_allclose(
            shift_cloud, np.broadcast_to(shift_t, shift_cloud.shape),
            atol=1e-5)


TINY_CFG = """
from pose_estimation_tpu.configs import schema

def get_config():
    tiny_stages = ((1, 1, (8, 8)), (1, 1, (8, 8, 8)), (1, 1, (8, 8, 8, 8)))
    return schema.override(
        schema.Config(dataset="linemod", cls_type="all"),
        **{"module.num_cls": 2, "data.num_regions": 16,
           "data.num_points": 64, "data.input_size": 32,
           "module.backbone_outc": 16, "train.amp": False,
           "module.hrnet_stages": tiny_stages, "module.stem_width": 8,
           "module.xyznet": schema.HeadConfig(hidden=8),
           "module.nmlnet": schema.HeadConfig(hidden=8),
           "module.gcn3d": schema.Gcn3dConfig(neighbor_num=4,
                                              support_num=2),
           "train.batch_size": 2, "train.ckpt_every": 0,
           "mesh.data": 1})
"""


class TestCliOnRealLayout:
    def test_cli_train_and_eval(self, bop_tree, tmp_path):
        """The VERDICT round-1 acceptance: cli --dataset linemod trains 2+
        steps and evals a batch against an on-disk tree, no crash."""
        from pose_estimation_tpu import cli
        root, objs = bop_tree
        cfg_path = tmp_path / "tiny_cfg.py"
        cfg_path.write_text(TINY_CFG)
        log_dir = str(tmp_path / "run")
        rc = cli.main([
            "--config", str(cfg_path), "--dataset", "linemod",
            "--dataset_root", root, "--log_file", log_dir,
            "--debug", "--epochs", "1"])
        assert rc == 0
        train_log = [json.loads(l) for l in
                     open(os.path.join(log_dir, "train.jsonl"))]
        assert any("loss" in r and np.isfinite(r["loss"])
                   for r in train_log)
        eval_log = [json.loads(l) for l in
                    open(os.path.join(log_dir, "eval.jsonl"))]
        assert len(eval_log) >= 1

        rc = cli.main([
            "--config", str(cfg_path), "--dataset", "linemod",
            "--dataset_root", root, "--log_file", log_dir,
            "--eval_mode"])
        assert rc == 0
