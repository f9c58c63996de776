"""Serving-path tests: build_infer_step + tools/infer.py.

The deployment claim is that the compiled inference program reads NO
ground-truth field — the strongest check is structural: delete every gt
key from the batch and the program must still trace and run (a single
read of any deleted key raises KeyError at trace time).
"""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # tiny-KRRN XLA:CPU compiles

from pose_estimation_tpu.configs import schema
from pose_estimation_tpu.data.batching import make_batch
from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset
from pose_estimation_tpu.models.krrn import KRRN
from pose_estimation_tpu.parallel.train_step import build_infer_step

TINY_STAGES = (
    (1, 1, (8, 8)),
    (1, 1, (8, 8, 16)),
    (1, 1, (8, 8, 16, 16)),
)

TINY = {
    "module.num_cls": 2, "data.num_regions": 8,
    "data.num_points": 128, "data.input_size": 64,
    "module.backbone_outc": 16, "train.batch_size": 2,
    "train.amp": False,
    "module.hrnet_stages": TINY_STAGES, "module.stem_width": 8,
    "module.xyznet": schema.HeadConfig(hidden=16),
    "module.nmlnet": schema.HeadConfig(hidden=16),
    "module.gcn3d": schema.Gcn3dConfig(neighbor_num=4, support_num=2),
    # few hypotheses/points: the solver program is the real one, small
    "eval.num_pnp_points": 32, "eval.pnp_hypotheses": 8,
    "eval.refine_top_k": 2,
}

GT_KEYS = ("target", "target_r", "target_t", "model_points", "sym_mask",
           "diameter", "multi_cls_mask", "xyz", "normal", "region",
           "valid")


@pytest.fixture(scope="module")
def tiny_cfg():
    return schema.override(schema.Config(), **TINY)


@pytest.fixture(scope="module")
def dataset():
    return SyntheticPoseDataset(num_objects=2, frames_per_object=4,
                                im_h=240, im_w=320, num_regions=8)


class TestInferStep:
    def test_runs_without_any_gt_field(self, dataset, tiny_cfg, key):
        batch = make_batch(dataset, [0, 1], key, crop_size=64,
                           num_points=128)
        stripped = {k: v for k, v in batch.items() if k not in GT_KEYS}
        assert set(GT_KEYS) & set(batch) and not set(GT_KEYS) & set(stripped)

        model = KRRN(cfg=tiny_cfg)
        variables = model.init({"params": key}, batch["img"],
                               batch["cloud"], batch["choose"],
                               batch["cls"], train=False)
        infer_step = build_infer_step(model, tiny_cfg)
        out = infer_step(variables["params"], stripped, key)

        assert out["pred_r"].shape == (2, 3, 3)
        assert out["pred_t"].shape == (2, 3)
        r = np.asarray(out["pred_r"], np.float64)
        np.testing.assert_allclose(r @ r.transpose(0, 2, 1),
                                   np.eye(3)[None].repeat(2, 0), atol=1e-3)
        for k_ in ("pred_t", "pnp_t", "mean_err"):
            assert np.isfinite(np.asarray(out[k_])).all(), k_
        assert (np.asarray(out["num_inliers"]) >= 0).all()

    def test_region_decode_variant_is_also_gt_free(self, dataset, tiny_cfg,
                                                   key):
        cfg = schema.override(tiny_cfg,
                              **{"module.xyz_offset_decode": True})
        batch = make_batch(dataset, [0, 1], key, crop_size=64,
                           num_points=128)
        # region_points is object metadata (FPS centers), not gt pose
        stripped = {k: v for k, v in batch.items() if k not in GT_KEYS}
        model = KRRN(cfg=cfg)
        variables = model.init({"params": key}, batch["img"],
                               batch["cloud"], batch["choose"],
                               batch["cls"], train=False)
        out = build_infer_step(model, cfg)(variables["params"], stripped,
                                           key)
        assert np.isfinite(np.asarray(out["pred_r"])).all()


class TestInferCLI:
    def test_jsonl_output(self, tmp_path, capsys):
        cfg_py = tmp_path / "tiny_config.py"
        cfg_py.write_text(
            "from pose_estimation_tpu.configs import schema\n"
            "TINY = {\n"
            "    'module.num_cls': 2, 'data.num_regions': 8,\n"
            "    'data.num_points': 128, 'data.input_size': 64,\n"
            "    'module.backbone_outc': 16, 'train.batch_size': 2,\n"
            "    'train.amp': False,\n"
            "    'module.hrnet_stages': ((1, 1, (8, 8)),\n"
            "                            (1, 1, (8, 8, 16)),\n"
            "                            (1, 1, (8, 8, 16, 16))),\n"
            "    'module.stem_width': 8,\n"
            "    'module.xyznet': schema.HeadConfig(hidden=16),\n"
            "    'module.nmlnet': schema.HeadConfig(hidden=16),\n"
            "    'module.gcn3d': schema.Gcn3dConfig(neighbor_num=4,\n"
            "                                       support_num=2),\n"
            "    'eval.num_pnp_points': 32, 'eval.pnp_hypotheses': 8,\n"
            "    'eval.refine_top_k': 2,\n"
            "}\n"
            "def get_config():\n"
            "    return schema.override(schema.Config(), **TINY)\n")
        out_path = str(tmp_path / "poses.jsonl")
        from pose_estimation_tpu.tools.infer import main
        main(["--config", str(cfg_py), "--synthetic",
              "--frames_per_object", "3", "--batch_size", "2",
              "--output", out_path, "--max_batches", "2"])
        summary = json.loads(capsys.readouterr().out)
        assert summary["frames"] == 4
        assert os.path.isfile(out_path)
        recs = [json.loads(line) for line in open(out_path)]
        assert len(recs) == 4
        seen = {r["index"] for r in recs}
        assert seen == {0, 1, 2, 3}  # dataset order, no dupes, no padding
        for r in recs:
            assert len(r["r"]) == 3 and len(r["r"][0]) == 3
            assert len(r["t"]) == 3
            assert np.isfinite(r["reproj_mse_px"])
