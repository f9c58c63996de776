"""Transparent pipeline end-to-end on the synthetic fixture.

Round-1 gap (VERDICT #5, weak #3): transparent tests only fed random
tensors. Here the full path runs on geometrically consistent data:
splat-rendered frames -> BathPoseDataset-style 256-crop glue
(data/transparent_batching.py) -> TRPESNet -> loss / eval, plus a direct
geometric check that the crop's zoomed intrinsics + xmap/ymap + d_scale
backproject the gt depth onto the gt-posed model points.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA:CPU integration compiles

import jax
import jax.numpy as jnp

from pose_estimation_tpu.configs import schema
from pose_estimation_tpu.data.synthetic import SyntheticTransparentDataset
from pose_estimation_tpu.data.transparent_batching import (
    boundary_label, make_transparent_batch, square_bbox)

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tds():
    return SyntheticTransparentDataset(
        num_objects=2, frames_per_object=4, im_h=240, im_w=320,
        num_regions=8)


class TestGlueGeometry:
    def test_square_bbox_contains_mask(self, tds):
        frame = tds[0]
        rmin, rmax, cmin, cmax = square_bbox(frame["mask"])
        assert rmax - rmin == cmax - cmin  # square
        rows, cols = np.nonzero(frame["mask"])
        assert rmin <= rows.min() and rows.max() < rmax
        assert cmin <= cols.min() and cols.max() < cmax

    def test_boundary_is_thin_and_on_mask(self):
        m = np.zeros((16, 16), np.float32)
        m[4:12, 5:11] = 1.0
        b = boundary_label(m)
        assert b.sum() > 0
        assert (b <= m).all()          # boundary subset of mask
        assert b.sum() < m.sum()       # strictly thinner

    def test_backprojection_hits_target_cloud(self, tds):
        """The GeoNet contract: (xmap - cx')*d/fx', (ymap - cy')*d/fy', d
        with d = depth_n * d_scale and zoomed intrinsics must reproduce the
        camera-frame surface — i.e. land on the gt-posed model points."""
        batch = make_transparent_batch(tds, [0, 1], seed=0, img_size=128,
                                       num_model=256)
        fx, fy, cx, cy = [np.asarray(batch["intrinsic"])[:, i]
                          for i in range(4)]
        depth = np.asarray(batch["depth"])[..., 0]
        d_scale = np.asarray(batch["d_scale"])
        xmap = np.asarray(batch["xmap"])
        ymap = np.asarray(batch["ymap"])
        mask = np.asarray(batch["mask"])[..., 0] > 0.5
        target = np.asarray(batch["target"])

        for b in range(2):
            d = depth[b] * d_scale[b]
            valid = mask[b] & (d > 0.1)
            assert valid.sum() > 100
            px = (xmap[b] - cx[b]) * d / fx[b]
            py = (ymap[b] - cy[b]) * d / fy[b]
            cloud = np.stack([px[valid], py[valid], d[valid]], -1)
            # subsample for the N^2 check
            cloud = cloud[:: max(1, len(cloud) // 500)]
            dist = np.linalg.norm(cloud[:, None] - target[b][None], axis=-1)
            nearest = dist.min(-1)
            assert np.median(nearest) < 0.01, float(np.median(nearest))


class TestTransparentTrainerE2E:
    def test_fit_and_eval_on_fixture(self, tds, tmp_path):
        from pose_estimation_tpu.train.transparent_trainer import (
            TransparentTrainer)
        cfg = schema.override(
            schema.transparent_cleargrasp(),
            **{"module.num_cls": 2, "data.num_points": 32,
               "data.input_size": 32, "train.batch_size": 2,
               "train.amp": False, "train.ckpt_every": 0,
               "mesh.data": 1,
               "train.optimizer": schema.OptimizerConfig(type="Adam")})
        trainer = TransparentTrainer(cfg, tds,
                                     log_dir=str(tmp_path / "run"))
        trainer.init_state()
        state = trainer.fit(num_epochs=1, steps_per_epoch=2, eval_every=1)
        assert int(state.step) == 2
        import json, os
        eval_log = [json.loads(l) for l in
                    open(os.path.join(str(tmp_path / "run"), "eval.jsonl"))]
        assert len(eval_log) >= 1
        assert np.isfinite(eval_log[-1]["add_dis"])

class TestSymFlagPropagation:
    def test_sym_objects_reach_frames_and_batch(self):
        # regression: the transparent fixture hardcoded frame["sym"]=0.0,
        # silently disabling the symmetric-chamfer loss branch and ADD-S
        # on the fixture (same class as the r3 KRRN fixture fix)
        ds = SyntheticTransparentDataset(
            num_objects=2, frames_per_object=2, im_h=120, im_w=160,
            num_regions=8, sym_objects=(1,))
        assert ds[0]["sym"] == 0.0
        assert ds[1]["sym"] == 1.0
        batch = make_transparent_batch(ds, [0, 1], seed=0, img_size=64,
                                       num_model=64)
        np.testing.assert_allclose(np.asarray(batch["sym_mask"]), [0.0, 1.0])
