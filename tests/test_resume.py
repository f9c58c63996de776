"""Kill-and-resume: training resumes from the periodic checkpoint with the
right step and identical parameters (VERDICT r1 #8 acceptance).

Simulates a killed run by constructing a FRESH Trainer over the same
log_dir (new model object, new optimizer, new state) and restoring —
the reference's resume flow is train.py:138-154 (checkpoint filename
parse) + tools/trainer.py:137-138 (checkpoint-every-2000).
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA:CPU integration compiles

from pose_estimation_tpu.configs import schema
from pose_estimation_tpu.data.batching import make_batch
from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset

TINY_STAGES = (
    (1, 1, (8, 8)),
    (1, 1, (8, 8, 16)),
    (1, 1, (8, 8, 16, 16)),
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return schema.override(
        schema.Config(),
        **{"module.num_cls": 2, "data.num_regions": 8,
           "data.num_points": 128, "data.input_size": 64,
           "module.backbone_outc": 16, "train.batch_size": 2,
           "train.amp": False, "train.ckpt_every": 2,
           "train.start_pose_epoch": 0,
           "module.hrnet_stages": TINY_STAGES, "module.stem_width": 8,
           "module.xyznet": schema.HeadConfig(hidden=16),
           "module.nmlnet": schema.HeadConfig(hidden=16),
           "module.gcn3d": schema.Gcn3dConfig(neighbor_num=4,
                                              support_num=2)})


@pytest.fixture(scope="module")
def dataset():
    return SyntheticPoseDataset(num_objects=2, frames_per_object=4,
                                im_h=240, im_w=320, num_regions=8)


class TestKillAndResume:
    def test_resume_continues_from_periodic_ckpt(self, tiny_cfg, dataset,
                                                 tmp_path):
        from pose_estimation_tpu.train.trainer import Trainer
        log_dir = str(tmp_path / "run")

        tr = Trainer(tiny_cfg, dataset, log_dir=log_dir)
        tr.init_state()
        tr.train_epoch(0, steps=4)       # ckpt_every=2 -> periodic saves
        killed_step = int(tr.state.step)
        assert killed_step == 4
        killed_params = jax.tree.map(np.asarray, tr.state.params)
        del tr  # "kill" the process

        tr2 = Trainer(tiny_cfg, dataset, log_dir=log_dir)
        tr2.init_state()                 # restores from log_dir/ckpt
        assert int(tr2.state.step) == killed_step
        restored = jax.tree.map(np.asarray, tr2.state.params)
        jax.tree.map(np.testing.assert_array_equal, killed_params, restored)

        # training continues: next step advances and produces finite loss
        key = jax.random.PRNGKey(3)
        batch = make_batch(dataset, [0, 1], key,
                           tiny_cfg.data.input_size,
                           tiny_cfg.data.num_points)
        tr2.state, m = tr2.train_step(tr2.state, batch, opt_pose=True)
        assert int(tr2.state.step) == killed_step + 1
        assert np.isfinite(float(m["loss"]))

    def test_explicit_resume_dir(self, tiny_cfg, dataset, tmp_path):
        """CLI --resume: restore from a DIFFERENT directory than log_dir
        (cli.py resume wiring; reference train.py:138-154)."""
        from pose_estimation_tpu.train.trainer import Trainer
        src_dir = str(tmp_path / "src")
        tr = Trainer(tiny_cfg, dataset, log_dir=src_dir)
        tr.init_state()
        tr.train_epoch(0, steps=2)
        saved_step = int(tr.state.step)
        del tr

        dst_dir = str(tmp_path / "dst")
        tr2 = Trainer(tiny_cfg, dataset, log_dir=dst_dir,
                      resume=src_dir + "/ckpt")
        tr2.init_state()
        assert int(tr2.state.step) == saved_step
