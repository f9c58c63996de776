"""Train-time differentiable PnP (cfg.train.refine).

The reference carries BPnP in its Trainer (tools/trainer.py:52,
lib/network/dnn/BPnP.py:8-117) so pose gradients can reach the coordinate
head; here the same capability is `build_refine_loss` (implicit-function-
theorem gradients through the RANSAC+LM solution). These tests assert the
gradient actually flows: solver -> pw -> denormalize -> xyz head params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA:CPU integration compiles

from pose_estimation_tpu.configs import schema
from pose_estimation_tpu.core.geometry.rotations import axis_angle_to_matrix
from pose_estimation_tpu.core.solvers.pnp import pnp_implicit, pnp_ransac
from pose_estimation_tpu.data.batching import make_batch
from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset

TINY_STAGES = (
    (1, 1, (8, 8)),
    (1, 1, (8, 8, 16)),
    (1, 1, (8, 8, 16, 16)),
)


@pytest.fixture(scope="module")
def refine_cfg():
    return schema.override(
        schema.Config(),
        **{"module.num_cls": 2, "data.num_regions": 8,
           "data.num_points": 128, "data.input_size": 64,
           "module.backbone_outc": 16, "train.batch_size": 2,
           "train.amp": False, "train.refine": True,
           "module.hrnet_stages": TINY_STAGES, "module.stem_width": 8,
           "module.xyznet": schema.HeadConfig(hidden=16),
           "module.nmlnet": schema.HeadConfig(hidden=16),
           "module.gcn3d": schema.Gcn3dConfig(neighbor_num=4,
                                              support_num=2)})


class TestImplicitGradientChain:
    def test_grad_reaches_pw_through_solver(self, key):
        """d(pose loss)/d(pw) through stop-grad solve + pnp_implicit is
        nonzero and finite — the exact chain build_refine_loss uses."""
        n = 64
        k_mat = jnp.array([[280.0, 0, 160], [0, 280, 120], [0, 0, 1]])
        kp, kr = jax.random.split(key)
        pw = jax.random.uniform(kp, (n, 3), minval=-0.05, maxval=0.05)
        r_gt = axis_angle_to_matrix(jnp.array([0.3, -0.2, 0.5]))
        t_gt = jnp.array([0.02, -0.01, 0.5])
        pc = pw @ r_gt.T + t_gt
        uv = pc[:, :2] / pc[:, 2:] * jnp.array([280.0, 280.0]) \
            + jnp.array([160.0, 120.0])

        def loss(pw_in):
            sol = pnp_ransac(kr, jax.lax.stop_gradient(pw_in), uv, k_mat,
                             num_hypotheses=8, refine_iters=3)
            w = jax.lax.stop_gradient(
                sol["inliers"].astype(jnp.float32) + 1e-3)
            pose6 = pnp_implicit(jax.lax.stop_gradient(sol["pose6"]),
                                 pw_in, uv, k_mat, w)
            r = axis_angle_to_matrix(pose6[:3])
            pts = pw @ r.T + pose6[3:]
            tgt = pw @ r_gt.T + t_gt
            return jnp.mean(jnp.linalg.norm(pts - tgt, axis=-1))

        # perturb pw so the solved pose is NOT already at the gt optimum
        pw_noisy = pw + 0.002 * jax.random.normal(kp, pw.shape)
        g = jax.grad(loss)(pw_noisy)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 1e-6, "no gradient through the solver"

    def test_train_step_refine_grads_reach_xyz_head(self, refine_cfg):
        """With every loss weight zeroed except weight_refine, one train
        step must still move the XYZHead params — the only path is
        through the PnP solve."""
        from pose_estimation_tpu.models.krrn import KRRN
        from pose_estimation_tpu.parallel.train_step import build_train_step
        from pose_estimation_tpu.train.optim import make_optimizer
        from pose_estimation_tpu.train.state import TrainState

        cfg = schema.override(
            refine_cfg,
            **{"train.loss.weight_xyz": 0.0, "train.loss.weight_region": 0.0,
               "train.loss.weight_mask": 0.0, "train.loss.weight_normal": 0.0,
               "train.loss.weight_pose": 0.0, "train.loss.weight_refine": 1.0})
        ds = SyntheticPoseDataset(num_objects=2, frames_per_object=2,
                                  im_h=240, im_w=320, num_regions=8)
        key = jax.random.PRNGKey(0)
        batch = make_batch(ds, [0, 1], key, cfg.data.input_size,
                           cfg.data.num_points)
        model = KRRN(cfg=cfg)
        variables = model.init({"params": key, "pool": key, "dropout": key},
                               batch["img"], batch["cloud"],
                               batch["choose"], batch["cls"], train=False)
        tx = make_optimizer(cfg)
        state = TrainState.create(variables["params"], tx, key)
        xyz_before = jax.tree.map(np.array, state.params["XYZHead_0"])
        step = build_train_step(model, tx, cfg)
        state, metrics = step(state, batch, opt_pose=True)
        assert np.isfinite(float(metrics["loss_refine"]))
        assert float(metrics["skipped_nonfinite"]) == 0.0
        deltas = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            state.params["XYZHead_0"], xyz_before))
        assert max(deltas) > 0.0, "refine gradient never reached XYZHead"
