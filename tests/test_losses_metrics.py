"""Golden-value tests for losses and metrics."""

import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.core.geometry.rotations import euler_to_matrix
from pose_estimation_tpu.losses.map_loss import map_loss
from pose_estimation_tpu.losses.pose_loss import (
    add_distance, krrn_loss, pose_loss)
from pose_estimation_tpu.metrics.metric import (
    PerObjectAccumulator, add_auc, add_metric, pose_accuracy)


class TestMapLoss:
    def test_l1_ignores_invalid(self):
        pred = jnp.ones((1, 4, 4, 3))
        tgt = jnp.zeros((1, 4, 4, 3)).at[0, 0, 0].set(2.0)
        # only pixel (0,0) valid; |1-2|*3 = 3
        v = float(map_loss("l1", pred, tgt))
        np.testing.assert_allclose(v, 3.0, atol=1e-5)

    def test_cosine_perfect_alignment(self):
        t = jnp.ones((1, 2, 2, 3))
        assert float(map_loss("cosine", 2 * t, t)) < 1e-5

    def test_ce_correct_class(self):
        logits = jnp.zeros((1, 2, 2, 5)).at[..., 3].set(100.0)
        tgt = jnp.full((1, 2, 2), 3)
        assert float(map_loss("ce", logits, tgt)) < 1e-4

    def test_ce_excludes_label_zero_by_default(self):
        logits = jnp.zeros((1, 2, 2, 5)).at[..., 0].set(-100.0)
        tgt = jnp.zeros((1, 2, 2), jnp.int32)  # all label 0 -> all invalid
        v = float(map_loss("ce", logits, tgt))
        # masked_mean with zero valid pixels returns 0 (guarded count)
        assert v == 0.0


class TestPoseLoss:
    def test_add_identity(self, rng):
        pts = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
        d = add_distance(pts, pts, jnp.zeros(2))
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)

    def test_symmetric_uses_chamfer(self, rng):
        pts = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        perm = np.random.RandomState(1).permutation(32)
        shuffled = pts[:, perm]
        d_sym = add_distance(pts, shuffled, jnp.ones(1))
        d_asym = add_distance(pts, shuffled, jnp.zeros(1))
        assert float(d_sym[0]) < 1e-4    # same point set -> chamfer 0
        assert float(d_asym[0]) > 0.1    # pointwise mismatch

    def test_pose_loss_translation_sensitivity(self, rng):
        mp = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
        r = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        t_gt = jnp.zeros((2, 3))
        target = mp  # identity pose
        l0 = pose_loss(r, t_gt, target, mp, jnp.zeros(2))
        l1 = pose_loss(r, t_gt + 0.1, target, mp, jnp.zeros(2))
        assert float(l0) < 1e-5
        np.testing.assert_allclose(float(l1), 0.1 * np.sqrt(3), atol=1e-3)

    def test_krrn_loss_keys(self, rng):
        b, h, n = 2, 8, 16
        pred = {
            "xyz": jnp.asarray(rng.randn(b, h, h, 3).astype(np.float32)),
            "normal": jnp.asarray(rng.randn(b, h, h, 3).astype(np.float32)),
            "region": jnp.asarray(rng.randn(b, h, h, 9).astype(np.float32)),
            "mask": jnp.asarray(rng.randn(b, h, h, 4).astype(np.float32)),
            "pred_t": jnp.asarray(rng.randn(b, 3).astype(np.float32)),
        }
        gt = {
            "xyz": jnp.asarray(rng.randn(b, h, h, 3).astype(np.float32)),
            "normal": jnp.asarray(rng.randn(b, h, h, 3).astype(np.float32)),
            "region": jnp.asarray(rng.randint(0, 9, (b, h, h))),
            "multi_cls_mask": jnp.asarray(rng.randint(0, 4, (b, h, h))),
            "target": jnp.asarray(rng.randn(b, n, 3).astype(np.float32)),
            "model_points": jnp.asarray(rng.randn(b, n, 3).astype(np.float32)),
            "target_r": jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
            "sym_mask": jnp.zeros(b),
        }
        out = krrn_loss(pred, gt, {
            "weight_xyz": 1, "weight_region": 1, "weight_mask": 1,
            "weight_normal": 1, "weight_pose": 1}, opt_pose=True)
        for k in ("loss", "loss_add", "loss_xyz", "loss_region",
                  "loss_normal", "loss_mask"):
            assert np.isfinite(float(out[k])), k


class TestMetrics:
    def test_add_metric_rotation(self, rng):
        mp = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32)) * 0.05
        eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        rz = euler_to_matrix(jnp.array([[0.0, 0.0, 0.3]]))
        t = jnp.zeros((1, 3))
        d = add_metric(rz, t, eye, t, mp, jnp.zeros(1))
        assert float(d[0]) > 0.005

    def test_pose_accuracy_thresholds(self, rng):
        mp = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32)) * 0.05
        eye = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        t = jnp.zeros((2, 3))
        out = pose_accuracy(eye, t, eye, t, mp, jnp.zeros(2),
                            diameter=jnp.full((2,), 0.1))
        np.testing.assert_array_equal(np.asarray(out["add_ok"]), 1.0)
        np.testing.assert_array_equal(np.asarray(out["deg_cm_ok"]), 1.0)

    def test_auc_perfect_vs_bad(self):
        assert add_auc(np.zeros(100)) > 0.99
        assert add_auc(np.full(100, 1.0)) == 0.0
        mid = add_auc(np.full(100, 0.05))
        assert 0.4 < mid < 0.6

    def test_accumulator(self, rng):
        acc = PerObjectAccumulator(3, ["a", "b", "c"])
        metrics = {"add_dis": np.array([0.01, 0.2]),
                   "add_ok": np.array([1.0, 0.0])}
        acc.update(np.array([0, 1]), metrics)
        acc.update(np.array([0, 0]), {"add_dis": np.array([0.02, 0.03]),
                                      "add_ok": np.array([1.0, 1.0])})
        s = acc.summary()
        assert s["per_object"]["a"]["count"] == 3
        np.testing.assert_allclose(s["per_object"]["a"]["add_ok"], 1.0)
        np.testing.assert_allclose(s["overall"]["add_ok"], 0.75)


class TestCoincidentPointGradSafety:
    """Regression: chamfer/direct distance gradients must stay finite at
    exactly-coincident points. Both branches of the sym `where` are
    computed for every sample; sqrt'(0) = inf in the UNSELECTED branch
    times its zero cotangent = NaN, which poisoned the whole batch
    gradient and wedged the transparent trainer at skipped_nonfinite=1
    (core/mathsafe.py; core/pointops min_dists eps^2 clamp)."""

    def test_add_distance_grad_finite_at_zero_error(self):
        import jax
        pts = jnp.asarray(np.random.RandomState(0).randn(2, 16, 3),
                          jnp.float32)

        def loss(p):
            # pred == target exactly, for both a sym and a non-sym sample
            return jnp.sum(add_distance(p, pts, jnp.array([0.0, 1.0])))

        g = jax.grad(loss)(pts)
        assert np.isfinite(np.asarray(g)).all()

    def test_confidence_pose_loss_grad_finite_at_perfect_pose(self):
        import jax
        from pose_estimation_tpu.losses.transparent_loss import (
            confidence_pose_loss)
        rng = np.random.RandomState(1)
        b, n, m = 2, 4, 32
        model_points = jnp.asarray(rng.randn(b, m, 3) * 0.05, jnp.float32)
        gt_r = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
        t0 = jnp.asarray([[0.0, 0.0, 0.6]] * b, jnp.float32)
        target = model_points + t0[:, None]
        axis = jnp.ones((b, 3), jnp.float32)

        def loss(quat, trans):
            la, _, lr = confidence_pose_loss(
                quat, trans, jnp.full((b, n, 1), 0.5), target,
                model_points, jnp.array([0.0, 1.0]), axis, gt_r,
                allocentric=False)
            return la + lr

        # identity quaternion + exact gt translation at every point
        # hypothesis -> pred coincides with target exactly
        quat = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (b, n, 4))
        trans = jnp.broadcast_to(t0[:, None], (b, n, 3))
        gq, gt_ = jax.grad(loss, argnums=(0, 1))(quat, trans)
        assert np.isfinite(np.asarray(gq)).all()
        assert np.isfinite(np.asarray(gt_)).all()
