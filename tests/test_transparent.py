"""Transparent-pipeline tests: TRPESNet shapes, losses, UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_tpu.losses.transparent_loss import (
    confidence_pose_loss, focal_loss, transparent_loss)
from pose_estimation_tpu.models.transparent import (
    DenseFusion, GeometryNet, PosePredHead, TRPESNet)
from pose_estimation_tpu.models.unet import UNet


class TestUNet:
    def test_three_heads(self, key):
        m = UNet()
        x = jnp.zeros((1, 64, 64, 3))
        params = m.init(key, x)
        c, n, d = m.apply(params, x)
        assert c.shape == (1, 64, 64, 64)
        assert n.shape == (1, 64, 64, 64)
        assert d.shape == (1, 64, 64, 64)
        # normalized features are unit OR exactly zero (all-ReLU'd-away
        # pixels stay zero, F.normalize semantics)
        norms = np.linalg.norm(np.asarray(n), axis=-1)
        assert np.all((np.abs(norms - 1.0) < 1e-3) | (norms < 1e-6))


class TestHeads:
    def test_geometry_net(self, key, rng):
        feat = jnp.asarray(rng.randn(2, 16, 16, 192).astype(np.float32))
        intr = jnp.tile(jnp.asarray([[300.0, 300.0, 8.0, 8.0]]), (2, 1))
        xm = jnp.tile(jnp.arange(16.0)[None, None, :], (2, 16, 1))
        ym = jnp.tile(jnp.arange(16.0)[None, :, None], (2, 1, 16))
        ds = jnp.ones((2,))
        m = GeometryNet(8)
        params = m.init(key, feat, intr, xm, ym, ds)
        g = m.apply(params, feat, intr, xm, ym, ds)
        assert g.shape == (2, 16, 16, 8, 3)

    def test_densefusion_1792(self, key, rng):
        geom = jnp.asarray(rng.randn(2, 100, 8, 3).astype(np.float32))
        color = jnp.asarray(rng.randn(2, 100, 64).astype(np.float32))
        m = DenseFusion()
        params = m.init(key, geom, color)
        out = m.apply(params, geom, color)
        assert out.shape == (2, 100, 1792)

    @pytest.mark.parametrize("use_transformer", [False, True])
    def test_posepred(self, key, rng, use_transformer):
        apx = jnp.asarray(rng.randn(2, 50, 1792).astype(np.float32))
        obj = jnp.asarray([0, 2])
        m = PosePredHead(num_obj=5, use_transformer=use_transformer)
        params = m.init(key, apx, obj)
        r, t, c = m.apply(params, apx, obj)
        assert r.shape == (2, 50, 4)
        assert t.shape == (2, 50, 3)
        assert c.shape == (2, 50, 1)
        assert np.asarray(c).min() >= 0 and np.asarray(c).max() <= 1

    def test_posepred_equalized(self, key, rng):
        """Equalized-LR dense stack (equalized.py:45-100; vendored behind a
        commented import in the reference, TRPES.py:16-17): same shapes,
        and the runtime he_std scaling keeps activations ~unit-scale from
        the N(0,1) init."""
        apx = jnp.asarray(rng.randn(2, 50, 1792).astype(np.float32))
        obj = jnp.asarray([0, 2])
        m = PosePredHead(num_obj=5, use_equalized=True)
        params = m.init(key, apx, obj)
        r, t, c = m.apply(params, apx, obj)
        assert r.shape == (2, 50, 4)
        assert np.isfinite(np.asarray(r)).all()
        # unit-scale property: pre-sigmoid outputs not exploded
        assert np.abs(np.asarray(t)).mean() < 50.0


class TestTRPESNet:
    def test_forward(self, key, rng):
        b, h = 1, 32
        m = TRPESNet(num_points=64, num_obj=3)
        img = jnp.asarray(rng.rand(b, h, h, 3).astype(np.float32))
        intr = jnp.tile(jnp.asarray([[300.0, 300.0, 16.0, 16.0]]), (b, 1))
        xm = jnp.tile(jnp.arange(float(h))[None, None, :], (b, h, 1))
        ym = jnp.tile(jnp.arange(float(h))[None, :, None], (b, 1, h))
        ds = jnp.ones((b,))
        obj = jnp.asarray([1])
        params = m.init(key, img, intr, xm, ym, ds, obj)
        r, t, c, n, d, mask = m.apply(params, img, intr, xm, ym, ds, obj)
        assert r.shape == (b, 64, 4)
        assert t.shape == (b, 64, 3)
        assert c.shape == (b, 64, 1)
        assert n.shape == (b, h, h, 3)
        assert d.shape == (b, h, h, 1)
        assert mask.shape == (b, h, h, 1)
        assert np.asarray(d).min() >= 0  # relu'd depth
        assert 0 <= np.asarray(mask).min() and np.asarray(mask).max() <= 1


class TestLosses:
    def test_focal_equals_ce_at_gamma0(self, rng):
        logits = jnp.asarray(rng.randn(64, 5).astype(np.float32))
        tgt = jnp.asarray(rng.randint(0, 5, 64))
        fl = focal_loss(logits, tgt, gamma=0.0)
        logp = jax.nn.log_softmax(logits, -1)
        ce = -jnp.mean(jnp.take_along_axis(logp, tgt[:, None], 1))
        np.testing.assert_allclose(float(fl), float(ce), rtol=1e-5)

    def test_confidence_pose_loss_perfect(self, rng):
        """GT quaternions/translations with high confidence -> tiny ADD."""
        b, n, mpts = 2, 8, 32
        model_points = jnp.asarray(
            rng.randn(b, mpts, 3).astype(np.float32) * 0.05)
        # identity pose, on-axis translation (allo==ego on optical axis)
        t_gt = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (b, 1))
        target = model_points + t_gt[:, None]
        quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (b, n, 1))
        trans = jnp.tile(t_gt[:, None], (1, n, 1))
        conf = jnp.full((b, n, 1), 0.99)
        gt_r = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
        loss, best_dis, loss_rot = confidence_pose_loss(
            quat, trans, conf, target, model_points,
            sym_mask=jnp.zeros(b), axis=jnp.zeros((b, 3)), gt_r=gt_r)
        assert float(jnp.mean(best_dis)) < 1e-3
        assert float(loss) < 0.01

    def test_transparent_loss_finite(self, rng):
        b, n, mpts, h = 2, 8, 16, 16
        pred = {
            "quat": jnp.asarray(rng.randn(b, n, 4).astype(np.float32)),
            "trans": jnp.asarray(
                rng.rand(b, n, 3).astype(np.float32) + [0, 0, 0.5]),
            "conf": jnp.full((b, n, 1), 0.5),
            "normal": jnp.asarray(rng.randn(b, h, h, 3).astype(np.float32)),
            "depth": jnp.asarray(rng.rand(b, h, h, 1).astype(np.float32)),
            "mask": jnp.asarray(rng.rand(b, h, h, 1).astype(np.float32)),
        }
        gt = {
            "target": jnp.asarray(rng.randn(b, mpts, 3).astype(np.float32)),
            "model_points": jnp.asarray(
                rng.randn(b, mpts, 3).astype(np.float32)),
            "sym_mask": jnp.asarray([1.0, 0.0]),
            "axis": jnp.asarray([[0, 0, 1.0], [0, 0, 0]]),
            "r": jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
            "normal": jnp.asarray(rng.randn(b, h, h, 3).astype(np.float32)),
            "depth": jnp.asarray(rng.rand(b, h, h, 1).astype(np.float32)),
            "mask": jnp.asarray(rng.rand(b, h, h, 1).astype(np.float32)),
        }
        w = {"distance": 1.0, "normal": 1.0, "depth": 1.0, "mask": 1.0,
             "rotation": 1.0, "boundary": 1.0}
        out = transparent_loss(pred, gt, w)
        for k, v in out.items():
            assert np.isfinite(float(v)), k
