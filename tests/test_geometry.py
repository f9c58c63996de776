"""Golden-value tests for core/geometry against closed-form cases and
(where available) cv2 / scipy oracles."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose_estimation_tpu.core import geometry as geo


def _random_rotations(rng, n):
    # Oracle-free random rotations via QR.
    a = rng.randn(n, 3, 3)
    q, r = np.linalg.qr(a)
    det = np.linalg.det(q)
    q[..., :, 0] *= np.sign(det)[..., None]
    return q.astype(np.float32)


class TestRotations:
    def test_quat_matrix_roundtrip(self, rng):
        r = _random_rotations(rng, 64)
        q = geo.matrix_to_quat(jnp.asarray(r))
        r2 = geo.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)

    def test_quat_to_matrix_identity(self):
        np.testing.assert_allclose(
            np.asarray(geo.quat_to_matrix(jnp.array([1.0, 0, 0, 0]))),
            np.eye(3), atol=1e-6)

    def test_axis_angle_vs_cv2_rodrigues(self, rng):
        for _ in range(8):
            v = rng.randn(3).astype(np.float32)
            r_cv, _ = cv2.Rodrigues(v.astype(np.float64))
            r_j = np.asarray(geo.axis_angle_to_matrix(jnp.asarray(v)))
            np.testing.assert_allclose(r_j, r_cv, atol=1e-5)

    def test_axis_angle_roundtrip(self, rng):
        v = rng.randn(32, 3).astype(np.float32)
        r = geo.axis_angle_to_matrix(jnp.asarray(v))
        v2 = geo.matrix_to_axis_angle(r)
        np.testing.assert_allclose(np.asarray(v2), v, atol=1e-4)

    def test_axis_angle_zero_grad_finite(self):
        g = jax.grad(lambda v: geo.axis_angle_to_matrix(v).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_ortho6d(self, rng):
        r = _random_rotations(rng, 16)
        six = geo.matrix_to_ortho6d(jnp.asarray(r))
        r2 = geo.ortho6d_to_matrix(six)
        np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)

    def test_euler_xyz(self):
        r = geo.euler_to_matrix(jnp.array([np.pi / 2, 0.0, 0.0]), "xyz")
        expect = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
        np.testing.assert_allclose(np.asarray(r), expect, atol=1e-6)

    def test_angular_distance(self, rng):
        r = _random_rotations(rng, 8)
        d = geo.angular_distance(jnp.asarray(r), jnp.asarray(r))
        assert np.all(np.asarray(d) < 0.15)  # clamped acos -> small not exact 0
        rz = geo.euler_to_matrix(jnp.array([0.0, 0.0, np.pi / 2]), "xyz")
        d90 = geo.angular_distance(jnp.eye(3), rz)
        np.testing.assert_allclose(float(d90), 90.0, atol=0.1)

    def test_random_rotation_is_orthonormal(self, key):
        r_j = geo.random_rotation(key, (16,))
        r = np.asarray(r_j)
        eye = r @ np.swapaxes(r, -1, -2)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)


class TestIntrinsics:
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)

    def test_vec_roundtrip(self):
        v = geo.intrinsic_matrix_to_vec(jnp.asarray(self.K))
        k2 = geo.intrinsic_vec_to_matrix(v)
        np.testing.assert_allclose(np.asarray(k2), self.K, atol=1e-6)

    def test_project_backproject_roundtrip(self, rng):
        pts = rng.rand(4, 100, 3).astype(np.float32)
        pts[..., 2] += 0.5
        uv = geo.project_points(jnp.asarray(pts), jnp.asarray(self.K))
        uvd = jnp.concatenate([uv, jnp.asarray(pts[..., 2:])], -1)
        back = geo.uvd_to_cloud(uvd, jnp.asarray(self.K))
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)

    def test_depth_map_to_cloud(self):
        depth = jnp.ones((8, 8)) * 2.0
        cloud = geo.depth_map_to_cloud(depth, jnp.asarray(self.K))
        assert cloud.shape == (8, 8, 3)
        # pixel (u=cx? no) — check center formula at u=0,v=0
        np.testing.assert_allclose(
            float(cloud[0, 0, 0]), (0 - 325.3) * 2.0 / 572.4, rtol=1e-5)

    def test_project_vs_cv2(self, rng):
        pts = rng.rand(50, 3).astype(np.float64) + [0, 0, 1.0]
        uv_cv, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3),
                                     self.K.astype(np.float64), None)
        uv_j = np.asarray(geo.project_points(
            jnp.asarray(pts, jnp.float32), jnp.asarray(self.K)))
        np.testing.assert_allclose(uv_j, uv_cv[:, 0], atol=1e-2)


class TestAllocentric:
    def test_identity_on_axis(self, rng):
        # Object on the optical axis: allo == ego.
        r = jnp.asarray(_random_rotations(rng, 4))
        t = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))
        r_ego = geo.allo_to_ego_matrix(t, r)
        np.testing.assert_allclose(np.asarray(r_ego), np.asarray(r), atol=1e-3)

    def test_roundtrip(self, rng):
        r = jnp.asarray(_random_rotations(rng, 16))
        t = jnp.asarray(rng.randn(16, 3).astype(np.float32) + [0, 0, 3.0])
        r_ego = geo.allo_to_ego_matrix(t, r)
        r_back = geo.ego_to_allo_matrix(t, r_ego)
        np.testing.assert_allclose(np.asarray(r_back), np.asarray(r), atol=1e-3)

    def test_grad_finite_near_axis_bf16(self, rng):
        """Regression: bf16 translations near the optical axis rounded
        obj_ray_z to exactly 1.0, making the arccos gradient inf and
        poisoning every upstream gradient of the transparent pose loss
        (finite loss, NaN grads — the in-step loss guard missed it)."""
        r = jnp.asarray(_random_rotations(rng, 4), jnp.bfloat16)
        # exactly on-axis + nearly-on-axis, in bf16
        t = jnp.asarray([[0.0, 0.0, 0.5], [1e-4, 0.0, 0.3],
                         [0.0, -1e-4, 1.0], [1e-3, 1e-3, 0.7]], jnp.bfloat16)

        def f(tt):
            return jnp.sum(geo.allo_to_ego_matrix(tt, r).astype(jnp.float32))

        g = jax.grad(f)(t)
        assert np.all(np.isfinite(np.asarray(g, np.float32)))


class TestWarp:
    def test_crop_resize_vs_cv2(self, rng):
        img = (rng.rand(64, 80, 3) * 255).astype(np.float32)
        center, scale, out = (40.0, 32.0), 48.0, 32

        # cv2 oracle via the same CenterNet construction
        src = np.zeros((3, 2), np.float32)
        dst = np.zeros((3, 2), np.float32)
        src[0] = center
        src[1] = np.array(center) + [0, -scale / 2]
        dst[0] = [out / 2, out / 2]
        dst[1] = [out / 2, 0]
        def third(a, b):
            d = a - b
            return b + np.array([-d[1], d[0]], np.float32)
        src[2] = third(src[0], src[1])
        dst[2] = third(dst[0], dst[1])
        m = cv2.getAffineTransform(src, dst)
        ref = cv2.warpAffine(img, m, (out, out), flags=cv2.INTER_LINEAR)

        got = np.asarray(geo.crop_resize(jnp.asarray(img),
                                         jnp.asarray(center), scale, out))
        # interiors must match closely; borders may differ by interpolation
        np.testing.assert_allclose(got[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1.0)

    def test_bilinear_out_of_bounds_fill(self):
        img = jnp.ones((4, 4))
        v = geo.bilinear_sample(img, jnp.array([[-10.0, -10.0], [1.5, 1.5]]))
        np.testing.assert_allclose(np.asarray(v), [0.0, 1.0], atol=1e-6)


class TestUmeyama:
    def test_kabsch_exact(self, rng, key):
        r_gt = jnp.asarray(_random_rotations(rng, 8))
        t_gt = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        src = jnp.asarray(rng.randn(8, 100, 3).astype(np.float32))
        dst = geo.transform_points(src, r_gt, t_gt)
        r, t, s = geo.kabsch(src, dst)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_gt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)

    def test_kabsch_with_scale(self, rng):
        r_gt_np = _random_rotations(rng, 4)
        src_np = rng.randn(4, 50, 3).astype(np.float32)
        dst_np = 2.5 * np.einsum("bij,bnj->bni", r_gt_np, src_np) + 0.3
        src, dst = jnp.asarray(src_np), jnp.asarray(dst_np)
        r, t, s = geo.kabsch(src, dst, with_scale=True)
        np.testing.assert_allclose(np.asarray(s), 2.5, atol=1e-3)

    def test_kabsch_grad_finite(self, rng):
        src = jnp.asarray(rng.randn(32, 3).astype(np.float32))
        dst = src + 0.01 * jnp.asarray(rng.randn(32, 3).astype(np.float32))

        def f(d):
            r, t, s = geo.kabsch(src, d)
            return (r.sum() + t.sum())

        g = jax.grad(f)(dst)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_ransac_with_outliers(self, rng, key):
        r_gt = jnp.asarray(_random_rotations(rng, 1))[0]
        src = jnp.asarray(rng.randn(200, 3).astype(np.float32))
        dst = src @ r_gt.T + jnp.array([0.1, -0.2, 0.05])
        dst = dst.at[:40].add(jnp.asarray(rng.randn(40, 3).astype(np.float32)))
        r, t, s, inl = geo.umeyama_ransac(key, src, dst, inlier_thresh=0.02,
                                          with_scale=False)
        assert int(inl.sum()) > 120
        np.testing.assert_allclose(
            float(geo.angular_distance(r, r_gt)), 0.0, atol=1.5)


class TestQuatNormalizeGradSafety:
    def test_zero_quat_has_finite_grad(self):
        """grad of quat_normalize-dependent losses must be finite at
        q == 0 exactly (regression heads can underflow to zero; the old
        maximum(norm, eps) form produced NaN via the unselected branch)."""
        import jax
        import jax.numpy as jnp
        from pose_estimation_tpu.core.geometry.rotations import (
            quat_to_matrix)

        def loss(q):
            return jnp.sum(quat_to_matrix(q) ** 2)

        g0 = jax.grad(loss)(jnp.zeros(4))
        assert np.isfinite(np.asarray(g0)).all(), g0
        gt = jax.grad(loss)(jnp.array([1e-30, 0.0, 0.0, 0.0]))
        assert np.isfinite(np.asarray(gt)).all(), gt
