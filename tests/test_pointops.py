"""Tests for core/pointops and the Pallas kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.core import pointops as po
from pose_estimation_tpu.ops import pallas_pointops as pp


def _np_knn(pts, k, exclude_self=True):
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    if exclude_self:
        np.fill_diagonal(d, np.inf)
    return np.argsort(d, axis=-1, kind="stable")[:, :k]


class TestXLA:
    def test_pairwise_sqdist(self, rng):
        a = rng.randn(2, 16, 3).astype(np.float32)
        b = rng.randn(2, 24, 3).astype(np.float32)
        d = np.asarray(po.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
        ref = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, ref, atol=1e-4)

    def test_knn_matches_numpy(self, rng):
        pts = rng.randn(2, 64, 3).astype(np.float32)
        idx = np.asarray(po.knn_indices(jnp.asarray(pts), 5))
        for b in range(2):
            ref = _np_knn(pts[b], 5)
            # sets equal per row (ties may reorder)
            for i in range(64):
                assert set(idx[b, i]) == set(ref[i]), (b, i)

    def test_knn_excludes_self(self, rng):
        pts = rng.randn(1, 32, 3).astype(np.float32)
        idx = np.asarray(po.knn_indices(jnp.asarray(pts), 4))
        rows = np.arange(32)[:, None]
        assert not np.any(idx[0] == rows)

    def test_nearest_index(self, rng):
        t = rng.randn(1, 20, 3).astype(np.float32)
        s = rng.randn(1, 30, 3).astype(np.float32)
        idx = np.asarray(po.nearest_index(jnp.asarray(t), jnp.asarray(s)))
        d = ((t[0][:, None] - s[0][None]) ** 2).sum(-1)
        np.testing.assert_array_equal(idx[0], d.argmin(-1))

    def test_min_dists(self, rng):
        t = rng.randn(1, 20, 3).astype(np.float32)
        s = rng.randn(1, 30, 3).astype(np.float32)
        md = np.asarray(po.min_dists(jnp.asarray(t), jnp.asarray(s)))
        d = np.sqrt(((t[0][:, None] - s[0][None]) ** 2).sum(-1).min(-1))
        np.testing.assert_allclose(md[0], d, atol=1e-4)

    def test_gather_neighbors(self, rng):
        f = rng.randn(2, 10, 7).astype(np.float32)
        idx = rng.randint(0, 10, (2, 10, 3))
        out = np.asarray(po.gather_neighbors(jnp.asarray(f), jnp.asarray(idx)))
        for b in range(2):
            for i in range(10):
                np.testing.assert_array_equal(out[b, i], f[b, idx[b, i]])

    def test_neighbor_directions_unit(self, rng):
        pts = rng.randn(1, 32, 3).astype(np.float32)
        idx = po.knn_indices(jnp.asarray(pts), 4)
        dirs = np.asarray(po.neighbor_directions(jnp.asarray(pts), idx))
        norms = np.linalg.norm(dirs, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_fps_spread(self, rng):
        # FPS of the 8 cube corners + jitter cluster must pick all corners.
        corners = np.array([[i, j, k] for i in (0, 5) for j in (0, 5)
                            for k in (0, 5)], np.float32)
        cluster = rng.randn(56, 3).astype(np.float32) * 0.01 + 2.5
        pts = np.concatenate([corners, cluster])[None]
        idx = np.asarray(po.farthest_point_sampling(jnp.asarray(pts), 9))[0]
        picked = set(idx.tolist())
        assert len(picked & set(range(8))) == 8

    def test_random_pool_shapes(self, key, rng):
        v = jnp.asarray(rng.randn(2, 64, 9).astype(np.float32))
        f = jnp.asarray(rng.randn(2, 64, 32).astype(np.float32))
        vp, fp = po.random_subsample_pool(key, v, f, 16)
        assert vp.shape == (2, 16, 9) and fp.shape == (2, 16, 32)


class TestPallas:
    """Pallas kernels in interpreter mode (CPU CI); compiled path on TPU."""

    def test_min_dists_kernel(self, rng):
        t = rng.randn(2, 300, 3).astype(np.float32)
        s = rng.randn(2, 700, 3).astype(np.float32)
        got = np.asarray(pp._min_dists_pallas(
            jnp.asarray(t), jnp.asarray(s), interpret=True))
        ref = np.asarray(po.min_dists(jnp.asarray(t), jnp.asarray(s)))
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_knn_kernel(self, rng):
        pts = rng.randn(1, 600, 3).astype(np.float32)
        got = np.asarray(pp._knn_pallas(jnp.asarray(pts), 8, interpret=True))
        ref = np.asarray(po.knn_indices(jnp.asarray(pts), 8))
        # compare distance values (ties can permute indices)
        p = pts[0]
        d_got = np.sort(((p[got[0]] - p[:, None]) ** 2).sum(-1), -1)
        d_ref = np.sort(((p[ref[0]] - p[:, None]) ** 2).sum(-1), -1)
        np.testing.assert_allclose(d_got, d_ref, atol=1e-3)

    def test_dispatch_small_uses_xla(self, rng):
        pts = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
        idx = pp.knn_indices(pts, 4)
        assert idx.shape == (1, 128, 4)
