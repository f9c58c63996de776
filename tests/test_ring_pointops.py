"""Ring-sharded chamfer/KNN vs single-device reference on the 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.core import pointops as po
from pose_estimation_tpu.parallel.mesh import make_mesh
from pose_estimation_tpu.parallel.ring_pointops import ring_knn, ring_min_dists


def test_ring_min_dists_matches_local(rng):
    mesh = make_mesh()
    d = mesh.shape["data"]
    n, m = d * 16, d * 24
    tgt = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    src = jnp.asarray(rng.randn(m, 3).astype(np.float32))
    fn = ring_min_dists(mesh)
    with mesh:
        got = np.asarray(fn(tgt, src))
    ref = np.asarray(po.min_dists(tgt[None], src[None])[0])
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_ring_knn_matches_local(rng):
    mesh = make_mesh()
    d = mesh.shape["data"]
    n, k = d * 16, 4
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    fn = ring_knn(mesh, k)
    with mesh:
        dists, idx = fn(pts)
    ref_idx = np.asarray(po.knn_indices(pts[None], k)[0])
    p = np.asarray(pts)
    d_got = np.sort(((p[np.asarray(idx)] - p[:, None]) ** 2).sum(-1), -1)
    d_ref = np.sort(((p[ref_idx] - p[:, None]) ** 2).sum(-1), -1)
    np.testing.assert_allclose(d_got, d_ref, atol=1e-4)
    # no self-matches
    assert not np.any(np.asarray(idx) == np.arange(n)[:, None])
