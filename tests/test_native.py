"""Native C++ splat kernel vs the numpy reference renderer."""

import numpy as np
import pytest

from pose_estimation_tpu.data import native
from pose_estimation_tpu.data.synthetic import (
    DEFAULT_K, make_object, render_frame)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_splat_matches_numpy(rng):
    obj = make_object(0, num_regions=8)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    r = q.astype(np.float32)
    t = np.array([0.0, 0.0, 0.8], np.float32)
    k = DEFAULT_K.copy()
    k[0] *= 0.5
    k[1] *= 0.5
    ref = render_frame(obj, r, t, k=k, im_h=240, im_w=320,
                       rng=np.random.RandomState(0))
    regions = (np.argmin(((obj.points[:, None] - obj.fps_centers[None]) ** 2
                          ).sum(-1), -1) + 1).astype(np.int32)
    out = native.splat_frame_native(obj.points, obj.normals, regions, r, t,
                                    k, 240, 320)
    np.testing.assert_array_equal(out["mask"], ref["mask"])
    m = out["mask"]
    np.testing.assert_allclose(out["depth"][m], ref["depth"][m], atol=1e-6)
    np.testing.assert_array_equal(out["region"][m], ref["region"][m])
    np.testing.assert_allclose(out["coordinate"][m], ref["coordinate"][m],
                               atol=1e-6)
