"""PnP parity harness vs OpenCV (SURVEY 7.3.1).

The reference's rotation recovery is cv2.solvePnPRansac(SOLVEPNP_EPNP,
confidence=0.9999, reprojectionError=1) on CPU (tools/trainer.py:423-427).
These tests check that the on-device solvers (core/solvers) recover poses
at least as accurately as OpenCV on the same synthetic correspondences —
clean and noisy/outlier-contaminated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose_estimation_tpu.core.solvers.epnp import epnp
from pose_estimation_tpu.core.solvers.pnp import pnp_ransac

cv2 = pytest.importorskip("cv2")

K = np.array([[572.4114, 0.0, 325.2611],
              [0.0, 573.57043, 242.04899],
              [0.0, 0.0, 1.0]], np.float32)


def _scene(rng, n=256, noise_px=0.0, outlier_frac=0.0):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    r = q.astype(np.float32)
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                  rng.uniform(0.5, 1.0)], np.float32)
    pw = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.1
    pc = pw @ r.T + t
    uv = pc[:, :2] / pc[:, 2:3] * np.diag(K)[:2] + K[:2, 2]
    uv = uv + rng.randn(n, 2).astype(np.float32) * noise_px
    n_out = int(n * outlier_frac)
    if n_out:
        sel = rng.choice(n, n_out, replace=False)
        uv[sel] = rng.rand(n_out, 2) * [640, 480]
    return pw, uv.astype(np.float32), r, t


def _rot_err_deg(r_pred, r_gt):
    cos = (np.trace(r_pred @ r_gt.T) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def _cv2_ransac(pw, uv):
    ok, rvec, tvec, _ = cv2.solvePnPRansac(
        objectPoints=pw.astype(np.float64),
        imagePoints=uv.astype(np.float64),
        cameraMatrix=K.astype(np.float64), distCoeffs=None,
        flags=cv2.SOLVEPNP_EPNP, confidence=0.9999, reprojectionError=2.0)
    r = cv2.Rodrigues(rvec)[0]
    return r, tvec.reshape(3)


class TestCleanCorrespondences:
    def test_epnp_matches_or_beats_opencv(self):
        rng = np.random.RandomState(0)
        for trial in range(5):
            pw, uv, r_gt, t_gt = _scene(rng, n=64, noise_px=0.0)
            r_j, t_j = epnp(jnp.asarray(pw), jnp.asarray(uv),
                            jnp.asarray(K))
            ok, rvec, tvec = cv2.solvePnP(
                pw.astype(np.float64), uv.astype(np.float64),
                K.astype(np.float64), None, flags=cv2.SOLVEPNP_EPNP)
            r_cv = cv2.Rodrigues(rvec)[0]
            err_j = _rot_err_deg(np.asarray(r_j), r_gt)
            err_cv = _rot_err_deg(r_cv, r_gt)
            assert err_j < max(2.0 * err_cv, 0.5), (trial, err_j, err_cv)
            assert np.linalg.norm(np.asarray(t_j) - t_gt) < 0.01


class TestRansacUnderOutliers:
    def test_ransac_parity_with_noise_and_outliers(self, key):
        rng = np.random.RandomState(1)
        errs_j, errs_cv = [], []
        for trial in range(5):
            pw, uv, r_gt, t_gt = _scene(rng, n=256, noise_px=0.5,
                                        outlier_frac=0.25)
            out = pnp_ransac(jax.random.fold_in(key, trial),
                             jnp.asarray(pw), jnp.asarray(uv),
                             jnp.asarray(K), num_hypotheses=32,
                             inlier_px=2.0)
            errs_j.append(_rot_err_deg(np.asarray(out["r"]), r_gt))
            r_cv, t_cv = _cv2_ransac(pw, uv)
            errs_cv.append(_rot_err_deg(r_cv, r_gt))
        # parity: median error within 2x of OpenCV's, and absolutely small
        med_j = float(np.median(errs_j))
        med_cv = float(np.median(errs_cv))
        assert med_j < max(2.0 * med_cv, 1.0), (errs_j, errs_cv)

    def test_translation_parity(self, key):
        rng = np.random.RandomState(2)
        pw, uv, r_gt, t_gt = _scene(rng, n=256, noise_px=0.5,
                                    outlier_frac=0.2)
        out = pnp_ransac(key, jnp.asarray(pw), jnp.asarray(uv),
                         jnp.asarray(K), num_hypotheses=32, inlier_px=2.0)
        assert np.linalg.norm(np.asarray(out["t"]) - t_gt) < 0.02
