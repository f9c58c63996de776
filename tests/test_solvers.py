"""Solver tests: EPnP / LM / RANSAC-PnP against synthetic ground truth and
the cv2.solvePnP oracle (the parity harness SURVEY.md section 7.3 calls for)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from pose_estimation_tpu.core import geometry as geo
from pose_estimation_tpu.core.solvers import (
    epnp, refine_pose_lm, pnp_ransac, pnp_ransac_batch, pnp_implicit)

K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1]], np.float32)


def _make_case(rng, n=64, noise=0.0, planar=False):
    """Random rigid pose + object points in front of the camera."""
    rv = rng.randn(3) * 0.6
    r_gt, _ = cv2.Rodrigues(rv)
    t_gt = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                     rng.uniform(0.6, 1.2)])
    pw = (rng.rand(n, 3) - 0.5) * 0.2
    if planar:
        pw[:, 2] = 0.0
    pc = pw @ r_gt.T + t_gt
    uv = pc[:, :2] / pc[:, 2:] * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    uv = uv + rng.randn(n, 2) * noise
    return (pw.astype(np.float32), uv.astype(np.float32),
            r_gt.astype(np.float32), t_gt.astype(np.float32))


class TestEPnP:
    def test_exact(self, rng):
        for i in range(5):
            pw, uv, r_gt, t_gt = _make_case(rng)
            r, t = epnp(jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(K))
            ang = float(geo.angular_distance(r, jnp.asarray(r_gt)))
            terr = float(jnp.linalg.norm(t - jnp.asarray(t_gt)))
            assert ang < 0.5, (i, ang)
            assert terr < 5e-3, (i, terr)

    def test_noisy_close_to_cv2(self, rng):
        angs_j, angs_cv = [], []
        for i in range(5):
            pw, uv, r_gt, t_gt = _make_case(rng, noise=1.0)
            r, t = epnp(jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(K))
            ok, rvec, tvec = cv2.solvePnP(
                pw.astype(np.float64), uv.astype(np.float64),
                K.astype(np.float64), None, flags=cv2.SOLVEPNP_EPNP)
            r_cv, _ = cv2.Rodrigues(rvec)
            angs_j.append(float(geo.angular_distance(r, jnp.asarray(r_gt))))
            angs_cv.append(float(geo.angular_distance(
                jnp.asarray(r_cv.astype(np.float32)), jnp.asarray(r_gt))))
        # within 2x of OpenCV's EPnP accuracy on average, and sane absolutes
        assert np.mean(angs_j) < max(2.0 * np.mean(angs_cv), 1.5), (
            angs_j, angs_cv)


class TestLM:
    def test_refines_perturbed_pose(self, rng):
        pw, uv, r_gt, t_gt = _make_case(rng, noise=0.0)
        rv_gt = cv2.Rodrigues(r_gt)[0][:, 0]
        pose0 = jnp.asarray(np.concatenate(
            [rv_gt + rng.randn(3) * 0.05, t_gt + rng.randn(3) * 0.02]),
            jnp.float32)
        w = jnp.ones((pw.shape[0],), jnp.float32)
        pose, mse = refine_pose_lm(pose0, jnp.asarray(pw), jnp.asarray(uv),
                                   jnp.asarray(K), w, iters=15)
        assert float(mse) < 1e-3
        r = geo.axis_angle_to_matrix(pose[:3])
        assert float(geo.angular_distance(r, jnp.asarray(r_gt))) < 0.2


class TestRansac:
    def test_with_outliers(self, rng, key):
        pw, uv, r_gt, t_gt = _make_case(rng, n=128, noise=0.3)
        # corrupt 30% of correspondences
        bad = rng.choice(128, 38, replace=False)
        uv_c = uv.copy()
        uv_c[bad] += rng.randn(38, 2) * 80 + 40
        out = pnp_ransac(key, jnp.asarray(pw), jnp.asarray(uv_c),
                         jnp.asarray(K), inlier_px=2.0)
        ang = float(geo.angular_distance(out["r"], jnp.asarray(r_gt)))
        terr = float(jnp.linalg.norm(out["t"] - jnp.asarray(t_gt)))
        assert ang < 1.0, ang
        assert terr < 0.01, terr
        assert int(out["num_inliers"]) > 70

    def test_respects_mask(self, rng, key):
        pw, uv, r_gt, t_gt = _make_case(rng, n=64)
        # garbage in the masked-out tail must not affect the solution
        pw2 = np.concatenate([pw, rng.randn(64, 3).astype(np.float32)])
        uv2 = np.concatenate([uv, rng.rand(64, 2).astype(np.float32) * 640])
        mask = np.concatenate([np.ones(64), np.zeros(64)]).astype(np.float32)
        out = pnp_ransac(key, jnp.asarray(pw2), jnp.asarray(uv2),
                         jnp.asarray(K), jnp.asarray(mask))
        ang = float(geo.angular_distance(out["r"], jnp.asarray(r_gt)))
        assert ang < 0.5, ang

    def test_batched(self, rng, key):
        cases = [_make_case(rng, n=64) for _ in range(3)]
        pw = jnp.asarray(np.stack([c[0] for c in cases]))
        uv = jnp.asarray(np.stack([c[1] for c in cases]))
        out = pnp_ransac_batch(key, pw, uv, jnp.asarray(K))
        for b in range(3):
            ang = float(geo.angular_distance(
                out["r"][b], jnp.asarray(cases[b][2])))
            assert ang < 0.5, (b, ang)


class TestImplicitDiff:
    def test_gradients_match_finite_difference(self, rng, key):
        # LM from a near-GT init (RANSAC's discrete hypothesis selection
        # would make finite differences jumpy; the IFT gradient itself is
        # selection-independent once the pose is at a stationary point).
        from pose_estimation_tpu.core.solvers import refine_pose_lm
        pw, uv, r_gt, t_gt = _make_case(rng, n=32, noise=0.5)
        w = jnp.ones((32,), jnp.float32)
        pw_j, uv_j, k_j = jnp.asarray(pw), jnp.asarray(uv), jnp.asarray(K)
        rv_gt = cv2.Rodrigues(r_gt)[0][:, 0]
        pose0 = jnp.asarray(np.concatenate([rv_gt, t_gt]), jnp.float32)

        @jax.jit
        def solve(uv_in):
            pose, _ = refine_pose_lm(pose0, pw_j, uv_in, k_j, w, iters=30)
            pose = pnp_implicit(pose, pw_j, uv_in, k_j, w)
            return jnp.sum(pose * jnp.arange(6))

        g = jax.jit(jax.grad(solve))(uv_j)
        assert np.all(np.isfinite(np.asarray(g)))
        # finite differences on a few coordinates
        eps = 0.05
        for (i, j) in [(0, 0), (5, 1), (17, 0)]:
            up = solve(uv_j.at[i, j].add(eps))
            dn = solve(uv_j.at[i, j].add(-eps))
            fd = (float(up) - float(dn)) / (2 * eps)
            an = float(g[i, j])
            assert abs(fd - an) < max(0.15 * abs(fd), 2e-3), (i, j, fd, an)


class TestICP:
    def test_refines_to_gt(self, rng):
        from pose_estimation_tpu.core.solvers import icp_refine
        r_gt = jnp.asarray(np.stack([cv2.Rodrigues(
            rng.randn(3) * 0.5)[0] for _ in range(4)]), jnp.float32)
        t_gt = jnp.asarray(rng.randn(4, 3).astype(np.float32) * 0.1)
        src = jnp.asarray(rng.randn(4, 128, 3).astype(np.float32) * 0.05)
        dst = src @ jnp.swapaxes(r_gt, -1, -2) + t_gt[:, None]
        # perturbed init
        dr = jnp.asarray(np.stack([cv2.Rodrigues(
            rng.randn(3) * 0.05)[0] for _ in range(4)]), jnp.float32)
        r0 = jnp.einsum("bij,bjk->bik", dr, r_gt,
                        precision=jax.lax.Precision.HIGHEST)
        t0 = t_gt + 0.005
        r, t, res = icp_refine(src, dst, r0, t0, iters=10)
        ang = np.asarray(geo.angular_distance(r, r_gt))
        assert float(np.max(ang)) < 1.0, ang
        assert float(np.max(np.asarray(res))) < 1e-3

    def test_trimmed_robust_to_outliers(self, rng):
        from pose_estimation_tpu.core.solvers import icp_refine
        src = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32) * 0.05)
        dst = src + jnp.asarray([0.02, 0.01, -0.03])
        dst = jnp.concatenate(
            [dst, jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))], 1)
        r0 = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        t0 = jnp.zeros((1, 3))
        r, t, res = icp_refine(src, dst, r0, t0, iters=10,
                               trim_fraction=0.3)
        gt = np.array([0.02, 0.01, -0.03])
        err_trim = np.linalg.norm(np.asarray(t[0]) - gt)
        # trimmed fit must still converge near the gt offset with 20%
        # outlier points present in the target cloud
        assert err_trim < 0.01, err_trim

    def test_partial_view_no_drift(self, rng):
        """Observed cloud covering only the visible half of the object:
        a perfect initial pose must be a fixed point, and a ~5 deg / 5 mm
        perturbed pose must improve. The old src->dst matching matched
        every occluded-side model point onto the visible patch and
        drifted 4+ deg from the perfect pose (the committed
        RESULTS_transparent add_dis_icp=0.044 m regression)."""
        from pose_estimation_tpu.core.solvers import icp_refine

        # box surface with distinct half-extents: rotation observable
        ext = np.array([0.015, 0.025, 0.04], np.float32)
        faces = []
        for ax in range(3):
            for s in (-1, 1):
                p = rng.uniform(-1, 1, (200, 3)).astype(np.float32) * ext
                p[:, ax] = s * ext[ax]
                faces.append(p)
        src = np.concatenate(faces)
        r_gt = np.asarray(cv2.Rodrigues(rng.randn(3) * 0.5)[0], np.float32)
        t_gt = np.array([0.02, -0.01, 0.6], np.float32)
        world = src @ r_gt.T + t_gt
        vis = world[world[:, 2] < np.median(world[:, 2])]  # camera-facing
        dst = jnp.asarray(vis[rng.choice(len(vis), 256)][None])
        src_b = jnp.asarray(src[None])

        r, t, _ = icp_refine(src_b, dst, jnp.asarray(r_gt[None]),
                             jnp.asarray(t_gt[None]), iters=10,
                             trim_fraction=0.3)
        assert float(geo.angular_distance(r, r_gt[None])[0]) < 0.5
        assert float(jnp.linalg.norm(t - t_gt[None])) < 1e-3

        dr = np.asarray(cv2.Rodrigues(np.array([0.06, -0.05, 0.04]))[0],
                        np.float32)
        r0 = jnp.asarray((dr @ r_gt)[None])
        t0 = jnp.asarray(t_gt[None]) + jnp.asarray([[0.004, -0.003, 0.003]])
        r, t, _ = icp_refine(src_b, dst, r0, t0, iters=10,
                             trim_fraction=0.3)
        init_rot = float(geo.angular_distance(r0, r_gt[None])[0])
        assert float(geo.angular_distance(r, r_gt[None])[0]) < 0.6 * init_rot
        assert float(jnp.linalg.norm(t - t_gt[None])) < 2e-3


class TestGatedICP:
    """Trust-region accept gating (gated_icp_refine): refinement must
    never regress a converged pose against a noisy/biased observed
    cloud, must accept a genuine within-trust-region polish, and must
    reject any refinement that moves the pose far — the r5 regeneration
    of the transparent artifact measured the r4 residual-only gate
    accepting 85% of frames while mean rotation error went
    4.2 -> 23.3 deg (a wrong-rotation fit to the biased completed depth
    beats the trimmed residual; see the gated_icp_refine docstring)."""

    def _scene(self, rng, noise=0.008):
        # asymmetric blob so rotation is observable; dst is a noisy
        # subset (the "completed depth with a ~noise-level quality floor")
        src = rng.randn(1, 128, 3).astype(np.float32) * 0.05
        r_gt = np.asarray(cv2.Rodrigues(rng.randn(3) * 0.5)[0], np.float32)
        t_gt = np.array([0.02, -0.01, 0.6], np.float32)
        obs = src[0, rng.choice(128, 64, replace=False)] @ r_gt.T + t_gt
        obs = obs + rng.randn(64, 3).astype(np.float32) * noise
        return (jnp.asarray(src), jnp.asarray(obs[None]),
                jnp.asarray(r_gt[None]), jnp.asarray(t_gt[None]))

    def test_rejects_refinement_of_converged_pose(self, rng):
        from pose_estimation_tpu.core.solvers.icp import gated_icp_refine
        src, dst, r_gt, t_gt = self._scene(rng)
        r, t, accepted, _ = gated_icp_refine(src, dst, r_gt, t_gt,
                                             iters=10, trim_fraction=0.3)
        assert not bool(accepted[0]), "gate accepted a no-win refinement"
        # rejected => outputs are EXACTLY the direct pose, bit-for-bit
        assert np.array_equal(np.asarray(r), np.asarray(r_gt))
        assert np.array_equal(np.asarray(t), np.asarray(t_gt))

    def test_accepts_polish_within_trust_region(self, rng):
        """A near-correct pose (~5 deg, 8 mm off — inside the 10 deg /
        2 cm trust region) with a clear residual win must be refined."""
        from pose_estimation_tpu.core.solvers.icp import gated_icp_refine
        src, dst, r_gt, t_gt = self._scene(rng, noise=0.002)
        dr = np.asarray(cv2.Rodrigues(np.array([0.06, -0.05, 0.03]))[0],
                        np.float32)
        r0 = jnp.asarray(dr[None]) @ r_gt
        t0 = t_gt + jnp.asarray([[0.005, -0.004, 0.004]])
        r, t, accepted, _ = gated_icp_refine(src, dst, r0, t0,
                                             iters=10, trim_fraction=0.3)
        assert bool(accepted[0]), "gate rejected a clear-win polish"
        init_rot = float(geo.angular_distance(r0, r_gt)[0])
        assert float(geo.angular_distance(r, r_gt)[0]) < 0.5 * init_rot
        assert (float(jnp.linalg.norm(t - t_gt))
                < 0.5 * float(jnp.linalg.norm(t0 - t_gt)))

    def test_rejects_large_pose_change_even_if_residual_improves(self, rng):
        """The epoch-183 failure mode: starting far off (~15 deg,
        2.7 cm), ICP may find a fit that beats the trimmed residual by
        re-estimating the pose — outside the trust region it must be
        rejected and the outputs must be exactly the direct pose."""
        from pose_estimation_tpu.core.solvers.icp import gated_icp_refine
        src, dst, r_gt, t_gt = self._scene(rng)
        dr = np.asarray(cv2.Rodrigues(np.array([0.20, -0.15, 0.10]))[0],
                        np.float32)
        r0 = jnp.asarray(dr[None]) @ r_gt
        t0 = t_gt + jnp.asarray([[0.02, -0.015, 0.01]])
        r, t, accepted, _ = gated_icp_refine(src, dst, r0, t0,
                                             iters=10, trim_fraction=0.3)
        assert not bool(accepted[0])
        assert np.array_equal(np.asarray(r), np.asarray(r0))
        assert np.array_equal(np.asarray(t), np.asarray(t0))


class TestRansacSampling:
    def test_minimal_subsets_are_distinct(self, key):
        """Shared-permutation sampling must return duplicate-free subsets
        that respect the mask (cv2.solvePnPRansac parity: distinct
        points), including when the valid count forces window wrap."""
        from pose_estimation_tpu.core.solvers.pnp import _minimal_subsets
        import jax
        for n_valid in (16, 9, 6):  # 16: wraps at subset 3; 6: every one
            mask = np.zeros(32, np.float32)
            mask[:n_valid] = 1.0
            for i in range(10):
                ids = np.asarray(_minimal_subsets(
                    jax.random.fold_in(key, 100 * n_valid + i), 32, 6, 8,
                    jnp.asarray(mask)))
                assert ids.shape == (8, 6)
                for row in ids:
                    assert len(set(row.tolist())) == 6, (n_valid, row)
                assert ids.max() < n_valid, (n_valid, ids)
        # full-rank case: first floor(n_valid/6) subsets are disjoint
        mask = np.ones(64, np.float32)
        ids = np.asarray(_minimal_subsets(key, 64, 6, 10, jnp.asarray(mask)))
        flat = ids[:10].reshape(-1)[: (64 // 6) * 6]
        assert len(set(flat.tolist())) == len(flat)

    def test_minimal_subsets_wrap_diversity(self, key):
        """Wrapping hypotheses must NOT alias onto n_valid/gcd(6,n_valid)
        windows (48 valid once gave only 8 distinct subsets of 64): with
        random starts past the disjoint prefix, distinct subsets should
        approach min(H, n_valid)."""
        from pose_estimation_tpu.core.solvers.pnp import _minimal_subsets
        import jax
        for n_valid, floor in ((48, 30), (12, 8), (18, 12)):
            mask = np.zeros(256, np.float32)
            mask[:n_valid] = 1.0
            ids = np.asarray(_minimal_subsets(
                jax.random.fold_in(key, n_valid), 256, 6, 64,
                jnp.asarray(mask)))
            distinct = len({tuple(sorted(r.tolist())) for r in ids})
            assert distinct >= floor, (n_valid, distinct)

    def test_refine_top_k_multi_start(self, rng, key):
        """LM-refining the top-4 hypotheses and keeping the lowest
        common-objective candidate must match or beat winner-only
        refinement under noise + outliers (multi-start guard against the
        inlier count picking a poor basin)."""
        errs = {1: [], 4: []}
        for trial in range(6):
            pw, uv, r_gt, t_gt = _make_case(rng, n=256, noise=1.0)
            bad = rng.choice(256, 64, replace=False)
            uv_c = uv.copy()
            uv_c[bad] += rng.randn(64, 2) * 40 + 20
            for k_top in (1, 4):
                out = pnp_ransac(jax.random.fold_in(key, trial),
                                 jnp.asarray(pw), jnp.asarray(uv_c),
                                 jnp.asarray(K), inlier_px=2.0,
                                 refine_top_k=k_top)
                errs[k_top].append(float(
                    geo.angular_distance(out["r"], jnp.asarray(r_gt))))
        m1 = np.mean(errs[1])
        m4 = np.mean(errs[4])
        assert m4 < 2.0, errs
        assert m4 <= m1 * 1.2 + 0.1, (m1, m4)

    def test_robust_refine_with_noise_and_outliers(self, rng, key):
        """Cauchy-reweighted LM over all points must match or beat the
        hard-inlier refinement under per-point noise + outliers."""
        pw, uv, r_gt, t_gt = _make_case(rng, n=256, noise=0.8)
        bad = rng.choice(256, 50, replace=False)
        uv_c = uv.copy()
        uv_c[bad] += rng.randn(50, 2) * 60 + 30
        hard = pnp_ransac(key, jnp.asarray(pw), jnp.asarray(uv_c),
                          jnp.asarray(K), inlier_px=2.0)
        soft = pnp_ransac(key, jnp.asarray(pw), jnp.asarray(uv_c),
                          jnp.asarray(K), inlier_px=2.0,
                          robust_refine=True)
        ang_h = float(geo.angular_distance(hard["r"], jnp.asarray(r_gt)))
        ang_s = float(geo.angular_distance(soft["r"], jnp.asarray(r_gt)))
        assert ang_s < 2.0, ang_s
        assert ang_s <= ang_h * 1.5 + 0.2, (ang_s, ang_h)
