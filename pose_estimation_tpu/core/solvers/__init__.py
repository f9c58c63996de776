"""Differentiable geometric solvers: EPnP, LM refinement, RANSAC PnP."""

from pose_estimation_tpu.core.solvers.epnp import epnp
from pose_estimation_tpu.core.solvers.lm import (
    refine_pose_lm, reprojection_residuals)
from pose_estimation_tpu.core.solvers.pnp import (
    pnp_ransac, pnp_ransac_batch, pnp_implicit)
from pose_estimation_tpu.core.solvers.icp import icp_refine
from pose_estimation_tpu.core.solvers.epnp import epnp_fast
