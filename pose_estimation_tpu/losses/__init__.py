"""Losses: masked map losses, ADD(-S) pose losses, transparent losses."""

from pose_estimation_tpu.losses.map_loss import (
    l1_map, cosine_map, ce_map, masked_mean, map_loss)
from pose_estimation_tpu.losses.pose_loss import (
    add_distance, pose_loss, krrn_loss)
from pose_estimation_tpu.losses.transparent_loss import (
    focal_loss, confidence_pose_loss, transparent_loss, smooth_l1)
