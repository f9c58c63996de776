"""Pure-JAX geometry: rotations, intrinsics, warps, alignment."""

from pose_estimation_tpu.core.geometry.rotations import (
    quat_normalize, quat_to_matrix, matrix_to_quat,
    axis_angle_to_matrix, matrix_to_axis_angle, skew,
    ortho6d_to_matrix, matrix_to_ortho6d, euler_to_matrix,
    angular_distance, random_rotation, transform_points,
)
from pose_estimation_tpu.core.geometry.intrinsics import (
    intrinsic_vec_to_matrix, intrinsic_matrix_to_vec,
    uvd_to_cloud, depth_map_to_cloud, project_points, crop_intrinsics,
)
from pose_estimation_tpu.core.geometry.allocentric import (
    allo_to_ego_matrix, ego_to_allo_matrix,
)
from pose_estimation_tpu.core.geometry.warp import (
    crop_affine_coords, bilinear_sample, nearest_sample, crop_resize,
)
from pose_estimation_tpu.core.geometry.umeyama import kabsch, umeyama_ransac
