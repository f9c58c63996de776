"""Point-cloud ops: KNN, nearest, gather, FPS, pooling, chamfer."""

from pose_estimation_tpu.core.pointops.neighbors import (
    pairwise_sqdist, knn_indices, knn_indices_cross, nearest_index,
    min_dists,
    gather_neighbors, gather_neighbors_max, gather_rows,
    neighbor_directions, farthest_point_sampling,
    random_subsample_pool,
)
