from pcc_tpu.ops.fps import (
    farthest_point_sample,
    farthest_point_sample_batch,
    random_point_sample_batch,
)
from pcc_tpu.ops.knn import knn_points, knn_gather, index_points, ball_query
from pcc_tpu.ops.chamfer import chamfer_distance, min_sq_dists
from pcc_tpu.ops.normalize import (
    normalize,
    denormalize,
    n_scale_batch,
    d_n_scale_batch,
)
from pcc_tpu.ops.normals import estimate_normals

__all__ = [
    "farthest_point_sample",
    "farthest_point_sample_batch",
    "random_point_sample_batch",
    "knn_points",
    "knn_gather",
    "index_points",
    "ball_query",
    "chamfer_distance",
    "min_sq_dists",
    "normalize",
    "denormalize",
    "n_scale_batch",
    "d_n_scale_batch",
    "estimate_normals",
]
