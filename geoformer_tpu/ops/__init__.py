from geoformer_tpu.ops.voxelize import voxelize, voxel_mean_pool, devoxelize
from geoformer_tpu.ops.fps import furthest_point_sample
from geoformer_tpu.ops.ball_query import ball_query, query_and_group
from geoformer_tpu.ops.knn import knn
from geoformer_tpu.ops.geodesic import geodesic_distance

__all__ = [
    "voxelize",
    "voxel_mean_pool",
    "devoxelize",
    "furthest_point_sample",
    "ball_query",
    "query_and_group",
    "knn",
    "geodesic_distance",
]
