from geoformer_tpu.ops.voxelize import voxelize, voxel_mean_pool, devoxelize
from geoformer_tpu.ops.fps import furthest_point_sample
from geoformer_tpu.ops.ball_query import ball_query, query_and_group
from geoformer_tpu.ops.knn import knn
from geoformer_tpu.ops.geodesic import geodesic_distance
from geoformer_tpu.ops.segment_ops import sec_mean, sec_min, sec_max, roipool, get_iou
from geoformer_tpu.ops.cluster import ballquery_dense, bfs_cluster, connected_components
from geoformer_tpu.ops.interpolate import (
    three_nn,
    three_interpolate,
    three_interpolate_weights,
    gather_points,
    group_points,
)

__all__ = [
    "voxelize",
    "voxel_mean_pool",
    "devoxelize",
    "furthest_point_sample",
    "ball_query",
    "query_and_group",
    "knn",
    "geodesic_distance",
    "sec_mean",
    "sec_min",
    "sec_max",
    "roipool",
    "get_iou",
    "ballquery_dense",
    "bfs_cluster",
    "connected_components",
    "three_nn",
    "three_interpolate",
    "three_interpolate_weights",
    "gather_points",
    "group_points",
]
