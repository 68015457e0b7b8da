from tpu_joints.neighbors.bruteforce import (
    knn,
    radius_neighbors,
    pairwise_sq_dist,
)

__all__ = ["knn", "radius_neighbors", "pairwise_sq_dist"]
