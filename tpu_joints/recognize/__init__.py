from tpu_joints.recognize.matching import match_nn, match_ratio
from tpu_joints.recognize.hough import hough_group
from tpu_joints.recognize.gc import gc_group
from tpu_joints.recognize.icp import icp, fitness_score, scene_coverage_multi
from tpu_joints.recognize.hv import verify_hypotheses
from tpu_joints.recognize.obb import oriented_bounding_box

__all__ = [
    "match_nn",
    "match_ratio",
    "hough_group",
    "gc_group",
    "icp",
    "fitness_score",
    "scene_coverage_multi",
    "verify_hypotheses",
    "oriented_bounding_box",
]
