from tpu_joints.pipelines.detect import (
    DetectionResult,
    SceneFeatures,
    detect,
    match_bank,
    prepare_scene,
)

__all__ = ["DetectionResult", "SceneFeatures", "detect", "match_bank", "prepare_scene"]
