from tpu_joints.features.eigen3 import eigh3x3, smallest_eigenvector
from tpu_joints.features.normals import estimate_normals

__all__ = ["eigh3x3", "smallest_eigenvector", "estimate_normals"]
