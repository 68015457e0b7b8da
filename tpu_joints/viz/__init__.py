"""Visualization & reporting (layer L7): PNG dumps replacing PCLVisualizer."""
from tpu_joints.viz.plot import (  # noqa: F401
    plot_clusters,
    plot_descriptor_histogram,
    plot_detection,
)
