"""tpu_joints — TPU-native 6D pose estimation for industrial pipe joints.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the PCL/ROS
reference ``Merium88/3D-Object-Detection-of-Industrial-Joints`` (see SURVEY.md):
CAD partial-view rendering and descriptor banks, scene segmentation, SHOT-352 /
FPFH-33 local descriptors, Hough-3D / geometric-consistency correspondence
grouping, ICP refinement, global hypothesis verification, oriented bounding
boxes, and a streaming request server — all designed TPU-first: padded
fixed-shape arrays with validity masks, tiled-matmul neighbor search on the
MXU, batched closed-form eigensolves, scatter-add voting, and `lax.scan`-based
iterative refinement, with scene batches sharded over a device mesh.
"""

__version__ = "0.1.0"

from tpu_joints.core.cloud import Cloud  # noqa: F401
