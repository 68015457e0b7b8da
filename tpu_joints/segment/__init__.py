from tpu_joints.segment.region_growing import region_growing, cluster_curvature_filter
from tpu_joints.segment.sac import sac_plane, sac_cylinder

__all__ = ["region_growing", "cluster_curvature_filter", "sac_plane", "sac_cylinder"]
