from tpu_joints.core.cloud import Cloud, make_cloud, pad_cloud, bucket_size
from tpu_joints.core import transforms
from tpu_joints.core import io
from tpu_joints.core import posefile

__all__ = ["Cloud", "make_cloud", "pad_cloud", "bucket_size", "transforms", "io", "posefile"]
