import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp, numpy as np
from tpu_joints.core.cloud import make_cloud
from tpu_joints.features.normals import estimate_normals
from tpu_joints.recognize.icp import icp_multi

rng = np.random.default_rng(0)
cloud = make_cloud(rng.normal(size=(30000,3)).astype(np.float32), capacity=32768)
for i in range(3):
    try:
        n, c = estimate_normals(cloud, k=16)
        jax.block_until_ready(n)
        print(f"normals {i} ok", flush=True)
    except Exception as e:
        print(f"normals {i} FAIL", repr(e)[:200], flush=True)
        break
src = jnp.asarray(rng.normal(size=(4,4096,3)).astype(np.float32))
mask = jnp.ones((4,4096), bool)
T0 = jnp.broadcast_to(jnp.eye(4), (4,4,4))
for i in range(3):
    try:
        T, f = icp_multi(src, mask, cloud, T0, iterations=3, chunk=2048)
        jax.block_until_ready(T)
        print(f"icp_multi {i} ok", flush=True)
    except Exception as e:
        print(f"icp_multi {i} FAIL", repr(e)[:200], flush=True)
        break
