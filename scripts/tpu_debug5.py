import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp, numpy as np
from tpu_joints.neighbors.pallas_knn import knn_pallas

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(32768,3)).astype(np.float32))
s = jnp.asarray(rng.normal(size=(32768,3)).astype(np.float32))
qq = jnp.asarray(rng.normal(size=(1024,3)).astype(np.float32))

@jax.jit
def mix(q, s, qq):
    d16, _ = knn_pallas(q, s, 16)
    # the XLA approx_min_k path (what radius_neighbors k=64 uses)
    dd = jnp.sum((qq[:, None, :] - s[None, :2048, :]) ** 2, -1)
    a, ai = jax.lax.approx_min_k(dd, 64)
    return d16.sum() + a.sum()

for i in range(4):
    try:
        v = mix(q, s, qq); jax.block_until_ready(v)
        print(f"mix {i} ok", flush=True)
    except Exception as e:
        print(f"mix {i} FAIL", repr(e)[:200], flush=True)
        break
