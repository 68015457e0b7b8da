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

@jax.jit
def both(q, s):
    d16, i16 = knn_pallas(q, s, 16)
    d1, i1 = knn_pallas(q, s, 1)
    return d16.sum() + d1.sum()

for i in range(3):
    try:
        v = both(q, s); jax.block_until_ready(v)
        print(f"both {i} ok", flush=True)
    except Exception as e:
        print(f"both {i} FAIL", repr(e)[:200], flush=True)
        break

@jax.jit
def k16twice(q, s):
    d16, _ = knn_pallas(q, s, 16)
    e16, _ = knn_pallas(s, q, 16)
    return d16.sum() + e16.sum()

for i in range(3):
    try:
        v = k16twice(q, s); jax.block_until_ready(v)
        print(f"k16twice {i} ok", flush=True)
    except Exception as e:
        print(f"k16twice {i} FAIL", repr(e)[:200], flush=True)
        break

@jax.jit
def k16scan(q, s):
    def step(c, _):
        d16, _ = knn_pallas(q + c * 1e-9, s, 16)
        return d16.sum(), None
    c, _ = jax.lax.scan(step, jnp.float32(0), None, length=2)
    return c

for i in range(3):
    try:
        v = k16scan(q, s); jax.block_until_ready(v)
        print(f"k16scan {i} ok", flush=True)
    except Exception as e:
        print(f"k16scan {i} FAIL", repr(e)[:200], flush=True)
        break
