import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp, numpy as np
from tpu_joints.neighbors.pallas_knn import knn_pallas

def timeit(name, fn, *args, n=5):
    out = fn(*args); _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts=[]
    for _i in range(n):
        t0=time.perf_counter(); out=fn(*args)
        _=np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter()-t0)*1000)
    print(f"{name:36s} {np.median(ts):9.2f} ms", flush=True)
    return out

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(32768,3)).astype(np.float32))
s = jnp.asarray(rng.normal(size=(32768,3)).astype(np.float32))
for tm in (256, 512, 1024):
    for tn in (2048, 4096, 8192):
        try:
            timeit(f"pallas k=1 tm={tm} tn={tn}", lambda tm=tm, tn=tn: knn_pallas(q, s, 1, tm=tm, tn=tn))
        except Exception as e:
            print(f"tm={tm} tn={tn} failed: {type(e).__name__}", flush=True)
for tm in (256, 512):
    for tn in (2048, 8192):
        try:
            timeit(f"pallas k=16 tm={tm} tn={tn}", lambda tm=tm, tn=tn: knn_pallas(q, s, 16, tm=tm, tn=tn))
        except Exception as e:
            print(f"tm={tm} tn={tn} failed: {type(e).__name__}", flush=True)
d16, i16 = knn_pallas(q, s, 16)
# correctness spot-check vs oracle on subset
dd = np.sum((np.asarray(q[:128])[:,None,:]-np.asarray(s)[None,:,:])**2,axis=-1)
ref = np.sort(dd,axis=1)[:, :16]
got = np.sort(np.asarray(d16[:128]),axis=1)
print("max_err", np.abs(ref-got).max(), flush=True)
