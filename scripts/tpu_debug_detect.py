import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import bench
from tpu_joints.pipelines.detect import detect, prepare_scene, detect_with_features

scene, bank, cfg = bench.build_problem()
try:
    feats = jax.jit(prepare_scene, static_argnames=("cfg",))(scene, cfg)
    jax.block_until_ready(feats.desc)
    print("prepare_scene ok", flush=True)
except Exception as e:
    print("prepare_scene FAIL", repr(e)[:300], flush=True)
    raise SystemExit
try:
    res = detect(scene, bank, cfg)
    jax.block_until_ready(res.full_pose)
    print("detect ok fitness", float(res.fitness), flush=True)
except Exception as e:
    print("detect FAIL", repr(e)[:300], flush=True)
for i in range(4):
    try:
        res = detect(scene, bank, cfg)
        jax.block_until_ready(res.full_pose)
        print(f"repeat {i} ok", float(res.fitness), flush=True)
    except Exception as e:
        print(f"repeat {i} FAIL", repr(e)[:300], flush=True)
        break
