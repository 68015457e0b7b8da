import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import bench
from tpu_joints.pipelines.detect import detect

scene, bank, cfg = bench.build_problem()
ok = 0
for i in range(3):
    try:
        res = detect(scene, bank, cfg)
        jax.block_until_ready(res.full_pose)
        ok += 1
    except Exception as e:
        print(f"repeat {i} FAIL", repr(e)[:200], flush=True)
        break
print(f"mode maxk={os.environ.get('TPU_JOINTS_PALLAS_MAXK','32')} ok={ok}", flush=True)
