"""Separate tunnel dispatch overhead from true device compute.

Times the fused detect executable called once vs twice vs four times
inside a single jitted dispatch: the marginal cost per extra call is pure
device compute (the ~29 ms remote-attachment roundtrip cancels in the
difference). Engineering tool — run on the TPU.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def timeit(name, fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1000)
    med = float(np.median(ts))
    print(f"{name:44s} {med:8.2f} ms  (min {min(ts):.1f} max {max(ts):.1f})",
          flush=True)
    return med


def main():
    from tpu_joints.pipelines.detect import detect_organized

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    xyz_img = jnp.asarray(xyz_img_h)
    valid = jnp.asarray(valid_h)
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)

    def one(img):
        res, _ = detect_organized(img, valid, bank, det_cfg, block=block,
                                  half_window=5, crop_lo=crop_lo,
                                  crop_hi=crop_hi, fused=True)
        return res.full_pose

    # distinct inputs per inner call so XLA cannot CSE the repeats
    jitters = [jnp.asarray(np.random.default_rng(i).normal(
        0, 1e-4, xyz_img_h.shape).astype(np.float32)) for i in range(4)]

    def rep(k):
        def f():
            outs = [one(xyz_img + jitters[i]) for i in range(k)]
            return jnp.stack(outs).sum()
        return jax.jit(f)

    f1, f2, f4 = rep(1), rep(2), rep(4)
    t1 = timeit("fused detect ×1 (one dispatch)", f1)
    t2 = timeit("fused detect ×2 (one dispatch)", f2)
    t4 = timeit("fused detect ×4 (one dispatch)", f4)
    print(f"marginal device compute: x2-x1 = {t2 - t1:.2f} ms, "
          f"(x4-x1)/3 = {(t4 - t1) / 3:.2f} ms")
    print(f"implied dispatch+sync overhead: {t1 - (t2 - t1):.2f} ms")


if __name__ == "__main__":
    main()
