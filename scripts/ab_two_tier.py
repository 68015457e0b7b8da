"""A/B the two-tier candidate refinement on TPU at bench scale.

Runs the fused frame→pose program with refine_top ∈ {0, 4} on both the
default and the segmented bench frames and reports per-frame amortized
latency (N frames in flight, one sync — the bench throughput method, which
amortizes away the remote attachment's ~25-33 ms control roundtrip) plus
the pose error, so the two-tier cut can be attributed to the refinement
stage and checked for accuracy neutrality.

Usage:  python scripts/ab_two_tier.py          (TPU; ~minutes warm,
        15-40 min on a cold compile cache)
        BENCH_SMALL=1 JAX_PLATFORMS=cpu python scripts/ab_two_tier.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench

import jax
import jax.numpy as jnp

from tpu_joints.pipelines.detect import detect_organized


def main():
    xyz_img_h, valid_h, bank, cfg0, block, T_pose = bench.build_problem()
    seg_img_h, seg_valid_h = bench._frame(T_pose, 42, with_table=True)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    hw = 3 if bench.SMALL else 5
    jitter = [jnp.asarray(np.random.default_rng(i).normal(
        0, 1e-4, xyz_img_h.shape).astype(np.float32)) for i in range(4)]
    print(f"device={jax.devices()[0].device_kind}")

    for rt in (0, 4):
        for label, img, vm in (("default", xyz_img_h, valid_h),
                               ("segmented", seg_img_h, seg_valid_h)):
            cfg = dataclasses.replace(cfg0, refine_top=rt)
            if label == "default":
                cfg = dataclasses.replace(cfg, segment_scene=False,
                                          remove_plane=False)
            img_d, vm_d = jnp.asarray(img), jnp.asarray(vm)

            def run(x):
                res, _ = detect_organized(
                    x, vm_d, bank, cfg, block=block, half_window=hw,
                    crop_lo=crop_lo, crop_hi=crop_hi, fused=True)
                return res

            res = run(img_d)
            jax.block_until_ready(res.full_pose)   # compile + warm
            N = 4 if bench.SMALL else 20
            out = []
            t0 = time.perf_counter()
            for i in range(N):
                out.append(run(img_d + jitter[i % 4]))
            jax.block_until_ready([r.full_pose for r in out])
            ms = (time.perf_counter() - t0) * 1000.0 / N
            rot, tr = bench._err(np.asarray(out[0].full_pose), T_pose)
            n_acc = sum(bool(r.accepted) for r in out)
            print(f"refine_top={rt} {label:10s} {ms:7.2f} ms/frame "
                  f"acc={n_acc}/{N} rot={rot:.2f}deg trans={tr*1000:.1f}mm "
                  f"ffit={float(out[0].full_fitness):.3e}", flush=True)


if __name__ == "__main__":
    main()
