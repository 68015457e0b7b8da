"""Probe the FPFH chain's 1.27° recorded rotation error (VERDICT r4
item 7: BASELINE.md's north star is < 1°).

The refinement stack is descriptor-independent and converges to ~0.2°
on the SHOT chain of the same frame, so the 1.27° must come from where
the FPFH winner's basin leaves the tier-2 polish after its 6
point-to-plane iterations. Probes, against the bench FPFH config:

  base    — recorded r4 configuration
  t2=8/10 — more tier-2 polish iterations (is it unconverged, or a
            genuinely different local optimum?)
  top6    — refine_top 4 → 6 (is a better-basin candidate ranked 5th?)

Run on TPU:  python scripts/exp_fpfh_accuracy.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from bench import _err


def main():
    from tpu_joints.modelbank import build_bank
    from tpu_joints.pipelines.detect import detect_organized

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    seg_img_h, seg_valid_h = bench._frame(T_pose, 42, with_table=True)
    seg_img, seg_valid = jnp.asarray(seg_img_h), jnp.asarray(seg_valid_h)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    hw = 5

    fpfh_cfg = dataclasses.replace(
        cfg, descriptor="fpfh", match_mode="ratio", ratio=1.0,
        descr_rad=0.15, tier1_view_iterations=4,
        fpfh_surface="keys", fpfh_k_max=192)
    fpfh_bank = build_bank(
        bench._joint_model(), descriptor="fpfh",
        descr_radius=fpfh_cfg.descr_rad, rf_radius=fpfh_cfg.rf_rad,
        rf_k_max=fpfh_cfg.rf_k_max, frames=fpfh_cfg.rf_frames,
        sampling_radius=fpfh_cfg.model_ss, normal_k=fpfh_cfg.normal_k,
        k_max=fpfh_cfg.k_max, fpfh_surface="keys", fpfh_k_max=192,
        level=1, resolution=128, surface_leaf=0.01,
        key_capacity=256, icp_capacity=2048)

    deltas = {
        "base": {},
        "t2=8": dict(final_icp_iterations=8),
        "t2=10": dict(final_icp_iterations=10),
        # refine_top must stay a multiple of 4 (tier-2 R×2048 rows must
        # hit the 8192-row Mosaic shape exactly — 6×2048=12288 is a second
        # program shape and reproducibly faulted this probe's first run)
        "top8": dict(refine_top=8, icp_rows_per_call=8192),
        # the 1.27° is a CONVERGED optimum (t2=10 → 1.23°): probe whether
        # the 2 cm final correspondence gate sets it — on a winner view
        # with thin stub visibility the spin mode is flat and wide-gate
        # sideways correspondences bias the optimum
        "corr=8mm": dict(icp_max_corr_dist=0.008),
        "corr=5mm": dict(icp_max_corr_dist=0.005),
        "corr=5mm+t2=8": dict(icp_max_corr_dist=0.005,
                              final_icp_iterations=8),
    }
    only = [x for x in os.environ.get("LEVERS", "").split(",") if x]
    for name, d in deltas.items():
        if only and name not in only:
            continue
        c = dataclasses.replace(fpfh_cfg, **d)

        def run():
            res, _ = detect_organized(seg_img, seg_valid, fpfh_bank, c,
                                      block=block, half_window=hw,
                                      crop_lo=crop_lo, crop_hi=crop_hi,
                                      fused=True)
            jax.block_until_ready(res.full_pose)
            return res

        res = run()
        res = run()
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            res = run()
            ts.append((time.perf_counter() - t0) * 1000.0)
        rot, tr = _err(np.asarray(res.full_pose), T_pose)
        print(f"fpfh {name:7s} med={np.median(ts):6.2f}ms "
              f"acc={bool(res.accepted)} rot={rot:5.2f}deg "
              f"trans={tr * 1000:5.2f}mm view={int(res.view_idx)} "
              f"ffit={float(res.full_fitness):.3e}", flush=True)


if __name__ == "__main__":
    main()
