"""A/B the refinement-stage latency levers on the TPU (VERDICT r4 items
2 + 9): each ICP iteration is one sequential ~0.5 ms NN round and the
refinement stage is the device-compute driver, so the levers are
iteration budgets — measured here against the recorded accuracy so wins
are real, not traded.

Levers (config deltas on the bench preset):
  base            — the recorded r4 configuration
  skipfit         — tier1_skip_view_fitness (drop the tier-1 view ICP's
                    trailing fitness NN round; reporting-only under
                    select_by_model_fitness)
  t2=5            — tier-2 polish 6 → 5 iterations
  view=3          — tier-1 view ICP 4 → 3 (polish stays 4)
  polish=3        — tier-1 ranking polish 4 → 3 (view stays 4)
  combo           — skipfit + t2=5 + view=3 if each is accuracy-neutral

Measures the SINGLE-part chain and the TWO-part flagship chain (the one
recorded at 50.556 ms, over the 50 ms target).

Run:  python scripts/exp_latency_levers.py
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
    from tpu_joints.pipelines.detect import detect_organized
    from tpu_joints.pipelines.multi import detect_parts_organized

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    xyz_img, valid = jnp.asarray(xyz_img_h), jnp.asarray(valid_h)
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    hw = 5
    banks = bench.build_part_banks(cfg)
    # the flagship runs the SEGMENTED chain (bench two_part section)
    seg_img_h, seg_valid_h = bench._frame(T_pose, 42, with_table=True)
    seg_img, seg_valid = jnp.asarray(seg_img_h), jnp.asarray(seg_valid_h)
    two_cfg_base = dataclasses.replace(cfg, max_candidates=8)

    deltas = {
        "base": {},
        "skipfit+view3": dict(tier1_skip_view_fitness=True,
                              tier1_view_iterations=3,
                              tier1_polish_iterations=4),
        "skipfit": dict(tier1_skip_view_fitness=True),
        "t2=5": dict(final_icp_iterations=5),
        "view=3": dict(tier1_view_iterations=3, tier1_polish_iterations=4),
        "polish=3": dict(tier1_view_iterations=4, tier1_polish_iterations=3),
        "combo": dict(tier1_skip_view_fitness=True, final_icp_iterations=5,
                      tier1_view_iterations=3, tier1_polish_iterations=4),
        # VERDICT r4 item 6: lift the 8-candidate/part cap — 16/part via
        # rows-capped sequential 8192-row ICP calls (two_part chain only;
        # the single chain already runs C=16)
        "c16": dict(max_candidates=16, icp_rows_per_call=8192),
    }

    def run_single(c):
        res, _ = detect_organized(xyz_img, valid, bank, c, block=block,
                                  half_window=hw, crop_lo=crop_lo,
                                  crop_hi=crop_hi, fused=True)
        jax.block_until_ready(res.full_pose)
        return res

    def run_two(c):
        _, res, _ = detect_parts_organized(
            seg_img, seg_valid, banks, c, block=block, half_window=hw,
            crop_lo=crop_lo, crop_hi=crop_hi)
        jax.block_until_ready(res.full_pose)
        return res

    only = [x for x in os.environ.get("LEVERS", "").split(",") if x]
    for chain, runner, base_cfg in (("single", run_single, det_cfg),
                                    ("two_part", run_two, two_cfg_base)):
        print(f"== {chain} ==", flush=True)
        for name, d in deltas.items():
            if only and name not in only:
                continue
            c = dataclasses.replace(base_cfg, **d)
            res = runner(c)   # compile
            res = runner(c)   # warm
            ts = []
            for _ in range(10):
                t0 = time.perf_counter()
                res = runner(c)
                ts.append((time.perf_counter() - t0) * 1000.0)
            rot, tr = _err(np.asarray(res.full_pose), T_pose)
            print(f"{chain:8s} {name:9s} med={np.median(ts):6.2f}ms "
                  f"min={min(ts):6.2f} acc={bool(res.accepted)} "
                  f"rot={rot:5.2f}deg trans={tr * 1000:5.2f}mm "
                  f"ffit={float(res.full_fitness):.3e}", flush=True)


if __name__ == "__main__":
    main()
