"""Marginal device cost of match → Hough grouping, split on/off.

The round-4 rotation-mode split added ~1.3 ms to every latency chain and
pushed the two-part and FPFH chains just over the 50 ms target. This
isolates the grouping stage (per-view 64³ scatter-add + 3³ NMS + per-bin
Umeyama, now ×2 modes) with the ×2−×1 marginal-dispatch trick, at both
the single-part (42-view) and two-part (84-view) widths, split on/off.
Engineering tool — run on the TPU.

Run:  python scripts/exp_group_marginal.py
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


def med_ms(f, n=8):
    jax.block_until_ready(f())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def marginal(make_fn, jitters):
    f1 = jax.jit(lambda: make_fn(jitters[0]))
    f2 = jax.jit(lambda: make_fn(jitters[0]) + make_fn(jitters[1]))
    return max(med_ms(f2) - med_ms(f1), 0.0)


def main():
    from tpu_joints.pipelines.detect import (
        _group_all_views, _strip_crop, match_bank, prepare_scene)
    from tpu_joints.pipelines.ingest import ingest_organized_blocks

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    xyz_img = jnp.asarray(xyz_img_h)
    valid = jnp.asarray(valid_h)
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    scfg = _strip_crop(det_cfg)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)

    jitters = [jnp.asarray(np.random.default_rng(i).normal(
        0, 1e-4, xyz_img_h.shape).astype(np.float32)) for i in range(2)]

    def feats_of(j, c):
        scene, normals, curv, _ = ingest_organized_blocks(
            xyz_img + j, valid, block=block, half_window=5,
            capacity=c.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi)
        return prepare_scene(scene, c, None, normals, curv)

    def thru_match(c, b):
        def f(j):
            feats = feats_of(j, c)
            corrs = match_bank(feats.desc, feats.desc_valid, b.desc,
                               b.key_valid, c)
            return corrs.dist_sq.sum()
        return f

    def thru_group(c, b):
        def f(j):
            feats = feats_of(j, c)
            corrs = match_bank(feats.desc, feats.desc_valid, b.desc,
                               b.key_valid, c)
            inst = _group_all_views(feats, b, corrs, c)
            return inst.poses.sum() + inst.votes.sum()
        return f

    variants = [("1-part", bank, det_cfg)]
    try:
        from tpu_joints.pipelines.multi import _cat_for_parts
        parts = bench.build_part_banks(det_cfg)
        _, cat_bank = _cat_for_parts(parts)
        variants.append(("2-part", cat_bank, det_cfg))
    except Exception as e:  # noqa: BLE001 — optional width
        print(f"(two-part bank unavailable here: {e})")

    for name, b, c in variants:
        base = marginal(thru_match(c, b), jitters)
        for split in (False, True):
            cs = dataclasses.replace(
                c, split_rotation_modes=split,
                max_instances_per_view=2 if split else 1)
            g = marginal(thru_group(cs, b), jitters)
            print(f"{name} split={int(split)}: match {base:6.2f} ms, "
                  f"+grouping {g - base:6.2f} ms (total {g:6.2f})",
                  flush=True)


if __name__ == "__main__":
    main()
