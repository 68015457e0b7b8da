"""Stage-latency breakdown of the current headline bench (raw frame → pose).

Engineering tool — run on the TPU. Times the three jitted stages that make
up bench.py's `run()` (ingest, prepare/features, match+refine) plus finer
sub-stages where that helps aim optimization work.
"""
from __future__ import annotations

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
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # true sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:40s} {np.median(ts):10.2f} ms", flush=True)
    return out


def main():
    from tpu_joints.pipelines.detect import (
        _detect_features_jit, _prepare_jit, match_bank, _group_all_views,
    )
    from tpu_joints.pipelines.ingest import ingest_organized_blocks
    from tpu_joints.recognize.icp import icp_multi
    import functools

    import dataclasses

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    # detect runs with the crop flags off (the lattice ingest owns them) —
    # mirror bench.main's det_cfg so the profiled programs are the bench's
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    xyz_img = jnp.asarray(xyz_img_h)
    valid = jnp.asarray(valid_h)
    half_window = 5

    print(f"device={jax.devices()[0].device_kind}")

    # dispatch-floor probe: a trivial program timed exactly like the stages.
    # Under this environment's remote TPU attachment every synchronous call
    # pays a control-channel roundtrip (~30 ms); subtract this number from
    # every stage below to get net device compute.
    tiny = jnp.ones((8,), jnp.float32)
    inc = jax.jit(lambda v: v + 1.0)
    timeit("dispatch floor (trivial program)", lambda: inc(tiny))

    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    ing = timeit("ingest_organized_blocks", lambda: ingest_organized_blocks(
        xyz_img, valid, block=block, half_window=half_window,
        capacity=cfg.scene_capacity, crop_lo=crop_lo, crop_hi=crop_hi))
    scene, normals, curvature, n_sel = ing
    print(f"  working set: {int(n_sel)}")

    from tpu_joints.pipelines.ingest import ingest_organized_segmented

    seg_img_h, seg_valid_h = bench._frame(T_pose, 42, with_table=True)
    seg_img, seg_valid = jnp.asarray(seg_img_h), jnp.asarray(seg_valid_h)
    timeit("ingest_organized_segmented", lambda: ingest_organized_segmented(
        seg_img, seg_valid, cfg, block=block, half_window=half_window,
        crop_lo=crop_lo, crop_hi=crop_hi))

    feats = timeit("prepare_scene (keys+SHOT+LRF)", lambda: _prepare_jit(
        scene, det_cfg, None, normals, curvature))

    timeit("detect_with_features (match..pose)", lambda: _detect_features_jit(
        feats, bank, det_cfg))

    # ---- sub-stages of detect_with_features ----
    mb = functools.partial(jax.jit, static_argnames=("cfg",))(match_bank)
    corrs = timeit("  match_bank", lambda: mb(
        feats.desc, feats.desc_valid, bank.desc, bank.key_valid, cfg))

    gv = functools.partial(jax.jit, static_argnames=("cfg",))(_group_all_views)
    inst = timeit("  grouping", lambda: gv(feats, bank, corrs, cfg))

    V = bank.desc.shape[0]
    P = cfg.max_instances_per_view
    C = cfg.max_candidates
    votes = jnp.where(inst.valid, inst.votes, -1.0).reshape(V * P)
    _, top_flat = jax.lax.top_k(votes, C)
    cand_views = top_flat // P
    cand_init = inst.poses.reshape(V * P, 4, 4)[top_flat]

    icpj = jax.jit(functools.partial(
        icp_multi, iterations=cfg.icp_iterations,
        max_corr_dist=cfg.icp_max_corr_dist,
        max_corr_start=cfg.icp_max_corr_start, chunk=2048))
    timeit("  icp_multi (candidates)", lambda: icpj(
        bank.icp_xyz[cand_views], bank.icp_mask[cand_views],
        feats.cloud, cand_init))

    # ---- prepare sub-stages ----
    from tpu_joints.features.shot import compute_shot
    from tpu_joints.filters import compact_cloud, uniform_sample_mask

    us = jax.jit(lambda s: uniform_sample_mask(s, cfg.scene_ss))
    keep = timeit("  uniform_sample_mask", lambda: us(scene))
    cc = functools.partial(jax.jit, static_argnames=("cap",))(
        lambda s, k, cap: compact_cloud(s, k, cap))
    keys, kidx = timeit("  compact_cloud", lambda: cc(
        scene, keep, cfg.scene_key_capacity))
    cs = functools.partial(jax.jit, static_argnames=("radius", "k_max"))(
        lambda k, s, n, radius, k_max: compute_shot(
            k, s, n, radius=radius, k_max=k_max))
    timeit("  compute_shot", lambda: cs(
        keys, scene, normals, cfg.descr_rad, cfg.k_max))

    if cfg.rf_frames == "board":
        from tpu_joints.features.lrf import board_lrf
        from tpu_joints.neighbors import radius_neighbors

        def rfg():
            nidx, nwithin, _ = radius_neighbors(
                keys.xyz, scene.xyz, cfg.rf_rad, cfg.rf_k_max,
                source_mask=scene.mask)
            return nidx, nwithin
        nidx, nwithin = timeit("  rf radius gather", jax.jit(rfg))
        nvalid = nwithin & keys.mask[:, None]
        bl = jax.jit(functools.partial(board_lrf, radius=cfg.rf_rad))
        timeit("  board_lrf", lambda: bl(keys.xyz, normals[kidx],
                                         scene.xyz[nidx], normals[nidx],
                                         nvalid))


if __name__ == "__main__":
    main()
