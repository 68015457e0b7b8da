"""Step-wise diagnosis of the full-scale two-instance bench scene.

The bench's multi_instance section has never passed at full scale: the
refined candidate field contains no pose near either ground-truth joint.
This walks the pipeline stage by stage (ingest -> prepare -> match ->
group) and scores EVERY per-view Hough instance init against both true
poses, to localize the failure: bad grouping inits everywhere, good inits
dropped by the candidate cut, or refinement divergence.

Run on the TPU:  python scripts/debug_multi_instance.py
"""
from __future__ import annotations

import dataclasses
import os
import sys

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
from bench import _CYLINDERS, _err, _frame, _pose


def main():
    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)

    # keep in sync with bench.py's multi_instance section (separated
    # poses — the r4 pair interpenetrated, min surface gap 0.000 m)
    T_a = _pose(25.0, -15.0, [-0.30, -0.16, 1.05])
    T_b = _pose(-20.0, 20.0, [0.30, 0.18, 1.00])
    cyls2 = []
    for T in (T_a, T_b):
        for c0, a0, r0, h0 in _CYLINDERS:
            cyls2.append((T[:3, :3] @ c0 + T[:3, 3], T[:3, :3] @ a0,
                          r0, h0))
    img2_h, v2_h = _frame(np.eye(4, dtype=np.float32), 77,
                          with_table=False, cylinders=cyls2)
    multi_cfg = dataclasses.replace(
        det_cfg,
        coverage_local=True,
        max_instances_per_view=4,
        peak_grouped_candidates=True,
        max_candidates=48,
        refine_top=12,
        icp_rows_per_call=8192,
        scene_capacity=8192,
        scene_key_capacity=1024,
    )
    wide_lo = jnp.array([-0.8, -0.6, 0.5], jnp.float32)
    wide_hi = jnp.array([0.8, 0.6, 1.7], jnp.float32)

    from tpu_joints.core.transforms import compose
    from tpu_joints.pipelines.detect import (
        _group_all_views, match_bank, prepare_scene)
    from tpu_joints.pipelines.ingest import ingest_organized_blocks

    half_window = 5
    scene, normals, curv, n_sel = ingest_organized_blocks(
        jnp.asarray(img2_h), jnp.asarray(v2_h), block=block,
        half_window=half_window, capacity=multi_cfg.scene_capacity,
        crop_lo=wide_lo, crop_hi=wide_hi)
    print(f"working_set={int(n_sel)}")
    feats = jax.jit(prepare_scene, static_argnames=("cfg",))(
        scene, multi_cfg, None, normals, curv)
    n_keys = int(jnp.sum(feats.desc_valid))
    print(f"valid_keys={n_keys} / cap {feats.desc.shape[0]}")
    # how many keys belong to each joint (nearest true centroid)
    keys = np.asarray(feats.keys.xyz)
    kv = np.asarray(feats.desc_valid)
    da = np.linalg.norm(keys - T_a[:3, 3], axis=1)
    db = np.linalg.norm(keys - T_b[:3, 3], axis=1)
    print(f"keys nearer a: {int(np.sum(kv & (da < db)))}  "
          f"nearer b: {int(np.sum(kv & (da >= db)))}")

    corrs = jax.jit(match_bank, static_argnames=("cfg",))(
        feats.desc, feats.desc_valid, bank.desc, bank.key_valid, multi_cfg)
    nc = np.asarray(jnp.sum(corrs.valid.astype(jnp.int32), axis=1))
    print(f"corrs/view: min={nc.min()} med={int(np.median(nc))} "
          f"max={nc.max()}")

    inst = jax.jit(_group_all_views, static_argnames=("cfg",))(
        feats, bank, corrs, multi_cfg)
    poses = np.asarray(inst.poses)        # [V, P, 4, 4]
    votes = np.asarray(inst.votes)
    valid = np.asarray(inst.valid)
    ncorr = np.asarray(inst.n_corrs)
    bank_poses = np.asarray(bank.poses)
    V, P = votes.shape

    rows = []
    for v in range(V):
        for p in range(P):
            full = np.asarray(compose(jnp.asarray(poses[v, p]),
                                      jnp.asarray(bank_poses[v])))
            ea = _err(full, T_a)
            eb = _err(full, T_b)
            rows.append((v, p, votes[v, p], bool(valid[v, p]),
                         int(ncorr[v, p]), ea, eb))

    # peak-grouped cut: which (view, peak) pairs are kept (top Cp/2 by
    # the pair's best mode); kept_views = views contributing any pair
    Kp = multi_cfg.max_candidates // 2
    pair_strength = np.where(valid, votes, -1.0).reshape(V * P // 2, 2
                                                         ).max(axis=1)
    kept_pairs = np.argsort(-pair_strength)[:Kp]
    kept_views = set((kept_pairs // (P // 2)).tolist())
    print(f"kept views (top {Kp} peaks): {sorted(kept_views)}")

    for name, idx in (("a", 5), ("b", 6)):
        best = sorted(rows, key=lambda r: r[idx][1])[:8]
        print(f"\nbest inits vs {name} (rot deg / trans mm, votes, "
              f"valid, ncorr, kept):")
        for v, p, vt, ok, nk, ea, eb in best:
            e = ea if name == "a" else eb
            print(f"  view={v:2d} p={p} rot={e[0]:7.2f} "
                  f"trans={e[1]*1000:7.1f} votes={vt:6.1f} valid={ok} "
                  f"ncorr={nk:4d} kept={v in kept_views}")

    # vote ranking context: strongest (view, peak) pairs overall
    print("\ntop-28 (view, peak) pairs by votes:")
    for pk in np.argsort(-pair_strength)[:28]:
        v = int(pk // (P // 2))
        p0 = int((pk % (P // 2)) * 2)
        best_a = min(rows[v * P + p0 + j][5][1] for j in range(2))
        best_b = min(rows[v * P + p0 + j][6][1] for j in range(2))
        print(f"  view={v:2d} peak={p0 // 2} "
              f"votes={pair_strength[pk]:6.1f} "
              f"besttrans a={best_a*1000:7.1f}mm b={best_b*1000:7.1f}mm")


if __name__ == "__main__":
    main()
