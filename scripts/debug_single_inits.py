"""Hough-init quality on the PASSING single-instance bench frame.

Companion to debug_multi_instance.py: dumps the per-view instance-table
rotation/translation errors vs the single ground-truth pose, to answer
whether the accepted 0.35° result starts from phase-correct Hough inits
or is rescued downstream. Run on the TPU.
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
from bench import _err


def main():
    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    # the multi section's shapes so every executable is shared with
    # debug_multi_instance.py (capacities only pad; semantics unchanged)
    dbg_cfg = dataclasses.replace(
        det_cfg, coverage_accept=0.0, max_instances_per_view=4,
        max_candidates=16, refine_top=6,
        scene_capacity=8192, scene_key_capacity=1024)

    from tpu_joints.core.transforms import compose
    from tpu_joints.pipelines.detect import (
        _group_all_views, match_bank, prepare_scene)
    from tpu_joints.pipelines.ingest import ingest_organized_blocks

    wide_lo = jnp.array([-0.8, -0.6, 0.5], jnp.float32)
    wide_hi = jnp.array([0.8, 0.6, 1.7], jnp.float32)
    scene, normals, curv, n_sel = ingest_organized_blocks(
        jnp.asarray(xyz_img_h), jnp.asarray(valid_h), block=block,
        half_window=5, capacity=dbg_cfg.scene_capacity,
        crop_lo=wide_lo, crop_hi=wide_hi)
    print(f"working_set={int(n_sel)}")
    feats = jax.jit(prepare_scene, static_argnames=("cfg",))(
        scene, dbg_cfg, None, normals, curv)
    print(f"valid_keys={int(jnp.sum(feats.desc_valid))}")
    corrs = jax.jit(match_bank, static_argnames=("cfg",))(
        feats.desc, feats.desc_valid, bank.desc, bank.key_valid, dbg_cfg)
    inst = jax.jit(_group_all_views, static_argnames=("cfg",))(
        feats, bank, corrs, dbg_cfg)

    poses = np.asarray(inst.poses)
    votes = np.asarray(inst.votes)
    valid = np.asarray(inst.valid)
    bank_poses = np.asarray(bank.poses)
    V, P = votes.shape
    rows = []
    for v in range(V):
        for p in range(P):
            full = np.asarray(compose(jnp.asarray(poses[v, p]),
                                      jnp.asarray(bank_poses[v])))
            rows.append((v, p, votes[v, p], bool(valid[v, p]),
                         _err(full, T_pose)))
    Kv = dbg_cfg.max_candidates // P
    strength = np.where(valid, votes, -1.0).max(axis=1)
    kept = set(np.argsort(-strength)[:Kv].tolist())
    print(f"kept views: {sorted(kept)}")
    rows.sort(key=lambda r: r[4][1])
    print("best 12 inits vs T_pose:")
    for v, p, vt, ok, (rot, tr) in rows[:12]:
        print(f"  view={v:2d} p={p} rot={rot:7.2f} trans={tr*1000:7.1f} "
              f"votes={vt:6.1f} valid={ok} kept={v in kept}")
    good = [r for r in rows if r[4][0] < 30.0 and r[4][1] < 0.03]
    print(f"inits with rot<30deg & trans<30mm: {len(good)} "
          f"(kept: {sum(1 for r in good if r[0] in kept)})")


if __name__ == "__main__":
    main()
