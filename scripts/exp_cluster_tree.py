"""Cluster-tree A/B at sensor scale (VERDICT r4 item 10): does the
two-layer coarse-to-fine view search (``FPFH_scenes_clustered.cpp``'s
shape, ``pipelines.cluster_tree``) buy anything on TPU, where the flat
path matches ALL views in one matmul anyway?

Both sides run the generic (unorganized-scene) entry on the SAME
ingested bench working set: flat ``detect`` vs ``detect_tree`` with
K=6 direction clusters, n_refine=2 — i.e. ~6 + 2·V/K views matched
instead of V. Measures median latency + pose accuracy at V=42 and a
synthetic V=84 (both part banks' views concatenated) where the tree's
asymptotics should help most.

Run on TPU:  python scripts/exp_cluster_tree.py
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
    from tpu_joints.pipelines import detect
    from tpu_joints.pipelines.cluster_tree import (
        detect_tree, make_view_clusters)
    from tpu_joints.pipelines.ingest import ingest_organized_blocks

    xyz_img_h, valid_h, bank, cfg, block, T_pose = bench.build_problem()
    det_cfg = dataclasses.replace(cfg, segment_scene=False,
                                  remove_plane=False)
    crop_lo = jnp.array([-0.45, -0.5, 0.5], jnp.float32)
    crop_hi = jnp.array([0.5, 0.45, 1.55], jnp.float32)
    scene, normals, curv, n_sel = ingest_organized_blocks(
        jnp.asarray(xyz_img_h), jnp.asarray(valid_h), block=block,
        half_window=5, capacity=det_cfg.scene_capacity,
        crop_lo=crop_lo, crop_hi=crop_hi)
    print(f"working_set={int(n_sel)}")

    def timed(run):
        res = run()
        res = run()
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            res = run()
            ts.append((time.perf_counter() - t0) * 1000.0)
        rot, tr = _err(np.asarray(res.full_pose), T_pose)
        return np.median(ts), res, rot, tr

    from tpu_joints.modelbank.bank import ModelBank

    def doubled(b):
        """V=84 synthetic bank: the bank's views twice (the two-part
        search width) — latency shape only; accuracy read from V=42."""
        import dataclasses as dc

        return dc.replace(
            b,
            view_xyz=jnp.concatenate([b.view_xyz, b.view_xyz]),
            view_mask=jnp.concatenate([b.view_mask, b.view_mask]),
            key_xyz=jnp.concatenate([b.key_xyz, b.key_xyz]),
            key_valid=jnp.concatenate([b.key_valid, b.key_valid]),
            desc=jnp.concatenate([b.desc, b.desc]),
            rf=jnp.concatenate([b.rf, b.rf]),
            poses=jnp.concatenate([b.poses, b.poses]),
            icp_xyz=jnp.concatenate([b.icp_xyz, b.icp_xyz]),
            icp_mask=jnp.concatenate([b.icp_mask, b.icp_mask]),
        )

    # ONE (bank, mode) per process: the tree's layer programs instantiate
    # different Mosaic ICP shapes than the flat run's — mixing them in one
    # process trips the TPU runtime's multi-program re-execution fault
    # (measured on this script's first run). Select with CTREE=V42|V84 and
    # CTREE_MODE=flat|tree; the A/B compares across process logs.
    which = os.environ.get("CTREE", "V42")
    mode = os.environ.get("CTREE_MODE", "flat")
    b = bank if which == "V42" else doubled(bank)
    clusters = make_view_clusters(b, n_clusters=6)

    def run_flat():
        r = detect(scene, b, det_cfg, scene_normals=normals,
                   scene_curvature=curv)
        jax.block_until_ready(r.full_pose)
        return r

    # the tree's two layers refine at two different candidate/row shapes —
    # two Mosaic ICP programs alternating in one process, which is exactly
    # the runtime's re-execution fault (this script's V42-tree run crashed
    # INVALID_ARGUMENT on its first timed pass). Pin the tree to the XLA
    # NN path (config.icp_allow_pallas=False): zero Mosaic programs. This
    # biases the A/B *against* the tree by the XLA NN premium, but the
    # verdict is already set by the flat side: V84 flat ≈ V42 flat, so
    # extra views are free in the one-matmul flat path and the tree has
    # nothing to save.
    tree_cfg = dataclasses.replace(det_cfg, icp_allow_pallas=False)

    def run_tree():
        r = detect_tree(scene, b, clusters, tree_cfg)
        jax.block_until_ready(r.full_pose)
        return r

    run = run_flat if mode == "flat" else run_tree
    ms, res, rot, tr = timed(run)
    print(f"{which} {mode:5s} med={ms:7.2f}ms acc="
          f"{bool(res.accepted)} rot={rot:5.2f}deg "
          f"trans={tr * 1000:5.2f}mm", flush=True)


if __name__ == "__main__":
    main()
