"""Bisect the detect() megajit to find where the unaccounted latency lives."""
from __future__ import annotations

import functools
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


def timeit(name, fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:34s} {np.median(ts):10.2f} ms", flush=True)
    return out


def main():
    from tpu_joints.core.cloud import Cloud
    from tpu_joints.pipelines.detect import _group_all_views, match_bank, prepare_scene
    from tpu_joints.recognize.icp import icp

    scene, bank, cfg = bench.build_problem()
    print(f"view_capacity={bank.view_xyz.shape}", flush=True)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def upto_topk(scene, bank, cfg):
        feats = prepare_scene(scene, cfg)
        corrs = match_bank(feats.desc, feats.desc_valid, bank.desc, bank.key_valid, cfg)
        inst = _group_all_views(feats, bank, corrs, cfg)
        V = bank.desc.shape[0]
        P = cfg.max_instances_per_view
        C = cfg.max_candidates
        votes = jnp.where(inst.valid, inst.votes, -1.0).reshape(V * P)
        top_votes, top_flat = jax.lax.top_k(votes, C)
        return top_votes, top_flat, inst.poses.reshape(V * P, 4, 4)[top_flat]

    tv, tf, ci = timeit("A: prepare+match+group+topk", upto_topk, scene, bank, cfg)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def icp_only(scene, bank, cfg, cand_views, cand_init):
        def refine(view, T0):
            src = Cloud(xyz=bank.view_xyz[view], mask=bank.view_mask[view],
                        rgb=jnp.zeros_like(bank.view_xyz[view]))
            return icp(src, scene, T0, iterations=cfg.icp_iterations,
                       max_corr_dist=cfg.icp_max_corr_dist, chunk=1024)

        return jax.vmap(refine)(cand_views, cand_init)

    cand_views = tf // cfg.max_instances_per_view
    timeit("B: vmapped icp refine x4", icp_only, scene, bank, cfg, cand_views, ci)

    def refine1(view, T0):
        src = Cloud(xyz=bank.view_xyz[view], mask=bank.view_mask[view],
                    rgb=jnp.zeros_like(bank.view_xyz[view]))
        return icp(src, scene, T0, iterations=cfg.icp_iterations,
                   max_corr_dist=cfg.icp_max_corr_dist, chunk=1024)

    timeit("C: single icp via dynamic view", jax.jit(refine1), cand_views[0], ci[0])


if __name__ == "__main__":
    main()
