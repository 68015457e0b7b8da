"""Record the collective schedule XLA actually emits for the DP×TP
detect_batch (VERDICT round-2 item 10).

Compiles ``detect_batch`` on the virtual 8-CPU mesh (data=4 × model=2)
with the production shardings from ``shard_inputs``, then inventories the
collective ops in the optimized HLO — what GSPMD really does for the
bank-sharded matching/grouping, not what we assume. Summary lands in
``docs/PARITY.md``; the full HLO is written to
``/tmp/detect_batch_hlo.txt`` for inspection.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/dump_tp_collectives.py
"""
from __future__ import annotations

import collections
import os
import re
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpu_joints.config import DetectionConfig
    from tpu_joints.core.cloud import make_cloud
    from tpu_joints.distributed import (
        detect_batch, make_mesh, shard_inputs, stack_clouds)
    from tpu_joints.modelbank import build_bank, render_views

    assert len(jax.devices()) == 8, "need 8 virtual devices"
    mesh = make_mesh(8, model_parallel=2)

    cfg = DetectionConfig(
        descriptor="shot", descr_rad=0.12, model_ss=0.04, scene_ss=0.04,
        normal_k=10, match_mode="nn", match_threshold=0.25,
        algorithm="hough", cg_size=0.05, cg_thresh=3.0,
        icp_iterations=5, max_candidates=2, max_instances_per_view=2,
        scene_capacity=512, scene_key_capacity=32, k_max=16,
    )
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, 400)
    h = rng.uniform(-0.2, 0.2, 400)
    chord = np.stack([h, 0.08 * np.cos(theta), 0.08 * np.sin(theta)], 1)
    model_xyz = chord.astype(np.float32)
    bank = build_bank(
        model_xyz, descriptor="shot", descr_radius=cfg.descr_rad,
        sampling_radius=cfg.model_ss, normal_k=cfg.normal_k, k_max=cfg.k_max,
        level=0, resolution=48, key_capacity=32)
    views, _, _ = render_views(model_xyz, level=0, resolution=48)
    scene = make_cloud(views[0], capacity=512)
    scenes = stack_clouds([scene] * 4)
    scenes, bank_sh = shard_inputs(scenes, bank, mesh)

    from tpu_joints.distributed.batch import (
        _detect_batch_gspmd, _detect_batch_shardmap)

    variants = {
        "gspmd": lambda: _detect_batch_gspmd.lower(scenes, bank_sh, cfg),
        "shard_map": lambda: _detect_batch_shardmap.lower(
            scenes, bank_sh, cfg, mesh),
    }
    for variant, lower in variants.items():
        hlo = lower().compile().as_text()
        with open(f"/tmp/detect_batch_hlo_{variant}.txt", "w") as f:
            f.write(hlo)
        inventory(variant, hlo)


def inventory(variant, hlo):

    pat = re.compile(
        r"(\S+) = (\S+) (all-gather|all-reduce|collective-permute|"
        r"reduce-scatter|all-to-all)\(")
    ops = collections.Counter()
    details = []
    for m in pat.finditer(hlo):
        _, shape, op = m.groups()
        ops[op] += 1
        if len(details) < 40:
            details.append(f"  {op:20s} -> {shape}")
    total_bytes = 0
    for m in re.finditer(
            r"= (\w+)\[([\d,]*)\][^=]*? (all-gather|all-reduce|"
            r"collective-permute|reduce-scatter|all-to-all)\(", hlo):
        dt, dims, _ = m.groups()
        sz = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2,
              "f64": 8, "s64": 8, "u64": 8, "f16": 2, "s8": 1, "u8": 1}
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total_bytes += n * sz.get(dt, 4)

    print(f"collective op inventory for detect_batch[{variant}] "
          f"(mesh data=4 x model=2, {len(hlo.splitlines())} HLO lines):")
    for op, n in sorted(ops.items()):
        print(f"  {op:20s} x{n}")
    print(f"  total collective payload ~{total_bytes / 1024:.1f} KiB")
    print("shapes (first 40):")
    print("\n".join(details))
    print(f"full HLO: /tmp/detect_batch_hlo_{variant}.txt")
    print()


if __name__ == "__main__":
    main()
