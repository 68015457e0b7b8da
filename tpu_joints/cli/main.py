"""Command-line entry points mirroring the reference programs (SURVEY.md A32).

The reference copy-pastes one ``parseCommandLine`` into ten programs
(``SHOT.cpp:81-143``: switches ``-k -c -r``, ``--algorithm Hough|GC``,
floats ``--model_ss --scene_ss --rf_rad --descr_rad --cg_size
--cg_thresh``) — and then every driver comments the call out and relies on
hard-coded per-file defaults and absolute paths (``SHOT.cpp:227``,
``:239``). Here: one argparse tree, the same flag names, presets named
after the reference programs, no hard-coded paths.

    python -m tpu_joints.cli render      # render.cpp — views + pose.txt
    python -m tpu_joints.cli bank        # CAD_desc.cpp — descriptor bank
    python -m tpu_joints.cli detect      # SHOT/SHOT_demo/6Dpose/... drivers
    python -m tpu_joints.cli scenes      # SHOT_scenes/SHOT_hypothesis loops
    python -m tpu_joints.cli segment     # segmentation.cpp — SAC plane+cyl
    python -m tpu_joints.cli crop        # crop_pcd.cpp — passthrough crop
    python -m tpu_joints.cli edges       # Edge_detection.cpp
    python -m tpu_joints.cli var-desc    # SHOT_VAR.cpp — variance descriptor
    python -m tpu_joints.cli visualize   # visualize.cpp — PCD → PNG
    python -m tpu_joints.cli serve       # the ROS detector node, as HTTP
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _sync_platform():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _load_points(path: str) -> np.ndarray:
    from tpu_joints.core.io import load_pcd, load_ply

    if path.endswith(".ply"):
        data, faces = load_ply(path)
        if faces is not None and len(faces):
            from tpu_joints.modelbank.scanner import sample_mesh

            return sample_mesh(data.xyz, faces, max(len(data) * 4, 20000))
        return data.xyz
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32).reshape(-1, 3)
    return load_pcd(path).xyz


def _save_points(path: str, xyz: np.ndarray) -> None:
    from tpu_joints.core.io import PointData, save_pcd

    save_pcd(path, PointData(xyz=np.asarray(xyz, np.float32)))


def _add_reference_flags(p: argparse.ArgumentParser) -> None:
    """The reference's flag set, same names (SHOT.cpp:81-143)."""
    p.add_argument("--preset", default="shot",
                   help="reference program preset (shot, shot_segment, "
                        "shot_demo, fpfh_demo, shot_hypothesis, 6dpose)")
    p.add_argument("--algorithm", choices=["Hough", "GC"], default=None)
    p.add_argument("--model_ss", type=float, default=None)
    p.add_argument("--scene_ss", type=float, default=None)
    p.add_argument("--rf_rad", type=float, default=None)
    p.add_argument("--descr_rad", type=float, default=None)
    p.add_argument("--cg_size", type=float, default=None)
    p.add_argument("--cg_thresh", type=float, default=None)
    p.add_argument("--match_threshold", type=float, default=None)
    p.add_argument("--scene_capacity", type=int, default=None)
    p.add_argument("--final_icp", type=int, default=None, dest="final_icp_iterations",
                   help="iterations of composed-pose ICP on the full CAD "
                        "(SHOT_demo's chained refinement; 0 disables)")
    p.add_argument("--no-segment", action="store_true",
                   help="disable region-growing scene segmentation")
    p.add_argument("--rg_backend", choices=["graph", "voxel"], default=None,
                   help="region-growing backend for unorganized scenes: "
                        "'graph' = PCL-style kNN graph (O(N^2) build); "
                        "'voxel' = bounded-cost coarse 3-D lattice "
                        "(segment.voxel) for big file-driven clouds")
    p.add_argument("-k", dest="use_keypoints", action="store_true",
                   help="(reference -k) show/use keypoints — accepted for parity")
    p.add_argument("-c", dest="show_correspondences", action="store_true",
                   help="(reference -c) visualize correspondence lines")
    p.add_argument("-r", dest="use_resolution", action="store_true",
                   help="(reference -r) scale radii by cloud resolution")


def _config_from_args(args) -> "DetectionConfig":
    from tpu_joints.config import PRESETS, DetectionConfig

    cfg = PRESETS.get(args.preset)
    if cfg is None:
        sys.exit(f"unknown preset {args.preset!r}; choose from {sorted(PRESETS)}")
    over = {}
    if args.algorithm:
        over["algorithm"] = args.algorithm.lower()
    for name in ("model_ss", "scene_ss", "rf_rad", "descr_rad", "cg_size",
                 "cg_thresh", "match_threshold", "scene_capacity",
                 "final_icp_iterations"):
        v = getattr(args, name)
        if v is not None:
            over[name] = v
    if getattr(args, "no_segment", False):
        over["segment_scene"] = False
    if getattr(args, "rg_backend", None):
        over["rg_backend"] = args.rg_backend
    return dataclasses.replace(cfg, **over) if over else cfg


# ---------------------------------------------------------------------------
# Subcommands
# ---------------------------------------------------------------------------

def cmd_render(args) -> None:
    """render.cpp: CAD → 42 partial views + pose file."""
    from tpu_joints.core.posefile import save_pose_file
    from tpu_joints.modelbank.scanner import render_views

    xyz = _load_points(args.model)
    views, poses, entropies = render_views(
        xyz, level=args.level, resolution=args.resolution, fov_deg=args.fov
    )
    os.makedirs(args.out, exist_ok=True)
    for i, v in enumerate(views):
        _save_points(os.path.join(args.out, f"{i}.pcd"), v)
    save_pose_file(os.path.join(args.out, "pose.txt"), poses)
    print(f"wrote {len(views)} views + pose.txt to {args.out} "
          f"(mean coverage {entropies.mean():.3f})")


def cmd_bank(args) -> None:
    """CAD_desc.cpp: render views + compute descriptors → .npz bank."""
    _sync_platform()
    from tpu_joints.modelbank import build_bank, save_bank

    xyz = _load_points(args.model)
    cfg = _config_from_args(args)
    bank = build_bank(
        xyz,
        descriptor=cfg.descriptor,
        descr_radius=cfg.descr_rad,
        rf_radius=cfg.rf_rad if cfg.descriptor == "fpfh" else None,
        sampling_radius=cfg.model_ss,
        normal_k=cfg.normal_k,
        k_max=cfg.k_max,
        # the FPFH surface semantics are part of the descriptor SPACE:
        # bank and scene must agree or nothing matches
        fpfh_surface=cfg.fpfh_surface,
        fpfh_k_max=cfg.fpfh_k_max,
        level=args.level,
        resolution=args.resolution,
        key_capacity=args.key_capacity,
    )
    save_bank(args.out, bank)
    print(f"bank: {bank.n_views} views, desc {tuple(bank.desc.shape)}, "
          f"hash {bank.params_hash} → {args.out}")
    if args.dump_txt:
        # the reference's bank artifact: one Partial_View<l>.txt per view,
        # one descriptor component per line, valid keypoints in order
        # (CAD_desc.cpp:354-370)
        os.makedirs(args.dump_txt, exist_ok=True)
        desc = np.asarray(bank.desc)
        valid = np.asarray(bank.key_valid)
        for l in range(bank.n_views):
            path = os.path.join(args.dump_txt, f"Partial_View{l}.txt")
            with open(path, "w") as f:
                for row in desc[l][valid[l]]:
                    f.write("\n".join(f"{v:g}" for v in row))
                    f.write("\n")
        print(f"dumped {bank.n_views} Partial_View<l>.txt files "
              f"→ {args.dump_txt}")


def _load_banks(args) -> dict:
    """--bank entries: 'path' or 'name=path' (repeatable, one per part —
    the reference's {chord, stub} loop, SHOT_demo.cpp:430-461)."""
    from tpu_joints.modelbank import load_bank

    banks = {}
    for i, entry in enumerate(args.bank):
        if "=" in entry:
            name, path = entry.split("=", 1)
        else:
            name, path = (os.path.splitext(os.path.basename(entry))[0]
                          if len(args.bank) > 1 else "model"), entry
        banks[name or f"part{i}"] = load_bank(path)
    return banks


def _apply_resolution(cfg, pts: np.ndarray):
    """Reference ``-r``: scale all radii by the scene's cloud resolution
    (mean nearest-neighbor spacing, ``SHOT.cpp:145-175`` + ``:277-287``)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from tpu_joints.neighbors import knn

    sub = pts[:: max(1, pts.shape[0] // 4096)]
    d, _ = knn(jnp.asarray(sub), jnp.asarray(sub), 1, exclude_self=True)
    res = float(np.sqrt(np.maximum(np.asarray(d)[:, 0], 0.0)).mean())
    if res <= 0:
        return cfg
    return dc.replace(
        cfg,
        model_ss=cfg.model_ss * res, scene_ss=cfg.scene_ss * res,
        rf_rad=cfg.rf_rad * res, descr_rad=cfg.descr_rad * res,
        cg_size=cfg.cg_size * res,
    )


def _detect_one(scene_path, banks, cfg, args):
    import jax

    from tpu_joints.core.cloud import make_cloud
    from tpu_joints.pipelines import detect, detect_parts

    pts = _load_points(scene_path)
    pts = pts[np.isfinite(pts).all(axis=1)]
    if getattr(args, "use_resolution", False):
        cfg = _apply_resolution(cfg, pts)
    if pts.shape[0] > cfg.scene_capacity:
        idx = np.linspace(0, pts.shape[0] - 1, cfg.scene_capacity).astype(np.int64)
        pts = pts[idx]
    scene = make_cloud(pts, capacity=cfg.scene_capacity)
    if getattr(args, "tree", 0) and len(banks) == 1:
        from tpu_joints.pipelines import detect_tree, make_view_clusters

        (part, bank), = banks.items()
        clusters = make_view_clusters(bank, n_clusters=args.tree)
        res = detect_tree(scene, bank, clusters, cfg)
    elif len(banks) == 1:
        (part, bank), = banks.items()
        res = detect(scene, bank, cfg)
    else:
        multi = detect_parts(scene, banks, cfg)
        part, res = multi.part, multi.result
    jax.block_until_ready(res.full_pose)
    return scene, part, res


def _print_result(name, res, part="model") -> None:
    T = np.asarray(res.full_pose)
    print(f"--- {name} [{part}]: accepted={bool(res.accepted)} "
          f"fitness={float(res.fitness):.6f} view={int(res.view_idx)} "
          f"corrs={int(res.n_corrs)}")
    # the reference prints R | t blocks per instance (SHOT.cpp:502-516)
    for i in range(4):
        print("    " + " ".join(f"{T[i, j]: 9.4f}" for j in range(4)))


def cmd_detect(args) -> None:
    """SHOT.cpp / SHOT_demo.cpp / 6Dpose.cpp: scene + bank(s) → 6D pose."""
    _sync_platform()
    cfg = _config_from_args(args)
    banks = _load_banks(args)
    scene, part, res = _detect_one(args.scene, banks, cfg, args)
    _print_result(os.path.basename(args.scene), res, part)
    if args.json:
        from tpu_joints.pipelines.detect import metrics_to_json

        m = metrics_to_json(res.metrics)
        print(json.dumps({"pose": np.asarray(res.full_pose).tolist(),
                          "part": part,
                          "fitness": float(res.fitness),
                          "accepted": bool(res.accepted), "metrics": m}))
    if args.png:
        from tpu_joints.core.transforms import transform_points
        from tpu_joints.viz import plot_detection

        bank = banks[part]
        v = int(res.view_idx)
        aligned = np.asarray(transform_points(bank.view_xyz[v], res.view_pose))
        corr_lines = None
        if getattr(args, "show_correspondences", False):
            # the reference's -c view (SHOT.cpp:524-581): green lines from
            # each matched model keypoint (at the detected pose) to its
            # scene keypoint
            corr_lines = _correspondence_lines(scene, bank, v, res, cfg)
        plot_detection(args.png, np.asarray(scene.xyz), np.asarray(scene.mask),
                       instances=[(aligned, np.asarray(bank.view_mask[v]))],
                       obb=res.obb, corr_lines=corr_lines,
                       title=os.path.basename(args.scene))
        print(f"wrote {args.png}")


def _correspondence_lines(scene, bank, view, res, cfg, max_lines=200):
    """Recompute the winning view's correspondences for the -c overlay
    (the pipeline returns poses, not per-pair indices — a viz-only path
    can afford one extra feature pass)."""
    from tpu_joints.core.transforms import transform_points
    from tpu_joints.pipelines.detect import match_bank, prepare_scene

    feats = prepare_scene(scene, cfg)
    sub_desc = bank.desc[view:view + 1]
    sub_valid = bank.key_valid[view:view + 1]
    corrs = match_bank(feats.desc, feats.desc_valid, sub_desc, sub_valid, cfg)
    ok = np.asarray(corrs.valid[0])
    midx = np.asarray(corrs.model_idx[0])[ok]
    skeys = np.asarray(feats.keys.xyz)[ok]
    mkeys = np.asarray(transform_points(bank.key_xyz[view], res.view_pose))[midx]
    lines = np.stack([mkeys, skeys], axis=1)  # [L, 2, 3]
    if lines.shape[0] > max_lines:
        lines = lines[:: lines.shape[0] // max_lines + 1]
    return lines


def cmd_scenes(args) -> None:
    """SHOT_scenes.cpp / SHOT_hypothesis.cpp: batch scene loop (+ HV)."""
    _sync_platform()
    import dataclasses as dc

    cfg = _config_from_args(args)
    if args.hv:
        cfg = dc.replace(cfg, hv_enabled=True)
    banks = _load_banks(args)
    n_good = 0
    for path in args.scene:
        _, part, res = _detect_one(path, banks, cfg, args)
        _print_result(os.path.basename(path), res, part)
        # SHOT_hypothesis prints a GOOD/bad verdict per instance (:653-720);
        # multi-instance scenes surface every distinct surviving candidate
        from tpu_joints.pipelines import good_instances

        verdict = "GOOD" if bool(res.accepted) else "bad"
        n_good += bool(res.accepted)
        print(f"    verdict: {verdict}")
        for j, k in enumerate(good_instances(res, cfg)):
            t = k["pose"][:3, 3]
            print(f"    instance {j} is GOOD! view={k['view_idx']} "
                  f"fitness={k['fitness']:.3e} "
                  f"t=({t[0]:.4f}, {t[1]:.4f}, {t[2]:.4f})")
    print(f"{n_good}/{len(args.scene)} scenes accepted")


def cmd_segment(args) -> None:
    """segmentation.cpp: PassThrough → RANSAC plane → RANSAC cylinder."""
    _sync_platform()
    import jax

    from tpu_joints.core.cloud import make_cloud
    from tpu_joints.features.normals import estimate_normals
    from tpu_joints.filters import passthrough
    from tpu_joints.segment import sac_cylinder, sac_plane

    pts = _load_points(args.scene)
    cloud = make_cloud(pts)
    cloud = passthrough(cloud, "z", args.zmin, args.zmax)  # segmentation.cpp:68-71
    normals, _ = estimate_normals(cloud, k=50)
    key = jax.random.PRNGKey(args.seed)
    plane = sac_plane(cloud, normals, key,
                      distance_threshold=args.plane_dist)
    remaining = cloud.with_mask(cloud.mask & ~plane.inliers)
    cyl = sac_cylinder(remaining, normals, key,
                       distance_threshold=args.cyl_dist,
                       radius_max=args.radius_max)
    xyz = np.asarray(cloud.xyz)
    pm = np.asarray(plane.inliers) & np.asarray(cloud.mask)
    cm = np.asarray(cyl.inliers) & np.asarray(remaining.mask)
    _save_points(args.plane_out, xyz[pm])
    _save_points(args.cylinder_out, xyz[cm])
    print(f"plane: {pm.sum()} inliers → {args.plane_out}; "
          f"cylinder: {cm.sum()} inliers (r≤{args.radius_max}) → {args.cylinder_out}")


def cmd_crop(args) -> None:
    """crop_pcd.cpp: axis-aligned passthrough crop of a PCD."""
    _sync_platform()
    from tpu_joints.core.cloud import make_cloud, to_numpy
    from tpu_joints.filters import passthrough

    cloud = make_cloud(_load_points(args.scene))
    cloud = passthrough(cloud, "x", args.xmin, args.xmax)
    cloud = passthrough(cloud, "z", args.zmin, args.zmax)
    out = to_numpy(cloud)
    _save_points(args.out, out)
    print(f"{out.shape[0]} points → {args.out}")


def cmd_edges(args) -> None:
    """Edge_detection.cpp: centroid-offset edge saliency."""
    _sync_platform()
    import time

    from tpu_joints.core.cloud import make_cloud
    from tpu_joints.features.edges import detect_edges
    from tpu_joints.filters import voxel_downsample

    cloud = make_cloud(_load_points(args.scene))
    if args.leaf > 0:
        cloud = voxel_downsample(cloud, args.leaf)
    t0 = time.perf_counter()
    edge_mask = np.asarray(detect_edges(cloud, k=args.k, threshold=args.threshold))
    dt = time.perf_counter() - t0
    xyz = np.asarray(cloud.xyz)
    m = edge_mask & np.asarray(cloud.mask)
    _save_points(args.out, xyz[m])
    # the reference prints the loop's wall-clock (Edge_detection.cpp:147-149)
    print(f"{m.sum()} edge points in {dt:.3f}s → {args.out}")


def cmd_var_desc(args) -> None:
    """SHOT_VAR.cpp: multi-scale normal-variance descriptor dump."""
    _sync_platform()
    from tpu_joints.core.cloud import make_cloud
    from tpu_joints.features.normals import estimate_normals
    from tpu_joints.features.variance import compute_variance_descriptor
    from tpu_joints.filters import compact_cloud, uniform_sample_mask

    cloud = make_cloud(_load_points(args.scene))
    normals, _ = estimate_normals(cloud, k=40)  # SHOT_VAR.cpp:324-330
    keep = uniform_sample_mask(cloud, args.sampling)
    keys, kidx = compact_cloud(cloud, keep, args.key_capacity)
    desc, valid = compute_variance_descriptor(
        keys, normals[np.asarray(kidx)], cloud, normals, radius=args.radius
    )
    d = np.asarray(desc)[np.asarray(valid)]
    # one float per line, like MarModel.txt/MarScene.txt (SHOT_VAR.cpp:486-511)
    with open(args.out, "w") as f:
        for row in d:
            for x in row:
                f.write(f"{x:.6f}\n")
    print(f"{d.shape[0]} keypoints × 3 scales → {args.out}")


def cmd_visualize(args) -> None:
    """visualize.cpp: PCD file(s) → PNG snapshot(s)."""
    from tpu_joints.viz import plot_detection

    for path in args.scene:
        png = os.path.splitext(path)[0] + ".png"
        xyz = _load_points(path)
        plot_detection(png, xyz, title=os.path.basename(path))
        print(f"wrote {png}")


def cmd_serve(args) -> None:
    """The streaming detector node as an HTTP server."""
    _sync_platform()
    from tpu_joints.modelbank import load_bank
    from tpu_joints.serve import serve_forever

    cfg = _config_from_args(args)
    warm = None
    if args.warm_depth:
        w, h = (int(v) for v in args.warm_depth.lower().split("x"))
        warm = (h, w)
    mesh = None
    if args.devices != 1:
        from tpu_joints.distributed.mesh import make_mesh

        mesh = make_mesh(None if args.devices == 0 else args.devices)
    serve_forever(load_bank(args.bank), cfg, host=args.host, port=args.port,
                  grasp_offset=tuple(args.grasp_offset), warm_depth=warm,
                  batch_max=args.batch_max, mesh=mesh)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="tpu_joints",
        description="TPU-native 6D pose estimation for industrial pipe joints",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="CAD → partial views + pose.txt")
    p.add_argument("model")
    p.add_argument("--out", default="views")
    p.add_argument("--level", type=int, default=1)
    p.add_argument("--resolution", type=int, default=100)
    p.add_argument("--fov", type=float, default=57.0)
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("bank", help="build a descriptor bank (.npz)")
    p.add_argument("model")
    p.add_argument("--out", default="bank.npz")
    p.add_argument("--level", type=int, default=1)
    p.add_argument("--resolution", type=int, default=100)
    p.add_argument("--key_capacity", type=int, default=256)
    p.add_argument("--dump-txt", dest="dump_txt", default=None,
                   metavar="DIR",
                   help="also write the reference's Partial_View<l>.txt "
                        "descriptor dumps (CAD_desc.cpp:354-370)")
    _add_reference_flags(p)
    p.set_defaults(fn=cmd_bank)

    p = sub.add_parser("detect", help="scene + bank(s) → 6D pose")
    p.add_argument("scene")
    p.add_argument("--bank", required=True, action="append",
                   help="bank .npz; repeatable as name=path for multi-part "
                        "detection (chord=..., stub=...)")
    p.add_argument("--tree", type=int, default=0, metavar="K",
                   help="coarse-to-fine cluster-tree search with K view "
                        "clusters (FPFH_scenes_clustered's two-layer policy)")
    p.add_argument("--json", action="store_true")
    p.add_argument("--png", default=None)
    _add_reference_flags(p)
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("scenes", help="batch scene evaluation loop")
    p.add_argument("scene", nargs="+")
    p.add_argument("--bank", required=True, action="append",
                   help="bank .npz; repeatable as name=path for multi-part")
    p.add_argument("--hv", action="store_true",
                   help="enable global hypothesis verification")
    _add_reference_flags(p)
    p.set_defaults(fn=cmd_scenes)

    p = sub.add_parser("segment", help="RANSAC plane + cylinder segmentation")
    p.add_argument("scene")
    p.add_argument("--zmin", type=float, default=0.0)
    p.add_argument("--zmax", type=float, default=1.5)
    p.add_argument("--plane_dist", type=float, default=0.03)
    p.add_argument("--cyl_dist", type=float, default=0.05)
    p.add_argument("--radius_max", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--plane_out", default="plane.pcd")
    p.add_argument("--cylinder_out", default="cylinder.pcd")
    p.set_defaults(fn=cmd_segment)

    p = sub.add_parser("crop", help="passthrough crop")
    p.add_argument("scene")
    p.add_argument("--out", default="cropped.pcd")
    p.add_argument("--xmin", type=float, default=-2.0)
    p.add_argument("--xmax", type=float, default=2.0)
    p.add_argument("--zmin", type=float, default=-2.0)
    p.add_argument("--zmax", type=float, default=2.0)
    p.set_defaults(fn=cmd_crop)

    p = sub.add_parser("edges", help="centroid-offset edge detection")
    p.add_argument("scene")
    p.add_argument("--out", default="edges.pcd")
    p.add_argument("--leaf", type=float, default=0.002)
    p.add_argument("-k", type=int, default=100, dest="k")
    p.add_argument("--threshold", type=float, default=0.004)
    p.set_defaults(fn=cmd_edges)

    p = sub.add_parser("var-desc", help="multi-scale variance descriptor dump")
    p.add_argument("scene")
    p.add_argument("--out", default="var_desc.txt")
    p.add_argument("--radius", type=float, default=0.05)
    p.add_argument("--sampling", type=float, default=0.01)
    p.add_argument("--key_capacity", type=int, default=512)
    p.set_defaults(fn=cmd_var_desc)

    p = sub.add_parser("visualize", help="PCD → PNG snapshots")
    p.add_argument("scene", nargs="+")
    p.set_defaults(fn=cmd_visualize)

    p = sub.add_parser("serve", help="HTTP detection server")
    p.add_argument("--bank", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8337)
    p.add_argument("--grasp_offset", type=float, nargs=3, default=[0.0, 0.0, 0.0],
                   help="added to the model centroid before replying "
                        "(the reference offsets x+1, z-0.8)")
    p.add_argument("--warm-depth", dest="warm_depth", default=None,
                   metavar="WxH",
                   help="pre-compile the fused depth-frame executable for "
                        "this sensor shape at startup (e.g. 640x480) - a "
                        "cold TPU compile takes minutes")
    p.add_argument("--batch-max", dest="batch_max", type=int, default=1,
                   help="micro-batch up to N concurrent depth frames into "
                        "one dispatch (1 = streaming)")
    p.add_argument("--devices", type=int, default=1,
                   help="shard batched dispatches over a device mesh: "
                        "N devices (0 = all visible); needs --batch-max>1")
    _add_reference_flags(p)
    p.set_defaults(fn=cmd_serve)

    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
