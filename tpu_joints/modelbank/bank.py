"""Descriptor-bank build + persistence (SURVEY.md A27).

The reference's offline prep: render 42 partial views, compute descriptors
per view, dump to ``Partial_View<l>.txt`` (``CAD_desc.cpp:354-370``), and
reload them implicitly in every pipeline run. Here the bank is a single
pytree of stacked padded arrays — [V, Mk, D] descriptors, [V, Mk, 3]
keypoints, [V, Mk, 3, 3] frames, [V, 4, 4] poses — which is exactly the
layout the batched matcher wants: the TPU pipeline matches a scene against
*all* views in one tiled matmul instead of the reference's 42-iteration
disk-reload loop (``SHOT.cpp:239-265``). Persisted as ``.npz`` with a
params hash for cache validity (SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

import dataclasses
import functools
import hashlib
import json
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_joints.core.cloud import Cloud, bucket_size, make_cloud
from tpu_joints.features.fpfh import compute_fpfh
from tpu_joints.features.lrf import board_lrf, shot_lrf
from tpu_joints.features.normals import estimate_normals
from tpu_joints.features.shot import compute_shot
from tpu_joints.filters import compact_cloud, uniform_sample_mask
from tpu_joints.modelbank.scanner import render_views
from tpu_joints.neighbors import radius_neighbors


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["view_xyz", "view_mask", "key_xyz", "key_valid", "desc", "rf",
                 "poses", "model_xyz", "model_mask", "icp_xyz", "icp_mask"],
    meta_fields=["params_hash"],
)
@dataclasses.dataclass(frozen=True)
class ModelBank:
    """Stacked per-view model data (all views padded to common capacity).

    A pytree: the arrays are jit-traceable data, ``params_hash`` is static
    metadata (part of the jit cache key, so two banks built with different
    parameters never share a stale executable).

    ``model_xyz/model_mask`` carry the (downsampled) full CAD cloud — the
    reference loads ``stubcad.pcd`` alongside the partial views
    (``SHOT_demo.cpp:245``) to run its final composed-pose ICP and the
    ``score2 < 0.006`` acceptance on the *full* model
    (``SHOT_demo.cpp:641-686``).
    """

    view_xyz: jnp.ndarray   # [V, Nv, 3] partial view clouds (camera frame)
    view_mask: jnp.ndarray  # [V, Nv]
    key_xyz: jnp.ndarray    # [V, Mk, 3] keypoints
    key_valid: jnp.ndarray  # [V, Mk] descriptor validity
    desc: jnp.ndarray       # [V, Mk, D]
    rf: jnp.ndarray         # [V, Mk, 3, 3] local reference frames
    poses: jnp.ndarray      # [V, 4, 4] model→camera ground truth (pose.txt)
    model_xyz: jnp.ndarray  # [Nm, 3] full CAD cloud (model frame)
    model_mask: jnp.ndarray # [Nm]
    icp_xyz: jnp.ndarray    # [V, Ni, 3] subsampled views for ICP refinement
    icp_mask: jnp.ndarray   # [V, Ni]
    params_hash: str = ""

    def model_cloud(self) -> Cloud:
        return Cloud(xyz=self.model_xyz, mask=self.model_mask,
                     rgb=jnp.zeros_like(self.model_xyz))

    @property
    def n_views(self) -> int:
        return self.view_xyz.shape[0]

    def view_cloud(self, v: int) -> Cloud:
        return Cloud(
            xyz=self.view_xyz[v],
            mask=self.view_mask[v],
            rgb=jnp.zeros_like(self.view_xyz[v]),
        )


def gather_views(bank: ModelBank, idx: jnp.ndarray) -> ModelBank:
    """Sub-bank of the given view indices (static count, traced values).

    The per-view arrays are gathered along the view axis; the full-CAD
    cloud and metadata are shared. Used by the coarse-to-fine cluster-tree
    search (SURVEY.md A29) to run the standard pipeline on a view subset.
    """
    idx = jnp.asarray(idx, jnp.int32)
    return ModelBank(
        view_xyz=bank.view_xyz[idx],
        view_mask=bank.view_mask[idx],
        key_xyz=bank.key_xyz[idx],
        key_valid=bank.key_valid[idx],
        desc=bank.desc[idx],
        rf=bank.rf[idx],
        poses=bank.poses[idx],
        model_xyz=bank.model_xyz,
        model_mask=bank.model_mask,
        icp_xyz=bank.icp_xyz[idx],
        icp_mask=bank.icp_mask[idx],
        params_hash=bank.params_hash,
    )


def _params_hash(params: dict) -> str:
    return hashlib.sha1(json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]


def build_bank(
    model_xyz: np.ndarray,
    descriptor: str = "shot",
    descr_radius: float = 0.02,
    rf_radius: Optional[float] = None,
    frames: str = "shot",
    rf_k_max: int = 256,
    surface_leaf: Optional[float] = None,
    sampling_radius: float = 0.01,
    normal_k: int = 40,
    normal_radius: float = 0.0,
    k_max: int = 128,
    fpfh_surface: str = "cloud",
    fpfh_k_max: int = 0,
    level: int = 1,
    resolution: int = 100,
    view_capacity: Optional[int] = None,
    key_capacity: int = 256,
    icp_capacity: int = 4096,
    views: Optional[List[np.ndarray]] = None,
    poses: Optional[np.ndarray] = None,
) -> ModelBank:
    """Render views of a CAD point set and compute its descriptor bank.

    Mirrors the reference's prep chain ``render.cpp`` → ``CAD_desc.cpp``
    (normals k=40 ``:283-289``, uniform sampling 0.01 ``:295-304``, SHOT
    ``:339-352``). Pass ``views``/``poses`` to skip rendering (e.g. when
    the partial views come from disk like ``stub_poses/<l>.pcd``).
    ``frames`` selects the Hough-voting LRF ("shot" or "board" — the
    reference pairs its descriptors with BOARD, ``SHOT.cpp:441-453``) and
    must match the detection config's ``rf_frames``.

    ``surface_leaf``: when set, each view is uniform-downsampled to this
    resolution before normals/keypoints/descriptors (the ICP clouds keep
    the full views). Descriptors computed over a ``k_max``-truncated
    radius support are only comparable between clouds of similar density —
    a bank view 3× denser than the scene working set truncates at a 3×
    smaller effective radius and its descriptors match nothing. Set this
    to the scene working-set resolution (e.g. the organized ingest's block
    pitch).
    """
    if rf_radius is None:
        rf_radius = descr_radius  # frames MUST match the scene side's rf_rad
    if views is None or poses is None:
        views, poses, _ = render_views(model_xyz, level=level, resolution=resolution)
    if view_capacity is None:
        view_capacity = bucket_size(max(max((v.shape[0] for v in views), default=1), 1))

    all_view_xyz, all_view_mask = [], []
    all_keys, all_valid, all_desc, all_rf = [], [], [], []
    for vxyz in views:
        cloud_full = make_cloud(vxyz, capacity=view_capacity)
        cloud = cloud_full
        if surface_leaf is not None:
            sel = uniform_sample_mask(cloud_full, surface_leaf)
            cloud, _ = compact_cloud(cloud_full, sel, view_capacity)
        if normal_radius > 0.0:
            # FPFH_demo.cpp:486-510: the model side also uses radius normals
            from tpu_joints.features.normals import estimate_normals_radius

            normals, _ = estimate_normals_radius(cloud, radius=normal_radius,
                                                 k_max=k_max)
        else:
            # offline prep: keep the bank build on plain-XLA kNN — it has
            # no latency requirement, and keeping its 42 per-view kNN
            # executions out of the Mosaic program mix avoids re-triggering
            # the (shape-dependent) TPU runtime re-execution fault that the
            # online pipeline's kernel set is validated against
            normals, _ = estimate_normals(cloud, k=normal_k,
                                          allow_pallas=False)
        keep = uniform_sample_mask(cloud, sampling_radius)
        keys, kidx = compact_cloud(cloud, keep, key_capacity)
        if descriptor == "shot":
            desc, rf, valid = compute_shot(keys, cloud, normals, radius=descr_radius, k_max=k_max)
            need_rf = frames != "shot"
        elif descriptor == "fpfh":
            fk = fpfh_k_max or k_max
            if fpfh_surface == "keys":
                # reference FPFH semantics: the VoxelGrid keypoints are
                # their own search surface (FPFH_demo.cpp:505-510) — must
                # match the detection config's fpfh_surface
                desc, valid = compute_fpfh(keys, normals[kidx], keys,
                                           normals[kidx],
                                           radius=descr_radius, k_max=fk)
            elif fpfh_surface == "cloud":
                desc, valid = compute_fpfh(keys, normals[kidx], cloud,
                                           normals, radius=descr_radius,
                                           k_max=fk)
            else:
                raise ValueError(f"unknown fpfh_surface {fpfh_surface!r}")
            rf = None
            need_rf = True
        else:
            raise ValueError(f"unknown descriptor {descriptor!r}")
        if need_rf:
            # Hough voting frames (the reference pairs its descriptors with
            # BOARD, FPFH_demo.cpp:548-585). The radius must equal the scene
            # side's ``rf_rad`` or votes from bank and scene frames land in
            # different accumulator bins.
            nidx, nwithin, _ = radius_neighbors(
                keys.xyz, cloud.xyz, rf_radius, max(k_max, rf_k_max),
                source_mask=cloud.mask
            )
            nvalid = nwithin & keys.mask[:, None]
            if frames == "board":
                rf, rf_ok = board_lrf(keys.xyz, normals[kidx], cloud.xyz[nidx],
                                      normals[nidx], nvalid, rf_radius)
            elif frames == "shot":
                rf, rf_ok = shot_lrf(keys.xyz, cloud.xyz[nidx], nvalid, rf_radius)
            else:
                raise ValueError(f"unknown frames {frames!r}")
            valid = valid & rf_ok
        all_view_xyz.append(cloud_full.xyz)
        all_view_mask.append(cloud_full.mask)
        all_keys.append(keys.xyz)
        all_valid.append(valid & keys.mask)
        all_desc.append(desc)
        all_rf.append(rf)

    params = dict(
        descriptor=descriptor, descr_radius=descr_radius, rf_radius=rf_radius,
        frames=frames, surface_leaf=surface_leaf,
        sampling_radius=sampling_radius, normal_k=normal_k,
        normal_radius=normal_radius, k_max=k_max,
        level=level, resolution=resolution, n_views=len(views),
    )
    # full CAD cloud for the composed-pose final ICP and the scene-coverage
    # discriminator (SHOT_demo.cpp:245, :641-686). Stored at up to 8192
    # points — denser than the ICP working rows because the coverage gate
    # compares scene→model NN distances against an absolute threshold, so
    # the stored model's own sampling tail must sit well inside it
    # (a view_capacity=1024 store put ~8% of on-surface points past 2 cm).
    # Deterministically SHUFFLED so that any prefix or lane stride is a
    # uniform spatial subsample (generator-ordered models are block-sorted
    # by part, which starved the stub in prefix truncations).
    model_xyz = np.asarray(model_xyz, np.float32).reshape(-1, 3)
    if model_xyz.shape[0] > 8192:
        sel = np.linspace(0, model_xyz.shape[0] - 1, 8192).astype(np.int64)
        model_xyz = model_xyz[sel]
    model_xyz = model_xyz[np.random.RandomState(0).permutation(
        model_xyz.shape[0])]
    model = make_cloud(model_xyz, capacity=max(model_xyz.shape[0], 1))
    view_xyz = jnp.stack(all_view_xyz)
    view_mask = jnp.stack(all_view_mask)
    icp_xyz, icp_mask = _subsample_views(view_xyz, view_mask, icp_capacity)
    return ModelBank(
        view_xyz=view_xyz,
        view_mask=view_mask,
        key_xyz=jnp.stack(all_keys),
        key_valid=jnp.stack(all_valid),
        desc=jnp.stack(all_desc),
        rf=jnp.stack(all_rf),
        poses=jnp.asarray(poses),
        model_xyz=model.xyz,
        model_mask=model.mask,
        icp_xyz=icp_xyz,
        icp_mask=icp_mask,
        params_hash=_params_hash(params),
    )


def _subsample_views(
    view_xyz: jnp.ndarray, view_mask: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Even-stride subsample of each view for the ICP refinement stage.

    ICP converges with a few thousand source points (the reference
    VoxelGrid-downsamples its models before ICP, ``SHOT_demo.cpp:489-502``);
    keeping the refinement source small is a 4-8× NN saving per iteration.
    """
    V, Nv, _ = view_xyz.shape
    cap = min(capacity, Nv)
    out_xyz = np.full((V, cap, 3), 1.0e6, np.float32)
    out_mask = np.zeros((V, cap), bool)
    xyz_h = np.asarray(view_xyz)
    mask_h = np.asarray(view_mask)
    for v in range(V):
        valid = np.flatnonzero(mask_h[v])
        take = min(cap, valid.size)
        if take:
            sel = valid[np.linspace(0, valid.size - 1, take).astype(np.int64)]
            out_xyz[v, :take] = xyz_h[v, sel]
            out_mask[v, :take] = True
    return jnp.asarray(out_xyz), jnp.asarray(out_mask)


def save_bank(path: str, bank: ModelBank) -> None:
    np.savez_compressed(
        path,
        view_xyz=np.asarray(bank.view_xyz),
        view_mask=np.asarray(bank.view_mask),
        key_xyz=np.asarray(bank.key_xyz),
        key_valid=np.asarray(bank.key_valid),
        desc=np.asarray(bank.desc),
        rf=np.asarray(bank.rf),
        poses=np.asarray(bank.poses),
        model_xyz=np.asarray(bank.model_xyz),
        model_mask=np.asarray(bank.model_mask),
        icp_xyz=np.asarray(bank.icp_xyz),
        icp_mask=np.asarray(bank.icp_mask),
        params_hash=np.asarray(bank.params_hash),
    )


def load_bank(path: str) -> ModelBank:
    z = np.load(path, allow_pickle=False)
    if "model_xyz" in z.files:
        model_xyz = jnp.asarray(z["model_xyz"])
        model_mask = jnp.asarray(z["model_mask"])
    else:  # banks saved before the full-CAD field existed
        nv = z["view_xyz"].shape[1]
        model_xyz = jnp.full((nv, 3), 1.0e6, jnp.float32)
        model_mask = jnp.zeros((nv,), bool)
    if "icp_xyz" in z.files:
        icp_xyz = jnp.asarray(z["icp_xyz"])
        icp_mask = jnp.asarray(z["icp_mask"])
    else:  # regenerate from the stored views
        icp_xyz, icp_mask = _subsample_views(
            jnp.asarray(z["view_xyz"]), jnp.asarray(z["view_mask"]), 4096
        )
    return ModelBank(
        view_xyz=jnp.asarray(z["view_xyz"]),
        view_mask=jnp.asarray(z["view_mask"]),
        key_xyz=jnp.asarray(z["key_xyz"]),
        key_valid=jnp.asarray(z["key_valid"]),
        desc=jnp.asarray(z["desc"]),
        rf=jnp.asarray(z["rf"]),
        poses=jnp.asarray(z["poses"]),
        model_xyz=model_xyz,
        model_mask=model_mask,
        icp_xyz=icp_xyz,
        icp_mask=icp_mask,
        params_hash=str(z["params_hash"]),
    )
