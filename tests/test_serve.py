"""Server-layer tests (SURVEY.md §4 'Server'): depth→cloud projection
round-trip against the fake camera, and the HTTP server end-to-end with a
fake scene — pose response, structured errors, health."""
import base64
import json
import threading
import urllib.request

import numpy as np
import pytest

from tpu_joints.serve import (
    DetectionService,
    FakeDepthCamera,
    depth_to_cloud,
    make_server,
)

from tests.util import joint_points


def test_depth_cloud_roundtrip():
    cam = FakeDepthCamera(width=160, height=120, fov_deg=57.0, near=0.05, far=5.0)
    rng = np.random.default_rng(0)
    pts = np.stack([
        rng.uniform(-0.2, 0.2, 400),
        rng.uniform(-0.15, 0.15, 400),
        rng.uniform(0.8, 1.2, 400),
    ], 1).astype(np.float32)
    organized = cam.cloud(pts)
    assert organized.shape == (120, 160, 3)
    got = organized.reshape(-1, 3)
    got = got[np.isfinite(got).all(axis=1)]
    assert got.shape[0] > 100
    # every recovered point lies near some input point (pixel quantization)
    d = np.linalg.norm(got[:, None, :] - pts[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 0.02, f"median reprojection error {np.median(d)}"


def test_depth_background_is_nan():
    cam = FakeDepthCamera(width=64, height=48)
    organized = cam.cloud(np.zeros((0, 3), np.float32))
    assert np.isnan(organized).all()


@pytest.fixture(scope="module")
def service():
    from tpu_joints.config import DetectionConfig
    from tpu_joints.modelbank import build_bank

    cfg = DetectionConfig(
        descriptor="shot", descr_rad=0.12, model_ss=0.04, scene_ss=0.04,
        normal_k=10, match_mode="nn", match_threshold=0.25,
        algorithm="hough", cg_size=0.05, cg_thresh=3.0,
        icp_iterations=5, max_candidates=2, max_instances_per_view=2,
        scene_capacity=1024, scene_key_capacity=64, k_max=24,
    )
    rng = np.random.default_rng(0)
    model_xyz, _ = joint_points(rng, n_chord=500, n_stub=300)
    bank = build_bank(
        model_xyz, descriptor="shot", descr_radius=cfg.descr_rad,
        sampling_radius=cfg.model_ss, normal_k=cfg.normal_k, k_max=cfg.k_max,
        level=0, resolution=64, key_capacity=48,
    )
    svc = DetectionService(bank, cfg)
    svc._model_xyz = model_xyz
    return svc


@pytest.fixture(scope="module")
def server_url(service):
    server = make_server(service, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_server_detect_and_health(server_url, service):
    from tpu_joints.modelbank import render_views

    views, poses, _ = render_views(service._model_xyz, level=0, resolution=64)
    v = int(np.argmax([w.shape[0] for w in views]))
    pts = views[v].astype(np.float32)

    body = {
        "points_b64": base64.b64encode(pts.tobytes()).decode(),
        "points_shape": list(pts.shape),
    }
    status, resp = _post(server_url + "/detect", body)
    assert status == 200, resp
    assert np.asarray(resp["pose"]).shape == (4, 4)
    assert resp["fitness"] < 0.01
    assert "grasp_centroid" in resp and len(resp["grasp_centroid"]) == 3
    assert resp["metrics"]["correspondences"] > 0
    assert resp["latency_ms"] > 0

    with urllib.request.urlopen(server_url + "/healthz") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["requests"] >= 1


def test_server_structured_errors(server_url):
    status, resp = _post(server_url + "/detect", {})
    assert status == 400 and "error" in resp

    status, resp = _post(server_url + "/detect", {"points": [[1, 2], [3, 4]]})
    assert status == 400 and "points must be" in resp["error"]

    status, resp = _post(server_url + "/nope", {})
    assert status == 404


def test_server_depth_request(server_url, service):
    from tpu_joints.core.transforms import transform_points
    from tpu_joints.modelbank import view_poses
    import jax.numpy as jnp

    poses = view_poses(service._model_xyz, level=0)
    cam_pts = np.asarray(
        transform_points(jnp.asarray(service._model_xyz), jnp.asarray(poses[0]))
    )
    cam = FakeDepthCamera(width=160, height=120, near=0.05, far=5.0)
    depth = cam.render(cam_pts, splat=3)   # dense, like a real sensor frame
    body = {
        "depth_b64": base64.b64encode(depth.tobytes()).decode(),
        "depth_shape": list(depth.shape),
        "fov_deg": cam.fov_deg, "near": cam.near, "far": cam.far,
    }
    status, resp = _post(server_url + "/detect", body)
    assert status == 200, resp
    assert resp["metrics"]["scene_points"] > 50


def test_server_depth_uses_organized_ingest(server_url, service, monkeypatch):
    """A depth frame must enter through the fused organized entry (stencil
    normals + per-tile selection inside ONE dispatch), never the
    stride-subsample fallback (VERDICT item 4; dispatch count is the
    serving bottleneck under a remote attachment)."""
    from tpu_joints.core.transforms import transform_points
    from tpu_joints.modelbank import view_poses
    import jax.numpy as jnp
    import sys

    import tpu_joints.pipelines.detect  # noqa: F401 - the package exports
    # a `detect` FUNCTION that shadows the submodule attribute
    detect_mod = sys.modules["tpu_joints.pipelines.detect"]

    calls = []
    real = detect_mod.detect_organized

    def counting(*a, **k):
        calls.append(k)
        return real(*a, **k)

    monkeypatch.setattr(detect_mod, "detect_organized", counting)

    poses = view_poses(service._model_xyz, level=0)
    cam_pts = np.asarray(
        transform_points(jnp.asarray(service._model_xyz), jnp.asarray(poses[0]))
    )
    cam = FakeDepthCamera(width=160, height=120, near=0.05, far=5.0)
    depth = cam.render(cam_pts, splat=3)   # dense, like a real sensor frame
    out = service.detect_depth(depth, fov_deg=cam.fov_deg, near=cam.near,
                               far=cam.far)
    assert len(calls) == 1, "depth path must use the organized entry"
    assert calls[0].get("fused") is True, "serving must be one dispatch"
    assert out["metrics"]["scene_points"] > 50


def test_server_depth_sparse_early_out(service, monkeypatch):
    """A depth frame whose valid pixels occupy only a handful of tiles is
    routed to the unordered path on the HOST — the organized dispatch
    (and its compile) is never paid. The tile count upper-bounds the
    organized working set, so the early-out can never starve a frame the
    organized path could have served."""
    import sys

    import tpu_joints.pipelines.detect  # noqa: F401 (submodule attr shadowed)
    detect_mod = sys.modules["tpu_joints.pipelines.detect"]

    calls = []
    real = detect_mod.detect_organized

    def counting(*a, **k):
        calls.append(k)
        return real(*a, **k)

    monkeypatch.setattr(detect_mod, "detect_organized", counting)

    depth = np.zeros((120, 160), np.float32)   # 0 = invalid for depth_to_cloud
    depth[60:68, 80:88] = 1.0                  # one dense 8x8 patch: 4 tiles
    out = service.detect_depth(depth, fov_deg=57.0)
    assert calls == [], "sparse frame must take the host early-out"
    assert "pose" in out and "fitness" in out   # structured payload, no crash


def test_server_backpressure_503(server_url, service):
    """Requests beyond the pending bound get an immediate 503, not an
    unbounded queue on the chip (round-1 weakness)."""
    # exhaust every slot, then one more request must be rejected
    n = 0
    while service._slots.acquire(blocking=False):
        n += 1
    try:
        status, resp = _post(server_url + "/detect",
                             {"points": [[0.0, 0.0, 1.0]] * 32})
        assert status == 503 and "error" in resp
        health = json.loads(
            __import__("urllib.request", fromlist=["urlopen"]).urlopen(
                server_url + "/healthz", timeout=30).read())
        assert health["rejected"] >= 1
    finally:
        for _ in range(n):
            service._slots.release()

def test_server_retries_transient_faults(server_url, service, monkeypatch):
    """VERDICT round-2 item 9: transient runtime faults (tunnel blips,
    RESOURCE_EXHAUSTED) get a bounded retry with backoff instead of an
    instant 500, and the retry count surfaces in /healthz. A persistent
    non-transient error must still fail immediately (no retry storm)."""
    import importlib

    import jax

    # the pipelines package re-exports the `detect` function under the
    # submodule's name, so attribute-style import grabs the function
    detect_mod = importlib.import_module("tpu_joints.pipelines.detect")

    real_detect = detect_mod.detect
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: transient tunnel blip (injected)")
        return real_detect(*args, **kwargs)

    monkeypatch.setattr(detect_mod, "detect", flaky)
    monkeypatch.setattr(service, "retry_backoff_s", 0.001)
    pts = np.asarray(service._model_xyz[:600], np.float32)
    before = service.n_retries
    status, resp = _post(server_url + "/detect", {"points": pts.tolist()})
    assert status == 200, resp
    assert calls["n"] == 2  # one fault, one successful retry
    assert service.n_retries == before + 1

    with urllib.request.urlopen(server_url + "/healthz") as r:
        health = json.loads(r.read())
    assert health["retries"] == service.n_retries

    # non-transient: fails straight through, exactly one attempt
    calls["n"] = 0

    def broken(*args, **kwargs):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("FAILED_PRECONDITION: real bug")

    monkeypatch.setattr(detect_mod, "detect", broken)
    status, resp = _post(server_url + "/detect", {"points": pts.tolist()})
    assert status == 500
    assert calls["n"] == 1


def test_server_segmented_depth_uses_lattice_crop(service, monkeypatch):
    """With a segmentation-enabled config, depth frames must route through
    the lattice crop front end (ingest_organized_segmented) and detect must
    NOT re-run the generic SAC/region-growing chain on the cropped scene
    (reference chain segmentation.cpp:94-110 + SHOT_demo.cpp:282-400)."""
    import dataclasses

    import sys

    import tpu_joints.pipelines.detect  # noqa: F401
    from tpu_joints.serve.depth import raycast_cylinders
    from tests.util import joint_cylinders

    seg_cfg = dataclasses.replace(
        service.cfg, segment_scene=True, remove_plane=True,
        rg_smoothness_deg=25.0, rg_max_edge=0.08, rg_min_cluster=30,
        cluster_max_curvature=0.15)
    svc = DetectionService(service.bank, seg_cfg)

    detect_mod = sys.modules["tpu_joints.pipelines.detect"]
    calls = []
    real = detect_mod.detect_organized

    def counting(*a, **k):
        calls.append(a[3])  # the cfg argument
        return real(*a, **k)

    monkeypatch.setattr(detect_mod, "detect_organized", counting)

    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.0, 0.0, 1.0]
    xyz_img = raycast_cylinders(
        joint_cylinders(), T, width=160, height=120,
        rects=[(np.array([0.0, 0.0, 0.4]), np.array([1.0, 0.0, 0.0]),
                np.array([0.0, 1.0, 0.0]), 0.5, 0.5)])
    depth = np.where(np.isfinite(xyz_img[..., 2]), xyz_img[..., 2], 0.0)
    out = svc.detect_depth(depth)
    assert len(calls) == 1, "segmented cfg must use the organized entry"
    # detect_organized owns the crop routing: it hands the FULL crop cfg to
    # the lattice ingest and strips it for the detect stage (its own tests
    # cover that split); the server must pass the crop flags through intact
    assert calls[0].segment_scene and calls[0].remove_plane
    assert out["metrics"]["scene_points"] > 30


def test_server_micro_batching_coalesces_frames(service):
    """Concurrent depth requests through a batch_max>1 service coalesce
    into batched dispatches (serve.batching leader–follower), stay on the
    organized path (no sparse fallback), and every frame's response
    matches the unbatched service's response.

    Frames are dense analytic raycasts (a splatted point render starves
    the stencil normals and would route BOTH services through the
    unorganized fallback, proving nothing about batching)."""
    import concurrent.futures

    from tpu_joints.serve.depth import raycast_cylinders

    a30 = np.radians(30.0)
    cylinders = [
        (np.zeros(3), np.array([1.0, 0.0, 0.0]), 0.08, 0.3),
        (np.array([0.0, 0.0, 0.23]),
         np.array([np.sin(a30), 0.0, np.cos(a30)]), 0.05, 0.15),
    ]
    frames = []
    for ay_deg in (35.0, -15.0):
        ay = np.radians(ay_deg)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                              [-np.sin(ay), 0, np.cos(ay)]], np.float32)
        T[:3, 3] = [0.02, -0.03, 1.0]
        xyz_img = raycast_cylinders(cylinders, T, width=160, height=120)
        frames.append(np.nan_to_num(xyz_img[..., 2]))  # depth image

    svc_b = DetectionService(service.bank, service.cfg, batch_max=4,
                             batch_window_ms=30.0)
    reqs = [frames[i % 2] for i in range(4)]
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(
            lambda d: svc_b.detect_depth(d, near=0.05, far=5.0), reqs))

    assert svc_b.n_requests == 4
    assert svc_b.n_batched_frames == 4
    # the 30 ms window must have coalesced at least once (fewer dispatches
    # than frames); exact grouping depends on thread scheduling
    assert svc_b.n_batches < 4, f"{svc_b.n_batches} dispatches for 4 frames"

    # responses must agree with the unbatched path frame for frame, and
    # both must have stayed organized (the fallback's working set would
    # show the full scene_capacity here)
    for i, out in enumerate(outs):
        ref = service.detect_depth(reqs[i], near=0.05, far=5.0)
        assert out["metrics"]["scene_points"] < service.cfg.scene_capacity
        assert out["metrics"]["scene_points"] == ref["metrics"]["scene_points"]
        assert out["accepted"] == ref["accepted"]
        assert out["view_idx"] == ref["view_idx"]
        a, b = np.asarray(out["pose"]), np.asarray(ref["pose"])
        Rd = a[:3, :3] @ b[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
        assert ang < 0.5 and np.linalg.norm(a[:3, 3] - b[:3, 3]) < 3e-3


def test_server_mesh_sharded_batching_matches_single_device(service):
    """Multi-chip serving: a ``mesh=`` service shards the batched dispatch's
    frame axis over the mesh's ``data`` axis (8 virtual CPU devices here),
    pads the batch to the axis size by repeating the last frame, and must
    return the SAME responses as the single-device batched path — DP over
    frames is pure replication, so any divergence is a sharding bug."""
    import concurrent.futures

    from tpu_joints.distributed.mesh import make_mesh
    from tpu_joints.serve.depth import raycast_cylinders

    a30 = np.radians(30.0)
    cylinders = [
        (np.zeros(3), np.array([1.0, 0.0, 0.0]), 0.08, 0.3),
        (np.array([0.0, 0.0, 0.23]),
         np.array([np.sin(a30), 0.0, np.cos(a30)]), 0.05, 0.15),
    ]
    frames = []
    for ay_deg in (35.0, -15.0, 10.0):
        ay = np.radians(ay_deg)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                              [-np.sin(ay), 0, np.cos(ay)]], np.float32)
        T[:3, 3] = [0.02, -0.03, 1.0]
        xyz_img = raycast_cylinders(cylinders, T, width=160, height=120)
        frames.append(np.nan_to_num(xyz_img[..., 2]))

    mesh = make_mesh()  # 8 CPU devices -> data=8, model=1
    svc_m = DetectionService(service.bank, service.cfg, batch_max=4,
                             batch_window_ms=30.0, mesh=mesh)
    # 3 frames: exercises the pad-to-data-axis path (3 -> 8)
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        outs = list(ex.map(
            lambda d: svc_m.detect_depth(d, near=0.05, far=5.0), frames))
    assert svc_m.n_batched_frames == 3

    svc_1 = DetectionService(service.bank, service.cfg, batch_max=4,
                             batch_window_ms=0.0)
    for i, out in enumerate(outs):
        ref = svc_1.detect_depth(frames[i], near=0.05, far=5.0)
        assert out["accepted"] == ref["accepted"]
        assert out["view_idx"] == ref["view_idx"]
        a, b = np.asarray(out["pose"]), np.asarray(ref["pose"])
        Rd = a[:3, :3] @ b[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(Rd) - 1) / 2, -1, 1)))
        assert ang < 0.5 and np.linalg.norm(a[:3, 3] - b[:3, 3]) < 3e-3


def test_server_mesh_requires_batching(service):
    from tpu_joints.distributed.mesh import make_mesh

    with pytest.raises(ValueError, match="batch_max"):
        DetectionService(service.bank, service.cfg, mesh=make_mesh())


def test_frame_batcher_error_delivery_and_pow2_padding():
    """Batcher unit contract: errors reach every waiter; partial batches
    pad to the next power of two; results map back to their frames."""
    import concurrent.futures

    from tpu_joints.serve.batching import FrameBatcher, _pow2_bucket

    assert [_pow2_bucket(n, 8) for n in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 8]

    calls = []

    def ok_batch(imgs, vms):
        calls.append(imgs.shape[0])
        return {"mean": imgs.mean(axis=(1, 2))}

    fb = FrameBatcher(ok_batch, max_batch=8, window_ms=20.0)
    frames = [np.full((4, 4), float(i), np.float32) for i in range(3)]
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        outs = list(ex.map(lambda f: fb.submit(f, f > -1), frames))
    for i, o in enumerate(outs):
        assert float(o["mean"]) == float(i)
    assert all(c in (1, 2, 4, 8) for c in calls)   # pow2 padding
    assert fb.n_batched_frames == 3

    def boom(imgs, vms):
        raise RuntimeError("device fell over")

    fb2 = FrameBatcher(boom, max_batch=4, window_ms=5.0)
    with concurrent.futures.ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(fb2.submit, frames[0], frames[0] > -1)
                for _ in range(2)]
        for f in futs:
            with pytest.raises(RuntimeError, match="fell over"):
                f.result()
