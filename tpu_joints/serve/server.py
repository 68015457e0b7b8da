"""Streaming detection server (SURVEY.md A30).

The reference's serving story is ROS: a detector node subscribes to
``/camera/depth_registered/points`` (``SHOT.cpp:598``), runs the pipeline in
the message callback, and — after an operator confirms — publishes a grasp
centroid for the robot controller on ``ModelPos`` as a ``Vector3`` at 10 Hz
(``FPFH_demo.cpp:434``, ``:890-915``). The TPU-native replacement is a
plain HTTP/JSON server wrapping the jitted pipeline:

  POST /detect   — body carries a scene (raw points, or a depth image that
                   is unprojected with the A31 math); response carries the
                   full 4×4 pose, fitness, acceptance, the grasp centroid
                   (the Vector3 of the reference, with its configurable
                   offset), per-stage metrics, and latency.
  GET  /healthz  — liveness + device info.

Design notes (SURVEY.md §5): requests are serialized through one lock
(single-writer; JAX is functional so there is nothing else to race);
malformed scenes return structured 4xx errors instead of the reference's
continue-with-stale-cloud hazard (``SHOT.cpp:260-265``); every response
embeds the per-stage metrics dict (counts/scores/latency) that replaces
printf observability.
"""
from __future__ import annotations

import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Tuple

import numpy as np

from tpu_joints.config import DetectionConfig
from tpu_joints.core.cloud import make_cloud
from tpu_joints.modelbank.bank import ModelBank
from tpu_joints.serve.depth import depth_to_cloud


class BadRequest(Exception):
    pass


def _decode_array(obj: dict, key: str) -> np.ndarray:
    """Accept either ``{key: nested list}`` or ``{key_b64, key_shape}``."""
    if key in obj:
        return np.asarray(obj[key], np.float32)
    b64 = obj.get(f"{key}_b64")
    shape = obj.get(f"{key}_shape")
    if b64 is None or shape is None:
        raise BadRequest(f"missing '{key}' (or '{key}_b64' + '{key}_shape')")
    try:
        raw = np.frombuffer(base64.b64decode(b64, validate=True), np.float32)
        return raw.reshape(shape).copy()
    except (ValueError, TypeError) as e:
        raise BadRequest(f"bad '{key}_b64' payload: {e}") from None


def scene_points_from_request(obj: dict) -> np.ndarray:
    """Extract [N, 3] scene points from a /detect body (points or depth)."""
    if "points" in obj or "points_b64" in obj:
        pts = _decode_array(obj, "points")
        if pts.ndim != 2 or pts.shape[1] != 3:
            raise BadRequest(f"points must be [N, 3], got {list(pts.shape)}")
        return pts
    if "depth" in obj or "depth_b64" in obj:
        depth = _decode_array(obj, "depth")
        if depth.ndim != 2:
            raise BadRequest(f"depth must be [H, W], got {list(depth.shape)}")
        xyz = depth_to_cloud(
            depth,
            fov_deg=float(obj.get("fov_deg", 57.0)),
            near=float(obj.get("near", 0.0)),
            far=float(obj.get("far", 0.0)),
        )
        return xyz.reshape(-1, 3)
    raise BadRequest("request needs 'points'/'points_b64' or 'depth'/'depth_b64'")


class Busy(Exception):
    """Too many requests already queued on the chip (HTTP 503)."""


class DetectionService:
    """The jitted pipeline behind the HTTP front — usable directly too.

    ``max_pending`` bounds the number of requests queued on the single
    chip: one runs, up to ``max_pending - 1`` wait, anything beyond gets
    an immediate 503 instead of an unbounded thread pile-up (the round-1
    server let N threads queue on one lock with no backpressure).
    """

    # error-code substrings treated as transient device/runtime blips worth
    # a bounded retry (tunnel resets, queue exhaustion, preempted programs);
    # anything else is a real bug and propagates immediately.
    # INVALID_ARGUMENT is deliberately included: the remote attachment's
    # transient faults surface under that code (measured; VERDICT round-2
    # item 9). A genuine argument bug also matching it costs only the
    # bounded max_retries × backoff before the 500 — acceptable against
    # silently dropping recoverable frames.
    TRANSIENT_ERRORS = ("INVALID_ARGUMENT", "RESOURCE_EXHAUSTED",
                        "UNAVAILABLE", "DEADLINE_EXCEEDED", "ABORTED")

    def __init__(
        self,
        bank: ModelBank,
        cfg: DetectionConfig = DetectionConfig(),
        grasp_offset: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        max_pending: int = 8,
        max_retries: int = 2,
        retry_backoff_s: float = 0.1,
        batch_max: int = 1,
        batch_window_ms: float = 4.0,
        mesh=None,
    ):
        self.bank = bank
        self.cfg = cfg
        # multi-chip serving: under a jax.sharding.Mesh the batched
        # dispatch shards its frame axis over the mesh's ``data`` axis
        # (each chip runs the full fused pipeline on its shard — zero
        # collectives; the reference's scene loop `SHOT_scenes.cpp:204-208`
        # scaled by running longer, this scales by running wider). The
        # bank is replicated once at construction, not per request.
        self.mesh = mesh
        self._mesh_bank = None
        if mesh is not None:
            if batch_max < 2:
                raise ValueError("mesh serving needs batch_max >= 2 "
                                 "(the data axis shards the batch)")
            import jax

            from tpu_joints.distributed.mesh import replicated

            self._mesh_bank = jax.device_put(bank, replicated(mesh))
        self.grasp_offset = np.asarray(grasp_offset, np.float32)
        self._lock = threading.Lock()
        self._slots = threading.BoundedSemaphore(max_pending)
        self.max_retries = max_retries
        self.retry_backoff_s = retry_backoff_s
        # batch_max > 1 turns on depth-frame micro-batching: concurrent
        # /detect depth requests coalesce into ONE batched dispatch
        # (detect_organized_batch) — dispatch latency amortizes across the
        # batch (serve.batching). 1 = off (every frame is its own dispatch).
        self.batch_max = int(batch_max)
        self.batch_window_ms = float(batch_window_ms)
        self._batchers: dict = {}
        self._batchers_lock = threading.Lock()
        self.n_requests = 0
        self.n_errors = 0
        self.n_rejected = 0
        self.n_retries = 0

    def warmup(self, depth_shape=None, fov_deg: float = 57.0) -> None:
        """Compile the pipeline before the first request lands.

        ``depth_shape=(H, W)`` additionally compiles the fused organized
        frame→pose executable for that sensor shape (a cold TPU compile
        takes minutes — far beyond any sane request timeout) by rendering
        the bank's first view into a synthetic depth frame.
        """
        dummy = np.zeros((16, 3), np.float32)
        self.detect_points(dummy)
        if depth_shape is not None:
            from tpu_joints.serve.depth import FakeDepthCamera

            H, W = depth_shape
            cam = FakeDepthCamera(width=W, height=H, fov_deg=fov_deg)
            pts = np.asarray(self.bank.view_xyz[0])[
                np.asarray(self.bank.view_mask[0])]
            depth = cam.render(pts, splat=3)
            self.detect_depth(depth, fov_deg=fov_deg)

    def detect_depth(self, depth: np.ndarray, fov_deg: float = 57.0,
                     near: float = 0.0, far: float = 0.0) -> dict:
        """Full-frame organized detection: a 640×480 depth image enters the
        pipeline WHOLE through the on-device organized ingest (stencil
        normals + density-preserving per-tile selection), never the
        stride-subsample fallback (VERDICT item 4; the reference's live
        path, ``ROS_server.cpp:2112-2176`` → ``SHOT.cpp:204``)."""
        import jax.numpy as jnp

        from tpu_joints.pipelines.detect import detect_organized
        from tpu_joints.serve.depth import depth_to_cloud

        depth = np.asarray(depth, np.float32)
        H, W = depth.shape
        xyz_img = depth_to_cloud(depth, fov_deg=fov_deg, near=near, far=far)
        valid = np.isfinite(xyz_img).all(axis=-1)
        cap = self.cfg.scene_capacity
        # one working-set point per block² tile, sized so a typical frame
        # (~50% surface pixels) fills the capacity; power-of-two blocks
        # keep the jit cache small across sensors
        block = 1
        while block < 16 and (H // (2 * block)) * (W // (2 * block)) > cap:
            block *= 2
        Hc, Wc = H - H % block, W - W % block
        if not (self.cfg.segment_scene or self.cfg.remove_plane):
            # sparse-frame EARLY-OUT on the host, before any device work:
            # the organized ingest keeps at most one point per block² tile,
            # so tiles-with-any-valid-pixel is an UPPER bound on the
            # working set — a tiny tile count can never feed the detector
            # and skipping the organized dispatch is always safe. The
            # bound errs only the other way (a splatted point render fills
            # tiles yet starves the stencil normals), which the post-run
            # survivor check below catches authoritatively. (A small
            # survivor count under segmentation is the crop chain doing
            # its job — table/clutter removed — never a fallback.)
            v = valid[:Hc, :Wc]
            n_tiles = int(v.reshape(Hc // block, block,
                                    Wc // block, block).any((1, 3)).sum())
            if n_tiles < min(64, cap // 8) and n_tiles < valid.sum() // 2:
                return self.detect_points(xyz_img[valid])
        img = jnp.asarray(np.nan_to_num(xyz_img[:Hc, :Wc]))
        vmask = jnp.asarray(valid[:Hc, :Wc])
        # ONE fused device program: ingest (+ the reference's lattice crop
        # chain when cfg.segment_scene/remove_plane are set) → features →
        # match → refine. Under a remote attachment every dispatch costs a
        # control-channel send (~10 ms measured on v5e-via-tunnel), so the
        # serving path uses the same one-dispatch executable as the bench.
        if self.batch_max > 1:
            res, latency_ms = self._batched_detect(img, vmask, block)
        else:
            def run():
                res, _n_sel = detect_organized(
                    img, vmask, self.bank, self.cfg, block=block,
                    half_window=5, fused=True)
                return res

            res, latency_ms = self._guarded(run)
        if not (self.cfg.segment_scene or self.cfg.remove_plane):
            # authoritative sparse-frame fallback: stencil normals reject
            # pixels on depth edges or with < 5-point windows, so a frame
            # that passed the tile-count early-out can still starve (e.g.
            # a splatted point render, not a real sensor surface). Reading
            # the survivor count costs nothing extra — _payload fetches
            # the metrics to host anyway.
            n_organized = int(np.asarray(res.metrics["scene_points"]))
            if (n_organized < min(64, cap // 8)
                    and n_organized < valid.sum() // 2):
                return self.detect_points(xyz_img[valid])
        return self._payload(res, latency_ms, self.cfg)

    def _batched_detect(self, img, vmask, block: int):
        """Route one organized frame through the micro-batcher (one
        ``FrameBatcher`` per frame shape × block, so every batch is
        shape-homogeneous and hits one compiled executable family)."""
        from tpu_joints.serve.batching import FrameBatcher

        key = (tuple(img.shape), block)
        with self._batchers_lock:
            batcher = self._batchers.get(key)
            if batcher is None:
                def run_batch(imgs, vms, _block=block):
                    import jax
                    import jax.numpy as jnp

                    from tpu_joints.pipelines.detect import (
                        detect_organized_batch)

                    bank = self.bank
                    n_pad = 0
                    if self.mesh is not None:
                        from tpu_joints.distributed.mesh import (
                            DATA_AXIS, scene_sharding)

                        # the frame axis must divide the data axis: pad by
                        # repeating the last frame (results sliced below —
                        # FrameBatcher only reads indices < its own count)
                        d = self.mesh.shape[DATA_AXIS]
                        n_pad = (-imgs.shape[0]) % d
                        if n_pad:
                            imgs = np.concatenate(
                                [imgs, np.repeat(imgs[-1:], n_pad, 0)])
                            vms = np.concatenate(
                                [vms, np.repeat(vms[-1:], n_pad, 0)])
                        sh = scene_sharding(self.mesh)
                        imgs = jax.device_put(jnp.asarray(imgs), sh)
                        vms = jax.device_put(jnp.asarray(vms), sh)
                        bank = self._mesh_bank

                    def go():
                        res, _ = detect_organized_batch(
                            jnp.asarray(imgs), jnp.asarray(vms), bank,
                            self.cfg, block=_block, half_window=5)
                        return res

                    # the leader is the single writer while it holds the
                    # lock; retry policy identical to the unbatched path
                    with self._lock:
                        return self._run_with_retry(go)

                batcher = FrameBatcher(run_batch, max_batch=self.batch_max,
                                       window_ms=self.batch_window_ms)
                self._batchers[key] = batcher
        if not self._slots.acquire(blocking=False):
            self.n_rejected += 1
            raise Busy("detection queue full")
        try:
            t0 = time.perf_counter()
            res = batcher.submit(np.asarray(img), np.asarray(vmask))
            latency_ms = (time.perf_counter() - t0) * 1000.0
            self.n_requests += 1
        finally:
            self._slots.release()
        return res, latency_ms

    @property
    def n_batches(self) -> int:
        return sum(b.n_batches for b in self._batchers.values())

    @property
    def n_batched_frames(self) -> int:
        return sum(b.n_batched_frames for b in self._batchers.values())

    def detect_points(self, pts: np.ndarray) -> dict:
        pts = np.asarray(pts, np.float32).reshape(-1, 3)
        cap = self.cfg.scene_capacity
        ingested = None
        try:
            from tpu_joints.native import ingest_native

            ingested = ingest_native(pts, cap)  # C++ NaN-filter + subsample + pad
        except Exception:
            ingested = None
        if ingested is not None:
            import jax.numpy as jnp

            from tpu_joints.core.cloud import Cloud

            out, mask, _ = ingested
            scene = Cloud(xyz=jnp.asarray(out), mask=jnp.asarray(mask),
                          rgb=jnp.zeros((cap, 3), jnp.float32))
        else:
            pts = pts[np.isfinite(pts).all(axis=1)]
            if pts.shape[0] > cap:
                # deterministic stride subsample to the pipeline's working set
                idx = np.linspace(0, pts.shape[0] - 1, cap).astype(np.int64)
                pts = pts[idx]
            scene = make_cloud(pts, capacity=cap)
        return self._detect_scene(scene)

    def _run_with_retry(self, fn):
        """Run a jitted detection thunk with bounded retry/backoff on
        transient runtime faults (the reference's failure story is
        continue-with-stale-cloud, ``SHOT.cpp:260-265``; round 2's was a
        single-shot INVALID_ARGUMENT retry — VERDICT item 9 broadens it to
        the transient-code family with exponential backoff)."""
        import jax

        last = None
        for attempt in range(self.max_retries + 1):
            try:
                # block inside the try so async faults surface to it
                res = fn()
                jax.block_until_ready(res.full_pose)
                return res
            except jax.errors.JaxRuntimeError as e:
                if not any(c in str(e) for c in self.TRANSIENT_ERRORS):
                    raise
                last = e
                if attempt < self.max_retries:
                    self.n_retries += 1
                    time.sleep(self.retry_backoff_s * (2 ** attempt))
        raise last

    def _guarded(self, fn):
        """Backpressure slot + single-writer lock + request timing around a
        retry-wrapped detection thunk. Returns (result, latency_ms)."""
        if not self._slots.acquire(blocking=False):
            self.n_rejected += 1
            raise Busy("detection queue full")
        try:
            with self._lock:
                t0 = time.perf_counter()
                res = self._run_with_retry(fn)
                latency_ms = (time.perf_counter() - t0) * 1000.0
                self.n_requests += 1
        finally:
            self._slots.release()
        return res, latency_ms

    def _detect_scene(self, scene, normals=None, curvature=None,
                      cfg=None) -> dict:
        from tpu_joints.pipelines.detect import detect

        eff = cfg or self.cfg
        # sync=False: the retry policy lives in _guarded/_run_with_retry
        # (detect's own sync=True single-shot retry would nest with it)
        res, latency_ms = self._guarded(lambda: detect(
            scene, self.bank, eff,
            scene_normals=normals, scene_curvature=curvature))
        return self._payload(res, latency_ms, eff)

    def _payload(self, res, latency_ms, cfg) -> dict:
        from tpu_joints.core.transforms import transform_points
        from tpu_joints.pipelines import good_instances
        from tpu_joints.pipelines.detect import \
            metrics_to_json as _metrics_to_json

        view = int(res.view_idx)
        aligned = np.asarray(
            transform_points(self.bank.view_xyz[view], res.view_pose)
        )
        vmask = np.asarray(self.bank.view_mask[view])
        centroid = aligned[vmask].mean(axis=0) if vmask.any() else np.zeros(3)
        return {
            "pose": np.asarray(res.full_pose).tolist(),
            "view_pose": np.asarray(res.view_pose).tolist(),
            "fitness": float(res.fitness),
            "full_fitness": float(res.full_fitness),
            "accepted": bool(res.accepted),
            "view_idx": view,
            "n_corrs": int(res.n_corrs),
            "grasp_centroid": (centroid + self.grasp_offset).tolist(),
            # every distinct GOOD instance (SHOT_hypothesis.cpp:653-721's
            # per-instance verdict loop) — multi-instance scenes report all
            "instances": [
                {"pose": k["pose"].tolist(), "view_idx": k["view_idx"],
                 "fitness": k["fitness"]}
                for k in good_instances(res, cfg)
            ],
            "obb": {
                "position": np.asarray(res.obb.position).tolist(),
                "rotation": np.asarray(res.obb.rotation).tolist(),
                "extents": np.asarray(res.obb.extents).tolist(),
                "euler_deg": np.degrees(np.asarray(res.obb.euler)).tolist(),
            },
            "metrics": _metrics_to_json(res.metrics),
            "latency_ms": round(latency_ms, 3),
        }

    def handle(self, obj: dict) -> dict:
        if "depth" in obj or "depth_b64" in obj:
            depth = _decode_array(obj, "depth")
            if depth.ndim != 2:
                raise BadRequest(
                    f"depth must be [H, W], got {list(depth.shape)}")
            return self.detect_depth(
                depth, fov_deg=float(obj.get("fov_deg", 57.0)),
                near=float(obj.get("near", 0.0)),
                far=float(obj.get("far", 0.0)))
        return self.detect_points(scene_points_from_request(obj))


def make_server(
    service: DetectionService, host: str = "127.0.0.1", port: int = 8337
) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        # a stalled client mid-read/write frees its worker thread after this
        # instead of pinning it forever (round-1 weakness)
        timeout = 30.0

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                import jax

                self._send(200, {
                    "status": "ok",
                    "device": str(jax.devices()[0]),
                    "devices": (int(service.mesh.devices.size)
                                if service.mesh is not None else 1),
                    "requests": service.n_requests,
                    "errors": service.n_errors,
                    "rejected": service.n_rejected,
                    "retries": service.n_retries,
                    "batches": service.n_batches,
                    "batched_frames": service.n_batched_frames,
                    "bank_views": int(service.bank.n_views),
                })
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/detect":
                self._send(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                obj = json.loads(self.rfile.read(n) or b"{}")
                self._send(200, service.handle(obj))
            except BadRequest as e:
                service.n_errors += 1
                self._send(400, {"error": str(e)})
            except Busy as e:
                self._send(503, {"error": str(e), "retry_after_s": 1})
            except json.JSONDecodeError as e:
                service.n_errors += 1
                self._send(400, {"error": f"invalid JSON: {e}"})
            except Exception as e:  # structured 500 instead of a dropped socket
                service.n_errors += 1
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet; metrics live in responses
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(
    bank: ModelBank,
    cfg: DetectionConfig = DetectionConfig(),
    host: str = "127.0.0.1",
    port: int = 8337,
    grasp_offset: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    warm_depth=None,
    batch_max: int = 1,
    mesh=None,
) -> None:
    service = DetectionService(bank, cfg, grasp_offset,
                               batch_max=batch_max, mesh=mesh)
    service.warmup(depth_shape=warm_depth)
    server = make_server(service, host, port)
    n_dev = mesh.devices.size if mesh is not None else 1
    print(f"tpu_joints detection server on http://{host}:{port} "
          f"(bank: {bank.n_views} views, {n_dev} device(s), "
          f"batch_max={service.batch_max})")
    server.serve_forever()
