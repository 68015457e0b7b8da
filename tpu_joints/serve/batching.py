"""Frame micro-batching for the detection server (steady-state serving).

The reference handles one frame per ROS callback (``SHOT.cpp:592-602``).
On TPU, dispatch latency — not device compute — bounds a one-frame-at-a-
time stream (measured 16.9 ms compute vs ~30 ms dispatch+sync under a
remote attachment; ``docs/PERFORMANCE.md``), so a saturated server should
drain its queue into ONE batched dispatch (``detect_organized_batch``)
and amortize the roundtrip across frames.

Leader–follower batching: every request thread enqueues its frame and
waits; the first thread to arrive becomes the leader, sleeps a short
``window_ms`` to let concurrent requests pile in, then runs the whole
queue as one batch and hands each waiter its result. Batches are padded
(by repeating the last frame) to the next power of two so the jit cache
holds ⌈log2(max_batch)⌉+1 executables instead of one per batch size.
"""
from __future__ import annotations

import threading
from typing import Callable, List, Optional

import numpy as np


def _pow2_bucket(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


class _Entry:
    __slots__ = ("img", "vmask", "done", "result", "error")

    def __init__(self, img, vmask):
        self.img = img
        self.vmask = vmask
        self.done = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


class FrameBatcher:
    """Collect concurrent same-shape frames into one batched dispatch.

    ``run_batch(imgs [B,H,W,3], vmasks [B,H,W]) -> result with leading
    batch axis`` is the only device-facing hook; index ``i`` of its return
    must be frame ``i``'s result (``jax.tree_util.tree_map(lambda a: a[i])``
    slices it). ``max_batch`` bounds one dispatch; ``window_ms`` is how
    long the leader waits for followers (0 = batch only what is already
    queued — still coalesces a backed-up queue).
    """

    def __init__(self, run_batch: Callable, max_batch: int = 8,
                 window_ms: float = 4.0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.run_batch = run_batch
        self.max_batch = int(max_batch)
        self.window_ms = float(window_ms)
        self._lock = threading.Lock()
        self._queue: List[_Entry] = []
        self._leader_busy = False
        self.n_batches = 0
        self.n_batched_frames = 0

    def submit(self, img: np.ndarray, vmask: np.ndarray):
        """Enqueue one frame; blocks until its result is ready."""
        e = _Entry(img, vmask)
        lead = False
        with self._lock:
            self._queue.append(e)
            if not self._leader_busy:
                self._leader_busy = True
                lead = True
        if lead:
            self._lead()
        e.done.wait()
        if e.error is not None:
            raise e.error
        return e.result

    def _lead(self):
        import time

        if self.window_ms > 0:
            time.sleep(self.window_ms / 1000.0)
        while True:
            with self._lock:
                batch = self._queue[: self.max_batch]
                del self._queue[: len(batch)]
                if not batch:
                    self._leader_busy = False
                    return
            self._run(batch)

    def _run(self, batch: List[_Entry]):
        import jax

        try:
            B = _pow2_bucket(len(batch), self.max_batch)
            imgs = [e.img for e in batch] + [batch[-1].img] * (B - len(batch))
            vms = [e.vmask for e in batch] + [batch[-1].vmask] * (B - len(batch))
            out = self.run_batch(np.stack(imgs), np.stack(vms))
            # one sync for the whole batch, then slice per frame
            out = jax.block_until_ready(out)
            self.n_batches += 1
            self.n_batched_frames += len(batch)
            for i, e in enumerate(batch):
                e.result = jax.tree_util.tree_map(lambda a, i=i: a[i], out)
        except BaseException as err:  # noqa: BLE001 — delivered to waiters
            for e in batch:
                e.error = err
        finally:
            for e in batch:
                e.done.set()
