"""Shared synthetic-geometry helpers for tests.

The reference's subject is a pipe joint: a small cylinder ("stub") welded to
a larger one ("chord") — see SURVEY.md §0. These generators produce analytic
stand-ins with known ground truth.
"""
import numpy as np


def random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q.astype(np.float32)


def random_rigid(rng, t_scale=1.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = random_rotation(rng)
    T[:3, 3] = rng.normal(size=3).astype(np.float32) * t_scale
    return T


def cylinder_points(rng, radius=0.05, height=0.4, n=500, axis="z", jitter=0.0):
    """Points on a cylinder's lateral surface; returns (xyz, normals)."""
    theta = rng.uniform(0, 2 * np.pi, n)
    h = rng.uniform(-height / 2, height / 2, n)
    x = radius * np.cos(theta)
    y = radius * np.sin(theta)
    pts = np.stack([x, y, h], 1)
    nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)], 1)
    if axis == "x":
        pts = pts[:, [2, 0, 1]]
        nrm = nrm[:, [2, 0, 1]]
    elif axis == "y":
        pts = pts[:, [0, 2, 1]]
        nrm = nrm[:, [0, 2, 1]]
    if jitter:
        pts = pts + rng.normal(scale=jitter, size=pts.shape)
    return pts.astype(np.float32), nrm.astype(np.float32)


def joint_points(rng, n_chord=700, n_stub=400, jitter=0.0):
    """A Y-ish joint: horizontal chord cylinder + inclined stub cylinder.

    Returns (xyz float32[N,3], normals float32[N,3]).
    """
    chord, chord_n = cylinder_points(rng, radius=0.08, height=0.6, n=n_chord, axis="x", jitter=jitter)
    stub, stub_n = cylinder_points(rng, radius=0.05, height=0.3, n=n_stub, axis="z", jitter=jitter)
    # incline the stub 30° and seat it on the chord
    a = np.radians(30.0)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]], np.float32)
    stub = stub @ R.T + np.array([0, 0, 0.08 + 0.15], np.float32)
    stub_n = stub_n @ R.T
    xyz = np.concatenate([chord, stub]).astype(np.float32)
    nrm = np.concatenate([chord_n, stub_n]).astype(np.float32)
    return xyz, nrm
