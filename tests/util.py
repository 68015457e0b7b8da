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


def knobby_joint_points(rng, n_chord=700, n_stub=400, n_knob=150, jitter=0.0):
    """Joint with distinctive corner features (orthogonal plate pairs) — for
    descriptors (FPFH) that can't disambiguate positions along smooth
    cylinder bodies, and for LRFs that are degenerate on spheres/cylinders.
    Corners give both distinctive histograms and stable reference frames."""
    xyz, nrm = joint_points(rng, n_chord=n_chord, n_stub=n_stub, jitter=jitter)
    feats_xyz, feats_n = [], []
    specs = [  # (center, yaw about z) — distinct placements
        (np.array([-0.24, 0.0, 0.10]), 0.3),
        (np.array([0.24, 0.06, -0.06]), 1.4),
        (np.array([0.02, -0.10, -0.02]), 2.5),
        (np.array([0.10, 0.04, 0.30]), 4.0),
    ]
    n_half = max(n_knob // 2, 10)
    for c, yaw in specs:
        R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                      [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]], np.float32)
        # two orthogonal plates meeting at an edge (an L-bracket corner)
        u = rng.uniform(0, 0.09, n_half)
        v = rng.uniform(-0.04, 0.04, n_half)
        p1 = np.stack([u, v, np.zeros(n_half)], 1)           # z=0 plate
        n1 = np.tile([0.0, 0.0, 1.0], (n_half, 1))
        u2 = rng.uniform(0, 0.09, n_half)
        v2 = rng.uniform(-0.04, 0.04, n_half)
        p2 = np.stack([np.zeros(n_half), v2, u2], 1)          # x=0 plate
        n2 = np.tile([1.0, 0.0, 0.0], (n_half, 1))
        pts = np.concatenate([p1, p2]) @ R.T + c
        ns = np.concatenate([n1, n2]) @ R.T
        feats_xyz.append(pts)
        feats_n.append(ns)
    xyz = np.concatenate([xyz] + feats_xyz).astype(np.float32)
    nrm = np.concatenate([nrm] + feats_n).astype(np.float32)
    return xyz, nrm


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


def joint_cylinders():
    """The joint_points geometry as analytic (center, axis, radius,
    half_length) cylinders, for dense depth raycasting."""
    a = np.radians(30.0)
    stub_axis = np.array([np.sin(a), 0.0, np.cos(a)])
    return [
        (np.zeros(3), np.array([1.0, 0.0, 0.0]), 0.08, 0.3),
        (np.array([0.0, 0.0, 0.23]), stub_axis, 0.05, 0.15),
    ]


def raycast_joint(T_model_to_cam, width=320, height=240, fov_deg=57.0):
    """Dense organized camera-frame cloud of the joint (NaN at misses)."""
    from tpu_joints.serve.depth import raycast_cylinders

    return raycast_cylinders(joint_cylinders(), T_model_to_cam,
                             width=width, height=height, fov_deg=fov_deg)


_KNOB_SPECS = [  # (center, yaw about z) — keep in sync with knobby_joint_points
    (np.array([-0.24, 0.0, 0.10]), 0.3),
    (np.array([0.24, 0.06, -0.06]), 1.4),
    (np.array([0.02, -0.10, -0.02]), 2.5),
    (np.array([0.10, 0.04, 0.30]), 4.0),
]


def knobby_joint_parts(rng, n_chord=700, n_stub=400, n_knob=150):
    """The knobby joint split into its two CAD parts (the reference's
    {chord, stub} pieces, ``SHOT_demo.cpp:430-461``): the chord cylinder
    WITH its bracket features, and the inclined stub cylinder.

    Returns ``{"chord": xyz, "stub": xyz}`` in the shared joint frame.
    """
    chord, _ = cylinder_points(rng, radius=0.08, height=0.6, n=n_chord,
                               axis="x")
    stub, _ = cylinder_points(rng, radius=0.05, height=0.3, n=n_stub,
                              axis="z")
    a = np.radians(30.0)
    R30 = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                    [-np.sin(a), 0, np.cos(a)]], np.float32)
    stub = stub @ R30.T + np.array([0, 0, 0.08 + 0.15], np.float32)
    feats = []
    n_half = max(n_knob // 2, 10)
    for c, yaw in _KNOB_SPECS:
        R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                      [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]], np.float32)
        u = rng.uniform(0, 0.09, n_half)
        v = rng.uniform(-0.04, 0.04, n_half)
        p1 = np.stack([u, v, np.zeros(n_half)], 1)
        u2 = rng.uniform(0, 0.09, n_half)
        v2 = rng.uniform(-0.04, 0.04, n_half)
        p2 = np.stack([np.zeros(n_half), v2, u2], 1)
        feats.append(np.concatenate([p1, p2]) @ R.T + c)
    return {
        "chord": np.concatenate([chord] + feats).astype(np.float32),
        "stub": stub.astype(np.float32),
    }


def knobby_joint_primitives():
    """The knobby joint as analytic raycast primitives: the two cylinders
    plus the bracket plates as bounded rectangles (for
    ``serve.depth.raycast_cylinders``)."""
    cylinders = joint_cylinders()
    rects = []
    for c, yaw in _KNOB_SPECS:
        R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                      [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]], np.float32)
        # z=0 plate: u ∈ [0, 0.09] along x, v ∈ [-0.04, 0.04] along y
        rects.append((R @ np.array([0.045, 0.0, 0.0], np.float32) + c,
                      R @ np.array([1.0, 0.0, 0.0], np.float32),
                      R @ np.array([0.0, 1.0, 0.0], np.float32),
                      0.045, 0.04))
        # x=0 plate: u ∈ [0, 0.09] along z, v ∈ [-0.04, 0.04] along y
        rects.append((R @ np.array([0.0, 0.0, 0.045], np.float32) + c,
                      R @ np.array([0.0, 0.0, 1.0], np.float32),
                      R @ np.array([0.0, 1.0, 0.0], np.float32),
                      0.045, 0.04))
    return cylinders, rects
