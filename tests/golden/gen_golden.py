"""One-shot generator for the PCL-algorithm golden descriptor fixtures.

Provenance (run once, output committed as ``descriptors.npz``): PCL itself
is not installable in this environment (no network egress), so the golden
values come from this file — an INDEPENDENT, deliberately naive
re-implementation of PCL's SHOT-352 and FPFH-33 written as per-neighbor
Python loops straight from PCL's algorithm definitions
(``pcl/features/impl/shot.hpp`` ``interpolateSingleChannel`` /
``getLocalRF``, ``pcl/features/impl/fpfh.hpp``
``computePointSPFHSignature`` / ``weightPointSPFHSignature``,
``pcl::computePairFeatures``), including PCL's documented edge behaviors
(boundary mass loss, the ±0.5 azimuth clamp, the shape-adjacent ``% 10``
wrap, the ``dists == 0`` self-exclusion). It shares NO code or
vectorization structure with ``tpu_joints/features`` (einsum/one-hot
formulations there, scalar branch-per-neighbor loops here), so agreement
is a genuine two-implementation cross-check; the committed fixture then
pins the numbers against any future drift.

Reference artifact format being mirrored: the descriptor text dumps of
``/root/reference/CAD_desc.cpp:354-370`` (Partial_View<l>.txt — descriptor
values for offline inspection), reborn as an .npz with asserted tolerances.

Usage:  python tests/golden/gen_golden.py   (rewrites descriptors.npz)
"""
from __future__ import annotations

import os

import numpy as np

RADIUS_SHOT = 0.14
RADIUS_FPFH = 0.14
N_KEYS = 12


# ---------------------------------------------------------------------------
# fixture cloud: a two-cylinder joint, deterministic
# ---------------------------------------------------------------------------

def fixture_cloud():
    rng = np.random.default_rng(20260817)
    n_chord, n_stub = 260, 160
    theta = rng.uniform(0, 2 * np.pi, n_chord)
    h = rng.uniform(-0.3, 0.3, n_chord)
    chord = np.stack([h, 0.08 * np.cos(theta), 0.08 * np.sin(theta)], 1)
    theta2 = rng.uniform(0, 2 * np.pi, n_stub)
    h2 = rng.uniform(0.0, 0.15, n_stub)
    stub = np.stack([0.05 * np.cos(theta2), 0.05 * np.sin(theta2),
                     0.08 + h2], 1)
    xyz = np.concatenate([chord, stub]).astype(np.float64)
    # small jitter so no pair/axis alignment is ever exact
    xyz += rng.normal(0.0, 1e-4, xyz.shape)
    key_idx = np.linspace(5, xyz.shape[0] - 5, N_KEYS).astype(int)
    return xyz.astype(np.float32), key_idx


def pca_normals(xyz, k=12, viewpoint=(0.0, 0.0, 10.0)):
    """Plain loop PCA normals (PCL NormalEstimation semantics: smallest
    covariance eigenvector, oriented toward the viewpoint)."""
    vp = np.asarray(viewpoint)
    out = np.zeros_like(xyz, dtype=np.float64)
    for i, p in enumerate(xyz):
        d = np.linalg.norm(xyz - p, axis=1)
        nbrs = xyz[np.argsort(d)[:k]].astype(np.float64)
        c = nbrs.mean(axis=0)
        cov = (nbrs - c).T @ (nbrs - c) / k
        vals, vecs = np.linalg.eigh(cov)
        n = vecs[:, 0]
        if np.dot(n, vp - p) < 0:
            n = -n
        out[i] = n
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# SHOT-352 (PCL shot.hpp semantics, scalar loops)
# ---------------------------------------------------------------------------

def shot_lrf_np(p, nbrs, radius):
    """PCL getLocalRF: (radius - d)-weighted covariance about the KEYPOINT,
    eigenvectors, count-majority sign disambiguation (>= 0 convention)."""
    rel = (nbrs - p).astype(np.float64)
    d = np.linalg.norm(rel, axis=1)
    w = radius - d
    cov = (rel * w[:, None]).T @ rel / w.sum()
    _, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    x, z = vecs[:, 2], vecs[:, 0]

    def fix(axis):
        dots = rel @ axis
        pos = int((dots >= 0).sum())
        neg = len(dots) - pos
        if pos == neg:  # exact tie: fixture data must avoid this
            raise RuntimeError("LRF disambiguation tie in fixture")
        return axis if pos > neg else -axis

    x = fix(x)
    z = fix(z)
    return np.stack([x, np.cross(z, x), z])  # rows


def shot_np(p, rf, nbrs, nbr_normals, radius):
    """PCL interpolateSingleChannel, one branchy loop per neighbor."""
    shot = np.zeros(352)
    for q, nq in zip(nbrs, nbr_normals):
        rel = (q - p).astype(np.float64)
        dist = np.linalg.norm(rel)
        if dist <= 1e-9 or dist > radius:
            continue
        xl, yl, zl = rf @ rel
        cos = float(np.clip(np.dot(nq.astype(np.float64), rf[2]), -1.0, 1.0))
        bin_dist = (1.0 + cos) * 10 / 2.0
        step = int(np.floor(bin_dist + 0.5))
        resid = bin_dist - step

        az = np.arctan2(yl, xl)
        sel = min(int(np.floor((az + np.pi) / (np.pi / 4))), 7)
        rbit = 1 if dist > radius / 2 else 0
        ebit = 1 if zl > 0 else 0
        vol = sel * 4 + rbit * 2 + ebit

        int_w = 1.0 - abs(resid)
        if resid > 0:
            shot[vol * 11 + (step + 1) % 10] += resid  # PCL's %10 wrap
        else:
            shot[vol * 11 + (step - 1 + 10) % 10] += -resid

        if dist > radius / 2:  # outer husk
            rd = (dist - 0.75 * radius) / (radius / 2)
            if dist > 0.75 * radius:
                int_w += 1 - rd
            else:
                int_w += 1 + rd
                shot[(vol - 2) * 11 + step] += -rd
        else:
            rd = (dist - 0.25 * radius) / (radius / 2)
            if dist < 0.25 * radius:
                int_w += 1 + rd
            else:
                int_w += 1 - rd
                shot[(vol + 2) * 11 + step] += rd

        incl = np.arccos(np.clip(zl / dist, -1.0, 1.0))
        if incl > np.pi / 2:
            idd = (incl - 3 * np.pi / 4) / (np.pi / 2)
            if incl > 3 * np.pi / 4:
                int_w += 1 - idd
            else:
                int_w += 1 + idd
                shot[(vol + 1) * 11 + step] += -idd
        else:
            idd = (incl - np.pi / 4) / (np.pi / 2)
            if incl < np.pi / 4:
                int_w += 1 + idd
            else:
                int_w += 1 - idd
                shot[(vol - 1) * 11 + step] += idd

        if xl != 0.0 or yl != 0.0:
            center = -7 * np.pi / 8 + sel * np.pi / 4
            azd = float(np.clip((az - center) / (np.pi / 4), -0.5, 0.5))
            if azd > 0:
                int_w += 1 - azd
                adj = ((sel + 1) % 8) * 4 + rbit * 2 + ebit
                shot[adj * 11 + step] += azd
            else:
                int_w += 1 + azd
                adj = ((sel - 1 + 8) % 8) * 4 + rbit * 2 + ebit
                shot[adj * 11 + step] += -azd

        shot[vol * 11 + step] += int_w
    nrm = np.linalg.norm(shot)
    return shot / nrm if nrm > 0 else shot


# ---------------------------------------------------------------------------
# FPFH-33 (PCL fpfh.hpp semantics, scalar loops)
# ---------------------------------------------------------------------------

def pair_features_np(p1, n1, p2, n2):
    """pcl::computePairFeatures → (f1=θ, f2=α, f3=φ, ok)."""
    d = (p2 - p1).astype(np.float64)
    dist = np.linalg.norm(d)
    if dist == 0.0:
        return 0.0, 0.0, 0.0, False
    du = d / dist
    a1, a2 = float(n1 @ du), float(n2 @ du)
    if np.arccos(abs(np.clip(a1, -1, 1))) > np.arccos(abs(np.clip(a2, -1, 1))):
        ns, nt, du, f3 = n2, n1, -du, -a2
    else:
        ns, nt, f3 = n1, n2, a1
    v = np.cross(du, ns)
    vn = np.linalg.norm(v)
    if vn == 0.0:
        return 0.0, 0.0, 0.0, False
    v = v / vn
    w = np.cross(ns, v)
    f2 = float(v @ nt)
    f1 = float(np.arctan2(w @ nt, ns @ nt))
    return f1, f2, f3, True


def _bin(val, lo_shift, scale):
    b = int(np.floor(11 * (val + lo_shift) * scale))
    return min(max(b, 0), 10)


def spfh_np(i, xyz, normals, radius):
    nonself = [j for j in range(len(xyz))
               if j != i and 0 < np.linalg.norm(xyz[j] - xyz[i]) <= radius]
    hist = np.zeros((3, 11))
    if not nonself:
        return hist
    incr = 100.0 / len(nonself)  # degenerate pairs stay in the denominator
    for j in nonself:
        f1, f2, f3, ok = pair_features_np(xyz[i], normals[i], xyz[j], normals[j])
        if not ok:
            continue
        hist[0, _bin(f1, np.pi, 1.0 / (2 * np.pi))] += incr
        hist[1, _bin(f2, 1.0, 0.5)] += incr
        hist[2, _bin(f3, 1.0, 0.5)] += incr
    return hist


def fpfh_np(key, xyz, normals, spfh_all, radius):
    """weightPointSPFHSignature: Σ_{d≠0} SPFH_j / d², blocks → 100."""
    out = np.zeros((3, 11))
    for j in range(len(xyz)):
        d2 = float(np.sum((xyz[j] - key) ** 2))
        if d2 == 0.0 or d2 > radius * radius:
            continue
        out += spfh_all[j] / d2
    for b in range(3):
        s = out[b].sum()
        if s > 0:
            out[b] *= 100.0 / s
    return out.reshape(33)


# ---------------------------------------------------------------------------

def main():
    xyz, key_idx = fixture_cloud()
    normals = pca_normals(xyz)
    keys = xyz[key_idx]

    shot = np.zeros((N_KEYS, 352), np.float64)
    rfs = np.zeros((N_KEYS, 3, 3), np.float64)
    for m, p in enumerate(keys):
        d = np.linalg.norm(xyz - p, axis=1)
        sel = (d <= RADIUS_SHOT) & (d > 1e-9)
        rf = shot_lrf_np(p, xyz[sel], RADIUS_SHOT)
        rfs[m] = rf
        shot[m] = shot_np(p, rf, xyz[sel], normals[sel], RADIUS_SHOT)

    spfh_all = [spfh_np(i, xyz, normals, RADIUS_FPFH) for i in range(len(xyz))]
    fpfh = np.stack([fpfh_np(xyz[i], xyz, normals, spfh_all, RADIUS_FPFH)
                     for i in key_idx])

    out = os.path.join(os.path.dirname(__file__), "descriptors.npz")
    np.savez_compressed(
        out, xyz=xyz, normals=normals, key_idx=key_idx,
        shot=shot.astype(np.float32), rf=rfs.astype(np.float32),
        fpfh=fpfh.astype(np.float32),
        radius_shot=RADIUS_SHOT, radius_fpfh=RADIUS_FPFH)
    print(f"wrote {out}: shot {shot.shape}, fpfh {fpfh.shape}")


if __name__ == "__main__":
    main()
