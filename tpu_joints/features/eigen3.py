"""Closed-form batched symmetric 3x3 eigendecomposition.

PCL leans on Eigen's ``SelfAdjointEigenSolver`` everywhere (normal
estimation, SHOT local reference frames, PCA bounding boxes — reference
``SHOT_demo.cpp:750-758``). An iterative eigensolver is a poor fit for the
TPU's vector units; instead we use the trigonometric closed form for the
eigenvalues (Smith 1961) and a Cayley-Hamilton product construction for the
eigenvectors — pure elementwise math that `vmap`s over millions of
covariance matrices with no data-dependent control flow.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_EPS = 1e-12


def eigvals3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [..., 3, 3], descending: [..., 3]."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    # det(B) / (2 p^3), clipped into acos domain.
    detB = jnp.linalg.det(B)
    r = detB / jnp.maximum(2.0 * p * p * p, _EPS)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l0 = q + 2.0 * p * jnp.cos(phi)
    l2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l1 = 3.0 * q - l0 - l2
    return jnp.stack([l0, l1, l2], axis=-1)


def _eigvec_from_product(A: jnp.ndarray, la: jnp.ndarray, lb: jnp.ndarray,
                         fallback: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for the eigenvalue not in {la, lb}.

    By Cayley-Hamilton, columns of (A - la I)(A - lb I) span the remaining
    eigenspace. Picks the largest column; falls back when degenerate.
    """
    I = jnp.eye(3, dtype=A.dtype)
    M = (A - la[..., None, None] * I) @ (A - lb[..., None, None] * I)
    norms = jnp.sum(M * M, axis=-2)  # [..., 3] column squared norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = n[..., 0] > 1e-20
    v = jnp.where(ok[..., None], v / jnp.maximum(n, _EPS), fallback)
    return v


def _adjugate_apply(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """adj(M) @ v for [..., 3, 3] without forming the inverse."""
    c1, c2, c3 = M[..., :, 0], M[..., :, 1], M[..., :, 2]
    r1 = jnp.cross(c2, c3)
    r2 = jnp.cross(c3, c1)
    r3 = jnp.cross(c1, c2)
    return jnp.stack(
        [jnp.sum(r1 * v, -1), jnp.sum(r2 * v, -1), jnp.sum(r3 * v, -1)], axis=-1
    )


def _inverse_iteration_polish(A: jnp.ndarray, lam: jnp.ndarray, v: jnp.ndarray,
                              scale: jnp.ndarray) -> jnp.ndarray:
    """One shifted inverse-iteration step: sharpens a float32 closed-form
    eigenvector to near machine precision (unless the eigenvalue is
    repeated, in which case any subspace vector is equally valid)."""
    I = jnp.eye(3, dtype=A.dtype)
    shift = (lam + 1e-6 * scale)[..., None, None]
    B = A - shift * I
    x = _adjugate_apply(B, v)  # ∝ B^{-1} v (det cancels under normalize)
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    ok = n[..., 0] > 1e-25
    x = jnp.where(ok[..., None], x / jnp.maximum(n, _EPS), v)
    # keep orientation consistent with the unpolished vector
    sgn = jnp.where(jnp.sum(x * v, -1, keepdims=True) < 0, -1.0, 1.0)
    return x * sgn


def eigh3x3(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full decomposition of symmetric [..., 3, 3].

    Returns (eigvals [..., 3] descending, eigvecs [..., 3, 3] with
    ``eigvecs[..., :, i]`` the unit eigenvector of ``eigvals[..., i]``).
    The basis is made right-handed. Robust to the two degeneracies that
    occur in practice: planes (l0 ≈ l1) and isotropic neighborhoods.
    """
    vals = eigvals3x3(A)
    l0, l1, l2 = vals[..., 0], vals[..., 1], vals[..., 2]
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), l0.shape + (3,))
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), l0.shape + (3,))
    # v0 (largest) is distinct unless fully isotropic; v2 (smallest) is
    # distinct unless l1 ≈ l2 (e.g. a line). Build both, orthonormalize.
    v0 = _eigvec_from_product(A, l1, l2, ex)
    v2 = _eigvec_from_product(A, l0, l1, ez)
    scale = jnp.maximum(jnp.abs(l0), jnp.abs(l2)) + 1e-30
    v0 = _inverse_iteration_polish(A, l0, v0, scale)
    v2 = _inverse_iteration_polish(A, l2, v2, scale)
    # If v2 ended up parallel to v0 (degenerate), replace with any ⊥ vector.
    dot = jnp.sum(v0 * v2, axis=-1, keepdims=True)
    v2p = v2 - dot * v0
    n2 = jnp.linalg.norm(v2p, axis=-1, keepdims=True)
    alt = jnp.cross(v0, ez)
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v0, ex)
    alt = jnp.where(alt_n > 1e-6, alt / jnp.maximum(alt_n, _EPS),
                    alt2 / jnp.maximum(jnp.linalg.norm(alt2, axis=-1, keepdims=True), _EPS))
    v2 = jnp.where(n2[..., 0:1] > 1e-6, v2p / jnp.maximum(n2, _EPS), alt)
    v1 = jnp.cross(v2, v0)
    vecs = jnp.stack([v0, v1, v2], axis=-1)
    return vals, vecs


def smallest_eigenvector(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(unit eigenvector of the smallest eigenvalue, eigenvalues descending).

    The workhorse of normal estimation: surface normal = smallest-variance
    direction of the local covariance.
    """
    vals, vecs = eigh3x3(A)
    return vecs[..., :, 2], vals
