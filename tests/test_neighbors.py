import numpy as np
import jax.numpy as jnp

from tpu_joints.neighbors import knn, radius_neighbors


def _np_knn(q, s, k, mask=None):
    d = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    if mask is not None:
        d[:, ~mask] = np.inf
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_knn_matches_bruteforce(rng):
    q = rng.normal(size=(33, 3)).astype(np.float32)
    s = rng.normal(size=(100, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(s), 5, chunk=32)
    dn, _ = _np_knn(q, s, 5)
    np.testing.assert_allclose(np.sort(np.asarray(d), 1), np.sort(dn, 1), atol=1e-4)
    # the returned indices must actually produce those distances
    got = ((q[:, None, :] - s[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(got, np.asarray(d), atol=1e-4)


def test_knn_respects_source_mask(rng):
    q = rng.normal(size=(8, 3)).astype(np.float32)
    s = rng.normal(size=(64, 3)).astype(np.float32)
    mask = np.zeros(64, bool)
    mask[:10] = True
    d, i = knn(jnp.asarray(q), jnp.asarray(s), 3, source_mask=jnp.asarray(mask), chunk=16)
    assert np.all(np.asarray(i) < 10)
    dn, ins = _np_knn(q, s, 3, mask)
    np.testing.assert_allclose(np.asarray(d), dn, atol=1e-4)


def test_knn_exclude_self(rng):
    s = rng.normal(size=(20, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(s), jnp.asarray(s), 1, exclude_self=True, chunk=8)
    assert np.all(np.asarray(i)[:, 0] != np.arange(20))
    assert np.all(np.asarray(d) > 0)


def test_knn_more_than_valid(rng):
    """Requesting more neighbors than valid sources yields INF lanes."""
    q = rng.normal(size=(4, 3)).astype(np.float32)
    s = rng.normal(size=(16, 3)).astype(np.float32)
    mask = np.zeros(16, bool)
    mask[:2] = True
    d, _ = knn(jnp.asarray(q), jnp.asarray(s), 5, source_mask=jnp.asarray(mask), chunk=8)
    assert np.all(np.asarray(d)[:, 2:] > 1e30)


def test_radius_neighbors(rng):
    q = rng.uniform(size=(16, 3)).astype(np.float32)
    s = rng.uniform(size=(128, 3)).astype(np.float32)
    r = 0.3
    idx, valid, d = radius_neighbors(jnp.asarray(q), jnp.asarray(s), r, 32, chunk=32)
    dn = ((q[:, None, :] - s[None, :, :]) ** 2).sum(-1)
    for m in range(16):
        expected = set(np.where(dn[m] <= r * r)[0][np.argsort(dn[m][dn[m] <= r * r])][:32])
        got = set(np.asarray(idx)[m][np.asarray(valid)[m]].tolist())
        assert got == expected


def test_knn_descriptor_space(rng):
    """High-D (descriptor) matching uses the same primitive."""
    q = rng.normal(size=(10, 33)).astype(np.float32)
    s = rng.normal(size=(50, 33)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(s), 2, chunk=16)
    dn, iN = _np_knn(q, s, 2)
    np.testing.assert_allclose(np.asarray(d), dn, rtol=1e-3, atol=1e-3)
