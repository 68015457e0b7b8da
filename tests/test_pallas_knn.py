"""Pallas fused kNN kernel vs the dense oracle (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_joints.neighbors import knn
from tpu_joints.neighbors.pallas_knn import knn_pallas


@pytest.mark.parametrize("k", [1, 4, 16])
@pytest.mark.parametrize("shape", [(100, 300), (256, 2048), (70, 100)])
def test_knn_pallas_matches_oracle(k, shape):
    M, N = shape
    rng = np.random.default_rng(k * 1000 + M)
    q = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=N) > 0.25)

    d_ref, i_ref = knn(q, s, k, source_mask=mask)
    d_pal, i_pal = knn_pallas(q, s, k, source_mask=mask,
                              tm=64, tn=256, interpret=True)
    # distances must match exactly up to fp reassociation; indices may
    # permute within ties, so re-gather and compare distances
    np.testing.assert_allclose(
        np.sort(np.asarray(d_pal), axis=1), np.sort(np.asarray(d_ref), axis=1),
        rtol=1e-5, atol=1e-5,
    )
    gathered = np.asarray(
        jnp.sum((q[:, None, :] - s[i_pal]) ** 2, axis=-1)
    )
    valid = np.asarray(d_pal) < 1e30
    np.testing.assert_allclose(
        gathered[valid], np.asarray(d_pal)[valid], rtol=1e-4, atol=1e-5
    )
    # masked sources never matched
    assert not np.asarray(mask)[np.asarray(i_pal)[valid]].__invert__().any()


def test_knn_pallas_all_masked():
    q = jnp.zeros((8, 3), jnp.float32)
    s = jnp.ones((16, 3), jnp.float32)
    mask = jnp.zeros((16,), bool)
    d, i = knn_pallas(q, s, 2, source_mask=mask, tm=8, tn=16, interpret=True)
    assert (np.asarray(d) >= 1e30).all()
