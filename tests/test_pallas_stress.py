"""Mosaic kernel re-execution stress (the round-1 A,B,A fault regression).

Round 1 shipped with TPU_JOINTS_PALLAS_MAXK=1 because re-executing a
Mosaic-kernel program after a *different* Mosaic program had run in the same
process intermittently failed with a TPU runtime INVALID_ARGUMENT. This test
alternates two distinct Pallas kNN programs (different shapes and k) many
times so any recurrence of the fault is caught in CI/on-TPU runs before it
bites a serving process. On CPU backends the kernel runs in interpret mode —
the dispatch/alternation pattern is identical, the Mosaic runtime itself is
only exercised when the suite runs on a TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpu_joints.neighbors.pallas_knn import knn_pallas, pallas_available


def test_alternating_distinct_pallas_programs():
    on_tpu = pallas_available()
    interpret = not on_tpu
    iters = 50 if on_tpu else 5

    rng = np.random.default_rng(0)
    qa = jnp.asarray(rng.normal(size=(512, 3)), jnp.float32)
    sa = jnp.asarray(rng.normal(size=(2048, 3)), jnp.float32)
    qb = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
    sb = jnp.asarray(rng.normal(size=(4096, 3)), jnp.float32)

    def A(q, s):
        return knn_pallas(q, s, 1, tn=1024, interpret=interpret)

    def B(q, s):
        return knn_pallas(q, s, 8, tn=2048, interpret=interpret)

    # oracle once
    def oracle(q, s, k):
        d = ((np.asarray(q)[:, None, :] - np.asarray(s)[None, :, :]) ** 2).sum(-1)
        return np.sort(d, axis=1)[:, :k]

    da, _ = A(qa, sa)
    db, _ = B(qb, sb)
    np.testing.assert_allclose(np.asarray(da)[:, 0], oracle(qa, sa, 1)[:, 0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.sort(np.asarray(db), axis=1),
                               oracle(qb, sb, 8), rtol=1e-5, atol=1e-6)

    for _ in range(iters):
        da, _ = A(qa, sa)
        db, _ = B(qb, sb)
        # force real execution each alternation (A,B,A,B,...)
        assert np.isfinite(np.asarray(da[0, 0]))
        assert np.isfinite(np.asarray(db[0, 0]))
