"""Pallas NN kernel vs jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from multiply_tpu.ops.knn import knn
from multiply_tpu.ops.knn_pallas import nn1_pallas


def test_nn1_pallas_matches_jnp_interpret():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2100, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((700, 3)).astype(np.float32))
    d2p, idxp = nn1_pallas(q, r, interpret=True)
    d2j, idxj = knn(q, r, k=1)
    np.testing.assert_array_equal(np.asarray(idxp), np.asarray(idxj))
    np.testing.assert_allclose(np.asarray(d2p), np.asarray(d2j), atol=1e-5)


def test_nn1_pallas_ref_padding_never_selected():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1024, 3)).astype(np.float32))
    # 5 refs -> padded to 512 internally; indices must stay < 5
    r = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    d2, idx = nn1_pallas(q, r, interpret=True)
    assert np.asarray(idx).max() < 5
    assert np.all(np.asarray(d2) < 100.0)
