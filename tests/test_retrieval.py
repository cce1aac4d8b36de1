"""Tests for the HOW/ASMK retrieval database."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.slam import retrieval


def test_binarize_hamming_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    packed = retrieval.binarize_and_pack(x)
    assert packed.shape == (4, 8)
    # Self-similarity is exactly 1
    sim = retrieval.hamming_sim_packed(packed[0], packed, 64)
    np.testing.assert_allclose(sim[0], 1.0)
    # Flipping every sign gives -1
    packed_neg = retrieval.binarize_and_pack(-x)
    sim_neg = retrieval.hamming_sim_packed(packed[0], packed_neg, 64)
    np.testing.assert_allclose(sim_neg[0], -1.0)


def test_asmk_retrieves_similar_images():
    rng = np.random.default_rng(1)
    dim, n_words = 32, 64
    centroids = rng.standard_normal((n_words, dim)).astype(np.float32)
    db = retrieval.ASMKDatabase(centroids)

    def make_image(base, noise=0.05):
        return base + noise * rng.standard_normal(base.shape).astype(np.float32)

    base_a = rng.standard_normal((50, dim)).astype(np.float32)
    base_b = rng.standard_normal((50, dim)).astype(np.float32)

    # Insert two images of scene A, one of scene B
    assert db.update(make_image(base_a), True, k=3) == []
    top = db.update(make_image(base_b), True, k=3)
    db_size = db.kf_counter
    assert db_size == 2

    # A query near scene A should rank image 0 first
    scores = db.query(make_image(base_a))
    assert np.argmax(scores) == 0
    # And near B ranks image 1 first
    scores = db.query(make_image(base_b))
    assert np.argmax(scores) == 1


def test_asmk_update_query_then_add():
    rng = np.random.default_rng(2)
    centroids = rng.standard_normal((32, 16)).astype(np.float32)
    db = retrieval.ASMKDatabase(centroids)
    img = rng.standard_normal((20, 16)).astype(np.float32)
    db.update(img, True, k=3)
    # Querying the same image again should retrieve it with high score
    top = db.update(img + 0.01 * rng.standard_normal(img.shape).astype(np.float32),
                    False, k=3, min_thresh=0.1)
    assert top == [0]


def test_prep_features_shapes():
    key = jax.random.PRNGKey(0)
    params = retrieval.init_retrieval_params(key, dim=64, hdims=(32,))
    feat = jax.random.normal(jax.random.PRNGKey(1), (1, 100, 64))
    out = retrieval.prep_features(params, feat, nfeat=30)
    assert out.shape == (1, 30, 32)
    # top-k selection: attention of selected >= attention of non-selected
    x = retrieval.whiten(params["prewhiten"], feat)
    proj = retrieval.projector(params["projector"], x)
    attn = jnp.linalg.norm(proj, axis=-1)[0]
    thresh = jnp.sort(attn)[-30]
    assert float(jnp.min(jnp.sort(attn)[-30:])) >= float(thresh) - 1e-6
