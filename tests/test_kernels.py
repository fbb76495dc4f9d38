"""Kernel parity tests: knn / radius / fps / interpolation vs numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.kernels import neighbors as nbk


def test_pairwise_sqdist(rng):
    x = rng.normal(size=(17, 3)).astype(np.float32)
    y = rng.normal(size=(23, 3)).astype(np.float32)
    got = np.asarray(nbk.pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None] - y[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_knn_euclidean_matches_numpy(rng):
    q = rng.normal(size=(32, 3)).astype(np.float32)
    c = rng.normal(size=(64, 3)).astype(np.float32)
    idx, score = nbk.knn(jnp.asarray(q), jnp.asarray(c), k=4)
    d = ((q[:, None] - c[None]) ** 2).sum(-1)
    want = np.argsort(d, axis=1)[:, :4]
    # top-k ties may reorder; compare distance values
    np.testing.assert_allclose(
        np.sort(-np.asarray(score), axis=1),
        np.sort(np.take_along_axis(d, want, axis=1), axis=1),
        atol=1e-4,
    )


def test_knn_cosine_respects_mask(rng):
    q = rng.normal(size=(8, 16)).astype(np.float32)
    c = rng.normal(size=(20, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    mask = np.zeros(20, dtype=bool)
    mask[:5] = True
    idx, _ = nbk.knn(jnp.asarray(q), jnp.asarray(c), k=3, cand_mask=jnp.asarray(mask), cosine=True)
    assert np.asarray(idx).max() < 5


def test_radius_group(rng):
    c = np.zeros((1, 3), dtype=np.float32)
    p = rng.normal(size=(50, 3)).astype(np.float32)
    idx, valid = nbk.radius_group(jnp.asarray(c), jnp.asarray(p), r=1.0, max_neighbors=8)
    d = np.linalg.norm(p, axis=1)
    inside = set(np.where(d <= 1.0)[0])
    got = set(np.asarray(idx)[0, np.asarray(valid)[0]].tolist())
    # got must be the nearest min(8, |inside|) points
    want = set(np.argsort(d)[: min(8, len(inside))].tolist())
    assert got == want


def test_fps_covers_and_respects_mask(rng):
    p = rng.normal(size=(40, 3)).astype(np.float32)
    mask = np.ones(40, dtype=bool)
    mask[30:] = False
    idx = np.asarray(nbk.fps(jnp.asarray(p), 10, jnp.asarray(mask)))
    assert idx.max() < 30
    assert len(set(idx.tolist())) == 10  # distinct picks when enough valid pts

    # oracle: greedy farthest point from start 0
    chosen = [0]
    dist = ((p[:30] - p[0]) ** 2).sum(-1)
    for _ in range(9):
        nxt = int(np.argmax(dist))
        chosen.append(nxt)
        dist = np.minimum(dist, ((p[:30] - p[nxt]) ** 2).sum(-1))
    assert idx.tolist() == chosen


def test_knn_interpolate_idw(rng):
    src = rng.normal(size=(10, 3)).astype(np.float32)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    tar = src[:3] + 1e-4  # targets nearly on top of sources 0..2
    out = np.asarray(nbk.knn_interpolate(jnp.asarray(x), jnp.asarray(src), jnp.asarray(tar), k=3))
    np.testing.assert_allclose(out, x[:3], atol=1e-2)


def test_masked_max_mean(rng):
    x = rng.normal(size=(4, 5, 3)).astype(np.float32)
    mask = rng.random((4, 5)) > 0.4
    mask[0] = False  # fully-masked row -> 0
    got = np.asarray(nbk.masked_max(jnp.asarray(x), jnp.asarray(mask), axis=1))
    want = np.where(
        mask.any(1, keepdims=True),
        np.where(mask[..., None], x, -np.inf).max(1),
        0.0,
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    gm = np.asarray(nbk.masked_mean(jnp.asarray(x), jnp.asarray(mask), axis=1))
    denom = np.maximum(mask.sum(1, keepdims=True), 1e-10)
    wm = np.where(mask[..., None], x, 0.0).sum(1) / denom
    np.testing.assert_allclose(gm, wm, atol=1e-5)
