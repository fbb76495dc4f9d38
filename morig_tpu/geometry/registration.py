"""Rigid registration: batched Kabsch fit and piecewise-RANSAC tracking.

Replaces data_proc/common_ops.py:155-172 (batched SVD best-fit) and
utils/piecewise_ransac.py:8-92 (the alternative per-segment rigid tracker).
Kabsch runs on device (vmapped SVD); the RANSAC hypothesis loop is batched —
all hypotheses are evaluated in one program instead of a Python loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def kabsch(src: jax.Array, tar: jax.Array, weights: jax.Array | None = None):
    """Best-fit rotation/translation per batch: src/tar (..., N, 3).

    Returns (R (...,3,3), t (...,1,3)) with tar ≈ src @ R^T + t.
    """
    if weights is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    else:
        w = weights
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    mu_s = jnp.sum(src * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    mu_t = jnp.sum(tar * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    sc = (src - mu_s) * w[..., None]
    tc = tar - mu_t
    M = jnp.einsum("...na,...nb->...ab", tc, sc)
    U, _, Vh = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vh)
    fix = jnp.concatenate(
        [jnp.ones(det.shape + (2,)), det[..., None]], axis=-1
    )
    R = (U * fix[..., None, :]) @ Vh
    t = mu_t - jnp.einsum("...ab,...nb->...na", R, mu_s)
    return R, t


def icp_numpy(src_pts: np.ndarray, tar_pts: np.ndarray):
    """numpy wrapper matching the reference's icp signature
    (common_ops.py:155-172): (B,N,3)x2 -> (R (B,3,3), t (B,1,3))."""
    R, t = kabsch(jnp.asarray(src_pts, jnp.float32), jnp.asarray(tar_pts, jnp.float32))
    return np.asarray(R), np.asarray(t)


class PiecewiseRansac:
    """Per-skin-segment rigid RANSAC tracking (utils/piecewise_ransac.py).

    Each skinning segment (vertices whose max weight binds one joint) gets a
    rigid (R, t) fit from its *visible* handle correspondences by sampled
    consensus; all hypotheses evaluate as one batched kabsch + error program.
    """

    def __init__(self, num_hypotheses: int = 64, sample_size: int = 4,
                 inlier_threshold: float = 0.02, seed: int = 0):
        self.num_hypotheses = num_hypotheses
        self.sample_size = sample_size
        self.inlier_threshold = inlier_threshold
        self.key = jax.random.key(seed)

    def fit_segment(self, src: np.ndarray, tar: np.ndarray):
        """RANSAC rigid fit of one segment's correspondences (N, 3) x 2."""
        n = len(src)
        if n < 3:
            return np.eye(3), np.zeros((1, 3))
        self.key, sub = jax.random.split(self.key)
        k = min(self.sample_size, n)
        idx = jax.random.randint(sub, (self.num_hypotheses, k), 0, n)
        s = jnp.asarray(src, jnp.float32)[idx]            # (H,k,3)
        t_ = jnp.asarray(tar, jnp.float32)[idx]
        R, t = kabsch(s, t_)                              # (H,3,3),(H,1,3)
        pred = jnp.einsum("hab,nb->hna", R, jnp.asarray(src, jnp.float32)) + t
        err = jnp.linalg.norm(pred - jnp.asarray(tar, jnp.float32)[None], axis=-1)
        inliers = err < self.inlier_threshold             # (H,N)
        best = int(jnp.argmax(inliers.sum(-1)))
        mask = np.asarray(inliers[best])
        if mask.sum() >= 3:   # refit on the consensus set
            R2, t2 = kabsch(jnp.asarray(src[mask], jnp.float32)[None],
                            jnp.asarray(tar[mask], jnp.float32)[None])
            return np.asarray(R2[0]), np.asarray(t2[0])
        return np.asarray(R[best]), np.asarray(t[best])

    def run(self, verts: np.ndarray, segments: np.ndarray,
            handle_src: np.ndarray, handle_tar: np.ndarray,
            handle_seg: np.ndarray) -> np.ndarray:
        """Deform `verts` by per-segment rigid fits.

        segments (V,) int: per-vertex segment id (argmax skin weight);
        handle_* are visible correspondence pairs with their segment ids."""
        out = verts.copy()
        for s in np.unique(segments):
            sel = handle_seg == s
            if sel.sum() < 3:
                continue
            R, t = self.fit_segment(handle_src[sel], handle_tar[sel])
            vs = segments == s
            out[vs] = verts[vs] @ R.T + t[0]
        return out
