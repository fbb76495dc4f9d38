"""Auxiliary / experimental losses from the reference inventory.

Masked, batched re-designs of models/customized_losses.py:11-104,161-291 —
the losses the reference ships but mostly keeps off the main CLI path
(SURVEY.md §2.6): log-ratio metric learning, hinge embedding, multi-label BCE,
transition/motion/grouping losses, per-sample IoU with Hungarian matching,
and skin-difference regularization.  Host Python loops become batch axes;
host numpy sampling becomes jax PRNG.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


def log_ratio_loss(key, feature, gt_skin, vert_mask, num_sample: int = 50,
                   eps: float = 1e-6):
    """Log-distance-ratio metric learning (customized_losses.py:11-44):
    pairwise log-distance differences in feature space should match those in
    skin space, averaged over ordered pair-pairs."""
    B, V, _ = feature.shape
    pairs = np.array(list(itertools.combinations(range(num_sample), 2)))
    pi = jnp.asarray(pairs[:, 0])
    pj = jnp.asarray(pairs[:, 1])

    def per_sample(key, f, s, m):
        p = m.astype(jnp.float32)
        p = p / jnp.maximum(p.sum(), 1.0)
        ids = jax.random.choice(key, V, (num_sample,), replace=False, p=p)
        fs, ss = f[ids], s[ids]
        d = jnp.sum((fs[pi] - fs[pj]) ** 2, axis=-1)
        gd = jnp.sum((ss[pi] - ss[pj]) ** 2, axis=-1)
        ld, lgd = jnp.log(d + eps), jnp.log(gd + eps)
        diff = (ld[None, :] - ld[:, None]) - (lgd[None, :] - lgd[:, None])
        n = len(pairs)
        w = jnp.triu(jnp.ones((n, n)), k=1)
        w = w / jnp.maximum(w.sum(), 1.0)
        return jnp.sum(diff * diff * w)

    keys = jax.random.split(key, B)
    return jnp.mean(jax.vmap(per_sample)(keys, feature, gt_skin, vert_mask))


def hinge_embedding_loss(key, feature, gt_skin, vert_mask, num_sample: int = 256,
                         margin: float = 0.2, pos_weight: float = 10.0,
                         sim_threshold: float = 0.9):
    """Weighted hinge embedding over sampled pairs (customized_losses.py:161-179):
    similar-skin pairs pull feature distance to 0, dissimilar pairs push it
    beyond the margin; positives up-weighted."""
    B, V, _ = feature.shape

    def per_sample(key, f, s, m):
        p = m.astype(jnp.float32)
        p = p / jnp.maximum(p.sum(), 1.0)
        ids = jax.random.choice(key, V, (num_sample,), replace=False, p=p)
        fs, ss = f[ids], s[ids]
        sim = fs @ fs.T
        dist = (1.0 - sim) / 2.0
        gt_sim = (2.0 - jnp.sum(jnp.abs(ss[None] - ss[:, None]), -1)) / 2.0
        pos = gt_sim > sim_threshold
        w = jnp.where(pos, pos_weight, 1.0)
        per = jnp.where(pos, dist, jnp.maximum(0.0, margin - dist))
        return jnp.sum(per * w * w) / jnp.maximum(jnp.sum(w), 1.0)

    keys = jax.random.split(key, B)
    return jnp.mean(jax.vmap(per_sample)(keys, feature, gt_skin, vert_mask))


def multi_label_bce(feature, seg_onehot, vert_mask, tau: float = 0.05):
    """Pairwise same-segment BCE on feature similarities
    (customized_losses.py:200-213).  seg_onehot: (B, V, K)."""
    sim = jnp.einsum("bvc,bwc->bvw", feature, feature) / tau
    gt = jnp.einsum("bvk,bwk->bvw", seg_onehot, seg_onehot)
    m = vert_mask[:, :, None] & vert_mask[:, None, :]
    per = jnp.maximum(sim, 0.0) - sim * gt + jnp.log1p(jnp.exp(-jnp.abs(sim)))
    return jnp.sum(jnp.where(m, per, 0.0)) / jnp.maximum(jnp.sum(m), 1.0)


def trans_loss(adj_cost, seg_onehot, mask):
    """Mean transition cost between same-segment element pairs
    (customized_losses.py:182-197).  adj_cost (B, N, N[, T])."""
    gt = jnp.einsum("bvk,bwk->bvw", seg_onehot, seg_onehot)
    m = (mask[:, :, None] & mask[:, None, :]).astype(adj_cost.dtype) * gt
    if adj_cost.ndim == 4:
        m = m[..., None]
    return jnp.sum(adj_cost * m) / jnp.maximum(jnp.sum(m) * (adj_cost.shape[-1] if adj_cost.ndim == 4 else 1), 1.0)


def motion_loss(pred_Rs, pred_ts, xyz, gt_flow, gt_seg):
    """Rigid-motion consistency (customized_losses.py:54-68): points in the
    same segment must explain each other's flow under the predicted per-point
    rigid transforms."""
    ppdist = xyz[:, None, :, :] - xyz[:, :, None, :]          # B,n,n,3
    moved = jnp.einsum("bnij,bnmj->bnmi", pred_Rs, ppdist) + pred_ts[:, :, None, :] \
        + gt_flow[:, :, None, :]
    err = jnp.sum((moved - gt_flow[:, None, :, :]) ** 2, axis=-1)
    seg = jnp.einsum("bnk,bmk->bnm", gt_seg, gt_seg)
    segn = seg / (jnp.sum(seg, axis=2, keepdims=True) + 1e-8)
    return jnp.sum(err * segn) / jnp.maximum(jnp.sum(segn), 1e-8)


def grouping_loss(pred_support, seg_onehot):
    """BCE between a predicted support matrix and same-segment indicators
    (customized_losses.py:71-76)."""
    gt = jnp.einsum("bnk,bmk->bnm", seg_onehot, seg_onehot)
    s = pred_support
    per = jnp.maximum(s, 0.0) - s * gt + jnp.log1p(jnp.exp(-jnp.abs(s)))
    return jnp.mean(per)


def hungarian_matching(pred_seg: np.ndarray, gt_seg: np.ndarray) -> np.ndarray:
    """IoU-cost Hungarian matching of segment columns
    (customized_losses.py:47-51).  Host-side."""
    inter = pred_seg.T @ gt_seg
    union = pred_seg.sum(0)[:, None] + gt_seg.sum(0)[None] - inter + 1e-8
    cost = 1.0 - inter / union
    r, c = linear_sum_assignment(cost)
    return np.stack([r, c])


def iou_loss(pred_seg: jnp.ndarray, gt_seg_onehot: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU after host-side Hungarian alignment (customized_losses.py:79-104).
    pred_seg (N, Kp) soft assignments, gt_seg_onehot (N, Kg)."""
    match = hungarian_matching(np.asarray(pred_seg), np.asarray(gt_seg_onehot))
    p = pred_seg[:, match[0]]
    g = gt_seg_onehot[:, match[1]]
    inter = jnp.sum(p * g, axis=0)
    union = jnp.sum(p, axis=0) + jnp.sum(g, axis=0) - inter + 1e-8
    return jnp.mean(1.0 - inter / union)


def skin_difference_loss(key, pred_skin, gt_skin, vert_mask, sample_ratio: float = 0.25):
    """Encourage equal predicted skin rows where GT rows agree
    (customized_losses.py:254-267), over an FPS-like random subsample."""
    B, V, _ = pred_skin.shape
    n = max(int(V * sample_ratio), 2)

    def per_sample(key, ps, gs, m):
        p = m.astype(jnp.float32)
        p = p / jnp.maximum(p.sum(), 1.0)
        ids = jax.random.choice(key, V, (n,), replace=False, p=p)
        pd = jnp.sum(jnp.abs(ps[ids][:, None] - ps[ids][None]), -1)
        gd = jnp.sum(jnp.abs(gs[ids][:, None] - gs[ids][None]), -1)
        same = (jnp.abs(gd) < 1e-6).astype(pd.dtype)
        return jnp.sum(pd * same) / jnp.maximum(jnp.sum(same), 1.0)

    keys = jax.random.split(key, B)
    return jnp.mean(jax.vmap(per_sample)(keys, pred_skin, gt_skin, vert_mask))
