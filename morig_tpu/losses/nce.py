"""Contrastive losses, batched + masked (no per-sample Python loops).

The reference computes infoNCE with a Python loop over samples
(models/customized_losses.py:107-134) and multi-positive infoNCE with
host-side numpy sampling (:137-158).  Here both are single dense masked
einsum/gather programs over the padded batch — the per-sample loop becomes a
batch dimension, host randomness becomes jax PRNG.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e30


def _masked_ce_rows(logits: jax.Array, labels: jax.Array, row_mask: jax.Array) -> jax.Array:
    """Mean cross-entropy over valid rows; logits already -inf-masked on cols.

    logits: (B, N, M); labels: (B, N) int; row_mask: (B, N) bool.
    Returns (B,) per-sample mean CE (0 where a sample has no valid rows).
    """
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    ce = logz - picked
    num = jnp.sum(jnp.where(row_mask, ce, 0.0), axis=-1)
    den = jnp.sum(row_mask, axis=-1)
    return jnp.where(den > 0, num / jnp.maximum(den, 1), 0.0)


def info_nce(
    vtx_feature: jax.Array,      # (B, V, C) L2-normalized
    pts_feature: jax.Array,      # (B, P, C) L2-normalized
    corr_v2p: jax.Array,         # (B, N, 2) int — (vertex idx, point idx)
    corr_v2p_mask: jax.Array,    # (B, N)
    corr_p2v: jax.Array,         # (B, M, 2) int — (point idx, vertex idx)
    corr_p2v_mask: jax.Array,    # (B, M)
    vert_mask: jax.Array,        # (B, V)
    pts_mask: jax.Array,         # (B, P)
    tau: jax.Array,              # scalar (learnable temperature, corrnet.py:15)
) -> jax.Array:
    """Symmetric correspondence infoNCE (customized_losses.py:107-134).

    v2p direction: anchor = vertex feature at corr[:,0], classes = all points
    of the same sample, label = corr[:,1]; and symmetrically p2v.  Per-sample
    mean CE for each direction, both directions summed, then averaged over the
    batch — matching the reference's accumulation semantics.
    """
    anchors_v = jax.vmap(lambda f, i: f[i])(vtx_feature, corr_v2p[..., 0].astype(jnp.int32))
    logits_v = jnp.einsum("bnc,bpc->bnp", anchors_v, pts_feature) / tau
    logits_v = jnp.where(pts_mask[:, None, :], logits_v, NEG)
    loss_v = _masked_ce_rows(logits_v, corr_v2p[..., 1], corr_v2p_mask)

    anchors_p = jax.vmap(lambda f, i: f[i])(pts_feature, corr_p2v[..., 0].astype(jnp.int32))
    logits_p = jnp.einsum("bmc,bvc->bmv", anchors_p, vtx_feature) / tau
    logits_p = jnp.where(vert_mask[:, None, :], logits_p, NEG)
    loss_p = _masked_ce_rows(logits_p, corr_p2v[..., 1], corr_p2v_mask)

    return jnp.mean(loss_v + loss_p)


def multi_pos_info_nce(
    key: jax.Array,
    feature: jax.Array,          # (B, V, C)
    gt_skin: jax.Array,          # (B, V, J)
    vert_mask: jax.Array,        # (B, V)
    num_sample: int = 512,
    num_pos: int = 10,
    num_neg: int = 200,
    sim_threshold: float = 0.9,
) -> jax.Array:
    """Multi-positive skin-similarity infoNCE (customized_losses.py:137-158).

    Per sample: draw `num_sample` vertices; positives are pairs whose skin
    vectors agree (L1 similarity > threshold); for each anchor draw num_pos
    positives and num_neg negatives (with replacement) and average num_pos
    two-class-style CE terms where the positive logit competes against the
    negatives.
    """
    B, V, C = feature.shape

    def per_sample(key, feat, skin, mask):
        k1, k2, k3 = jax.random.split(key, 3)
        p = mask.astype(jnp.float32)
        p = p / jnp.maximum(p.sum(), 1.0)
        ids = jax.random.choice(k1, V, (num_sample,), replace=False, p=p)
        # replace=False with num_sample > valid count overflows into
        # zero-probability (padded) rows; track validity and mask them out
        row_ok = mask[ids]
        f = feat[ids]                                    # (S, C)
        s = skin[ids]                                    # (S, J)
        gt_sim = (2.0 - jnp.sum(jnp.abs(s[None] - s[:, None]), axis=-1)) / 2.0
        pos_mat = (gt_sim > sim_threshold).astype(jnp.float32)
        neg_mat = 1.0 - pos_mat
        # padded rows can be neither positives nor negatives of anyone
        pos_mat = pos_mat * row_ok[None, :].astype(jnp.float32)
        neg_mat = neg_mat * row_ok[None, :].astype(jnp.float32)
        # guard rows with no positives/negatives (diagonal is always positive)
        pos_p = pos_mat / jnp.maximum(pos_mat.sum(-1, keepdims=True), 1e-9)
        neg_p = neg_mat / jnp.maximum(neg_mat.sum(-1, keepdims=True), 1e-9)
        pos_ids = jax.vmap(lambda k, pr: jax.random.choice(k, num_sample, (num_pos,), p=pr))(
            jax.random.split(k2, num_sample), pos_p
        )
        neg_ids = jax.vmap(lambda k, pr: jax.random.choice(k, num_sample, (num_neg,), p=pr))(
            jax.random.split(k3, num_sample), neg_p
        )
        prod = f @ f.T                                   # (S, S)
        prod_neg = jnp.take_along_axis(prod, neg_ids, axis=1)        # (S, num_neg)
        prod_pos = jnp.take_along_axis(prod, pos_ids, axis=1)        # (S, num_pos)
        # CE with label 0 (positive first): -pos + logsumexp([pos, negs])
        lse = jax.vmap(
            lambda pp: jax.nn.logsumexp(
                jnp.concatenate([pp[:, None], prod_neg], axis=1), axis=1
            ),
            in_axes=1, out_axes=1,
        )(prod_pos)                                      # (S, num_pos)
        ce = lse - prod_pos
        # degenerate rows contribute nothing: zero negatives, or a padded
        # (invalid) anchor row sampled when num_sample > valid count
        ok = (neg_mat.sum(-1) > 0) & row_ok
        ce = jnp.where(ok[:, None], ce, 0.0)
        return jnp.sum(ce.mean(axis=1)) / jnp.maximum(ok.sum(), 1)

    keys = jax.random.split(key, B)
    losses = jax.vmap(per_sample)(keys, feature, gt_skin, vert_mask)
    return jnp.mean(losses)
