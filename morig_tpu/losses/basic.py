"""Chamfer, soft-label cross-entropy, masked BCE/L1, and auxiliary losses.

Replaces models/customized_losses.py:216-291 (chamfer, cross_entropy_with_probs)
and the functional losses used inline by the training scripts
(BCE-with-logits at train_corr_pose.py:66, L1 at train_deform_pose.py:62),
all in masked padded-batch form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from morig_tpu.kernels.neighbors import pairwise_sqdist

POS = 1e30


def chamfer_with_average(
    p1: jax.Array, p2: jax.Array,
    mask1: jax.Array | None = None, mask2: jax.Array | None = None,
) -> jax.Array:
    """Symmetric mean-of-min chamfer on one pair of point sets.

    Reference: customized_losses.py:231-251 (0.5 * (mean(min_d1) + mean(min_d2)),
    distances are euclidean norms, not squared).
    """
    d = jnp.sqrt(jnp.maximum(pairwise_sqdist(p1, p2), 1e-12))
    if mask2 is not None:
        d = jnp.where(mask2[None, :], d, POS)
    d1 = jnp.min(d, axis=1)
    if mask1 is not None:
        m1 = mask1.astype(d.dtype)
        mean1 = jnp.sum(d1 * m1) / jnp.maximum(m1.sum(), 1.0)
    else:
        mean1 = jnp.mean(d1)
    d_t = d if mask1 is None else jnp.where(mask1[:, None], d, POS)
    d2 = jnp.min(d_t, axis=0)
    if mask2 is not None:
        m2 = mask2.astype(d.dtype)
        mean2 = jnp.sum(d2 * m2) / jnp.maximum(m2.sum(), 1.0)
    else:
        mean2 = jnp.mean(d2)
    return 0.5 * (mean1 + mean2)


def batched_chamfer_with_average(p1, p2, mask1, mask2) -> jax.Array:
    """Mean over batch of per-sample chamfer (train_rig.py:176-181 semantics)."""
    per = jax.vmap(chamfer_with_average)(p1, p2, mask1, mask2)
    return jnp.mean(per)


def chamfer_directional(
    p1: jax.Array, p2: jax.Array,
    mask1: jax.Array | None = None, mask2: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """The two halves of chamfer_with_average, unaveraged.

    Returns (mean over p1 of min-dist to p2, mean over p2 of min-dist to p1).
    The second term is the coverage/"recall" direction when p2 is a GT joint
    set: every GT joint must attract some predicted point.  Exposing the two
    directions lets training weight joint coverage above placement precision
    (the reference fixes them equal, customized_losses.py:248-250)."""
    d = jnp.sqrt(jnp.maximum(pairwise_sqdist(p1, p2), 1e-12))
    dm = d if mask2 is None else jnp.where(mask2[None, :], d, POS)
    d1 = jnp.min(dm, axis=1)
    if mask1 is not None:
        m1 = mask1.astype(d.dtype)
        mean1 = jnp.sum(d1 * m1) / jnp.maximum(m1.sum(), 1.0)
    else:
        mean1 = jnp.mean(d1)
    d_t = d if mask1 is None else jnp.where(mask1[:, None], d, POS)
    d2 = jnp.min(d_t, axis=0)
    if mask2 is not None:
        m2 = mask2.astype(d.dtype)
        mean2 = jnp.sum(d2 * m2) / jnp.maximum(m2.sum(), 1.0)
    else:
        mean2 = jnp.mean(d2)
    return mean1, mean2


def masked_l1_weighted(pred: jax.Array, target: jax.Array, mask: jax.Array,
                       weights: jax.Array) -> jax.Array:
    """masked_l1 with a per-element scalar weight (same shape as mask).

    Weighted mean: sum(w*m*|err|) / sum(w*m*dims) — reduces to masked_l1 at
    weights==1."""
    m = mask.astype(pred.dtype) * weights.astype(pred.dtype)
    while m.ndim < pred.ndim:
        m = m[..., None]
    num = jnp.sum(jnp.abs(pred - target) * m)
    den = jnp.sum(jnp.broadcast_to(m, pred.shape))
    return num / jnp.maximum(den, 1.0)


def cross_entropy_with_probs(
    logits: jax.Array, target_probs: jax.Array, weight: jax.Array | None = None,
) -> jax.Array:
    """Soft-label CE per element (customized_losses.py:216-228, reduction='none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    losses = -target_probs * logp
    if weight is not None:
        losses = losses * weight
    return losses


def bce_with_logits(logits: jax.Array, targets: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Mean binary cross-entropy with logits over valid elements."""
    per = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(per.dtype)
    while m.ndim < per.ndim:
        m = m[..., None]
    m = jnp.broadcast_to(m, per.shape)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_l1(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean |pred - target| over valid elements (train_deform_pose.py:62)."""
    m = mask.astype(pred.dtype)
    while m.ndim < pred.ndim:
        m = m[..., None]
    num = jnp.sum(jnp.abs(pred - target) * m)
    den = jnp.sum(jnp.broadcast_to(m, pred.shape))
    return num / jnp.maximum(den, 1.0)


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(pred.dtype)
    while m.ndim < pred.ndim:
        m = m[..., None]
    num = jnp.sum((pred - target) ** 2 * m)
    den = jnp.sum(jnp.broadcast_to(m, pred.shape))
    return num / jnp.maximum(den, 1.0)
