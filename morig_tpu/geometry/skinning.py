"""Skinning post-processing: one-ring smoothing, pruning, normalization.

Replaces the reference's duplicated post_filter (evaluate/joint2rig.py:165-194
and training/train_skin.py:40-67) and the prune/renormalize steps
(joint2rig.py:461-462). The smoothing is a dense masked neighbor-mean over the
fixed-width topology table — one gather + reduction on device instead of a
per-vertex Python loop over edge lists.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_ring",))
def post_filter_skin(
    skin: jax.Array,       # (V, B) per-vertex bone weights
    tpl_nbr: jax.Array,    # (V, D) one-ring table (slot 0 = self)
    tpl_mask: jax.Array,   # (V, D)
    num_ring: int = 1,
) -> jax.Array:
    """Replace each vertex's weights with the mean of its ring neighbors
    (excluding itself), iterated num_ring times — the reference's smoothing
    (joint2rig.py:165-194).  Vertices with no neighbors keep their weights."""
    nbr_mask = tpl_mask.at[:, 0].set(False)  # drop self-loop slot
    for _ in range(num_ring):
        gathered = skin[tpl_nbr]                                   # (V,D,B)
        m = nbr_mask[..., None].astype(skin.dtype)
        num = jnp.sum(gathered * m, axis=1)
        den = jnp.sum(m, axis=1)
        smoothed = num / jnp.maximum(den, 1e-10)
        has_nbr = jnp.any(nbr_mask, axis=1)[:, None]
        skin = jnp.where(has_nbr, smoothed, skin)
    return skin


@jax.jit
def prune_and_normalize(skin: jax.Array, prune_ratio: float = 0.35) -> jax.Array:
    """Zero weights below prune_ratio x row max, renormalize rows
    (joint2rig.py:461-462)."""
    mx = jnp.max(skin, axis=-1, keepdims=True)
    kept = jnp.where(skin < mx * prune_ratio, 0.0, skin)
    return kept / (jnp.sum(kept, axis=-1, keepdims=True) + 1e-10)
