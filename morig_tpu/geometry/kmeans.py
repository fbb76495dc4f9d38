"""Kernel k-means over joint feature+euclidean affinities.

Replaces utils/kernel_kmeans.py:2-98 (exploratory clustering used to study
motion-embedding quality).  Fixed-iteration Lloyd updates on device: the
assignment and centroid steps are dense masked matmuls inside a fori_loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.kernels.neighbors import pairwise_sqdist


@partial(jax.jit, static_argnames=("num_clusters", "num_iter"))
def kernel_kmeans(
    features: jax.Array,        # (N, C) embedding features
    positions: jax.Array,       # (N, 3) euclidean coordinates
    num_clusters: int,
    key: jax.Array,
    feature_weight: float = 1.0,
    position_weight: float = 1.0,
    num_iter: int = 20,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Cluster points by a blend of feature and euclidean distance.
    Returns (N,) int cluster assignments."""
    n = features.shape[0]
    valid = jnp.ones(n, bool) if mask is None else mask
    # init: random distinct valid points as centroids
    logits = jnp.where(valid, 0.0, -1e30)
    init_idx = jax.random.categorical(key, logits, shape=(num_clusters,))
    cf = features[init_idx]
    cp = positions[init_idx]

    def body(_, carry):
        cf, cp = carry
        d = feature_weight * pairwise_sqdist(features, cf) + \
            position_weight * pairwise_sqdist(positions, cp)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, num_clusters) * valid[:, None]
        cnt = jnp.maximum(onehot.sum(0), 1e-10)
        cf_new = (onehot.T @ features) / cnt[:, None]
        cp_new = (onehot.T @ positions) / cnt[:, None]
        keep = (onehot.sum(0) > 0)[:, None]
        return jnp.where(keep, cf_new, cf), jnp.where(keep, cp_new, cp)

    cf, cp = jax.lax.fori_loop(0, num_iter, body, (cf, cp))
    d = feature_weight * pairwise_sqdist(features, cf) + \
        position_weight * pairwise_sqdist(positions, cp)
    return jnp.argmin(d, axis=1)
