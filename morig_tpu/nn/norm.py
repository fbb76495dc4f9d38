"""Masked batch normalization.

The reference uses `torch.nn.BatchNorm1d` inside every MLP block
(models/basic_modules.py:31-36), with statistics over all vertices/points of
the PyG-concatenated batch.  Under padding, naive BN would mix padded zeros
into the statistics, so this module computes mean/var over *valid* elements
only (mask-weighted), keeps running statistics with torch-compatible momentum
semantics (new = (1-m)*old + m*batch), and optionally syncs statistics across
a named mesh axis for data-parallel training (the multi-device analogue of the
reference's single-GPU BN).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array], train: bool) -> jax.Array:
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if train:
            # Two-pass masked moments: E[(x-mean)^2], NOT E[x^2]-mean^2 — the
            # one-pass form catastrophically cancels in fp32 for small-variance
            # channels (post-ReLU activations of small inputs), which poisons
            # the normalized outputs and explodes gradients.
            xf = x.astype(jnp.float32)
            if mask is None:
                m = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
            else:
                m = mask
                while m.ndim < x.ndim:
                    m = m[..., None]
                m = m.astype(jnp.float32)
            cnt = jnp.sum(m) * 1.0
            s = jnp.sum((xf * m).reshape(-1, C), axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            centered = (xf - mean) * m
            sq = jnp.sum((centered * centered).reshape(-1, C), axis=0)
            if self.axis_name is not None:
                sq = jax.lax.psum(sq, self.axis_name)
            var = sq / cnt
            if not self.is_initializing():
                # torch-style unbiased running var
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(x.dtype)
