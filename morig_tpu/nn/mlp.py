"""The universal MLP block: Linear -> ReLU -> MaskedBatchNorm per stage.

Mirrors the reference block structure (models/basic_modules.py:31-36) where
every MLP stage is Lin -> ReLU -> BatchNorm1d.  Mask-aware and train/eval
aware; channels are specified like the reference's `MLP([c0, c1, c2])`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from flax import linen as nn

from morig_tpu.nn.norm import MaskedBatchNorm


class MLP(nn.Module):
    channels: Sequence[int]          # hidden+output dims (input inferred)
    batch_norm: bool = True
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, name=f"dense_{i}")(x)
            x = nn.relu(x)
            if self.batch_norm:
                x = MaskedBatchNorm(
                    momentum=self.bn_momentum, eps=self.bn_eps,
                    axis_name=self.axis_name, name=f"bn_{i}",
                )(x, mask, train)
        return x


class MLPHead(nn.Module):
    """MLP followed by a final plain Linear (the reference's
    `Seq(MLP([...]), Lin(c, out))` pattern, e.g. corrnet.py:22,33,35)."""

    channels: Sequence[int]
    out: int
    batch_norm: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        x = MLP(self.channels, batch_norm=self.batch_norm, axis_name=self.axis_name, name="mlp")(x, mask, train)
        return nn.Dense(self.out, name="out")(x)
