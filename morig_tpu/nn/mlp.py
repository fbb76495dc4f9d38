"""The universal MLP block: Linear -> ReLU -> Norm per stage.

Mirrors the reference block structure (models/basic_modules.py:31-36) where
every MLP stage is Lin -> ReLU -> BatchNorm1d.  The normalization layer is
pluggable:

  * "layer" (default) — LayerNorm.  TPU-first choice: no running statistics,
    no masked batch coupling, identical train/eval behavior, no cross-replica
    sync, and — empirically on low-motion data — far better conditioned than
    BN, whose small-variance channels make the loss surface chaotic
    (SURVEY.md §7 risk (b)).
  * "batch" — MaskedBatchNorm, exact reference semantics for checkpoint
    parity experiments.
  * "none" — Lin+ReLU only (the reference's MLP(batch_norm=False)).

The default is a module-level setting (set_default_norm) so every model in
the tree switches together without threading a flag through each module.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from morig_tpu.nn.norm import MaskedBatchNorm

_DEFAULT_NORM = "layer"
_INFER_DTYPE = "auto"


def set_default_norm(name: str) -> None:
    """Set the process-wide default normalization ("layer"|"batch"|"none").
    Affects modules *initialized after* the call."""
    global _DEFAULT_NORM
    assert name in ("layer", "batch", "none")
    _DEFAULT_NORM = name


def get_default_norm() -> str:
    return _DEFAULT_NORM


def set_inference_dtype(name: str) -> None:
    """Matmul precision at inference in the "layer"-norm mode:
    "auto" (bf16 on accelerators, fp32 on CPU), "bf16", or "f32".
    Training and the "batch" parity mode always compute in fp32."""
    global _INFER_DTYPE
    assert name in ("auto", "bf16", "f32")
    _INFER_DTYPE = name


def infer_matmul_dtype(train: bool):
    """Computation dtype for MLP Dense layers: bf16 at inference on
    accelerators (LayerNorm statistics stay fp32) — the MXU runs bf16 at 2x
    fp32 throughput and the per-vertex activations halve their HBM traffic.
    Returns None (fp32) in training, in the "batch" parity mode, or on CPU."""
    import jax as _jax

    if train or _DEFAULT_NORM != "layer" or _INFER_DTYPE == "f32":
        return None
    if _INFER_DTYPE == "bf16":
        import jax.numpy as _jnp

        return _jnp.bfloat16
    try:
        if _jax.default_backend() == "cpu":
            return None
    except RuntimeError:
        return None
    import jax.numpy as _jnp

    return _jnp.bfloat16


class MLP(nn.Module):
    channels: Sequence[int]          # hidden+output dims (input inferred)
    batch_norm: bool = True          # False -> no norm at all (reference flag)
    norm: Optional[str] = None       # None -> process default
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        norm = (self.norm or _DEFAULT_NORM) if self.batch_norm else "none"
        dt = infer_matmul_dtype(train)
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, dtype=dt, name=f"dense_{i}")(x)
            x = nn.relu(x)
            if norm == "batch":
                x = MaskedBatchNorm(
                    momentum=self.bn_momentum, eps=self.bn_eps,
                    axis_name=self.axis_name, name=f"bn_{i}",
                )(x, mask, train)
            elif norm == "layer":
                # fp32 statistics and output; the next Dense re-casts to bf16
                x = nn.LayerNorm(dtype=jnp.float32, name=f"ln_{i}")(x)
        return x.astype(jnp.float32)


class MLPHead(nn.Module):
    """MLP followed by a final plain Linear (the reference's
    `Seq(MLP([...]), Lin(c, out))` pattern, e.g. corrnet.py:22,33,35).

    `zero_init` zero-initializes the final Linear — used by every
    regression/logit head.  Rationale: post-ReLU LayerNorm features carry
    coherent per-channel bias (LN normalizes across channels, not across the
    batch), so a default-initialized head outputs O(4) values that saturate
    downstream tanh/sigmoids before training starts; starting the head at 0
    keeps early training in the linear regime.  (The reference's BatchNorm
    centers per channel, which hides this.)  Embedding heads that are
    L2-normalized downstream keep the default init.
    """

    channels: Sequence[int]
    out: int
    batch_norm: bool = True
    norm: Optional[str] = None
    zero_init: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None, train: bool = False) -> jax.Array:
        x = MLP(self.channels, batch_norm=self.batch_norm, norm=self.norm,
                axis_name=self.axis_name, name="mlp")(x, mask, train)
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        dt = infer_matmul_dtype(train)
        out = nn.Dense(self.out, dtype=dt, kernel_init=init, name="out")(x)
        return out.astype(jnp.float32)
