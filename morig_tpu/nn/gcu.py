"""Graph convolution units over fixed-width neighbor tables.

Re-design of the reference's PyG message-passing convs (EdgeConv / GCU /
EdgeConvMotion / GCUMotion, models/basic_modules.py:142-219) for TPU: instead
of edge lists + scatter_max, each vertex row carries a (D,) neighbor index
table with a validity mask (slot 0 = self loop, matching the reference's
remove+add_self_loops on every call, basic_modules.py:149-150).

Performance-critical restructuring (exact algebra, not an approximation):
the reference evaluates the first message-MLP layer per *edge* on the
concatenated input [x_i, x_j - x_i] — O(E · 2C · H) FLOPs and an (E, 2C)
intermediate.  Since that layer is linear,

    W [x_i ; x_j - x_i] + b  =  (W1 - W2) x_i  +  W2 x_j  +  b,

the two halves can be computed per *vertex* (two (V, C) @ (C, H) matmuls, a
degree-factor D fewer FLOPs) and combined after an H-wide gather.  Only the
nonlinear tail layers remain per-edge.  Profiled on v5e this takes the edge
stack from ~3% MXU utilization to a matmul-bound regime.  The masked max also
commutes with channel concat, so tpl/geo and x/pos branches reduce before
concatenation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from morig_tpu.kernels.neighbors import masked_max
from morig_tpu.nn.mlp import MLP, get_default_norm
from morig_tpu.nn.norm import MaskedBatchNorm


def gather_nbrs(x: jax.Array, nbr: jax.Array) -> jax.Array:
    """(B, V, C), (B, V, D) -> (B, V, D, C)."""
    return jax.vmap(lambda xb, nb: xb[nb])(x, nbr)


_EDGE_IMPL = "auto"
_EDGE_TILE = 256


def set_edge_tile(n: int) -> None:
    """Vertex tile size for the fused kernels.  Smaller tiles shrink the
    windowed kernel's gather width (3*tile rows) proportionally — profitable
    whenever the mesh's RCM index bandwidth fits the halo
    (check_neighbor_locality(nbr, tile_v=n))."""
    global _EDGE_TILE
    assert n % 8 == 0 and n > 0
    _EDGE_TILE = n


def get_edge_tile() -> int:
    return _EDGE_TILE


def set_edge_impl(name: str) -> None:
    """Select the edge-message implementation:
      "xla"     — pure XLA path (always; required for training)
      "fused"   — fused Pallas kernel at inference (full-table gather)
      "windowed"— fused Pallas kernel with 3-block halo gather; the caller
                  must have verified neighbor locality
                  (kernels.edge_fused.check_neighbor_locality)
      "auto"    — "fused" on TPU at inference when shapes allow, else "xla"
    """
    global _EDGE_IMPL
    assert name in ("auto", "xla", "fused", "windowed")
    _EDGE_IMPL = name


def get_edge_impl() -> str:
    return _EDGE_IMPL


_EDGE_BWD = "pallas"


def set_edge_bwd(name: str) -> None:
    """Backward implementation for fused-forward TRAINING
    (set_edge_impl("fused"|"windowed")):
      "pallas"    — one-pass fused backward kernel (edge_fused._bwd_kernel):
                    recompute + all gradients in VMEM, no XLA gather/scatter.
                    Falls back to remat-XLA per layer when the backward
                    stack exceeds the scoped-VMEM budget.
      "remat_xla" — rematerialized XLA backward (exact fp32 XLA cotangents).
    """
    global _EDGE_BWD
    assert name in ("pallas", "remat_xla")
    _EDGE_BWD = name


def get_edge_bwd() -> str:
    return _EDGE_BWD


def auto_select_edge_impl(entries, tile_v: int = 128,
                          max_fused_v: int = 2048) -> str:
    """Pick and SET the edge implementation for a batch of mesh entries
    (dicts with 'tpl_nbr'/'geo_nbr' (V, D) tables): 'windowed' when every
    table of every entry satisfies the 3-block halo locality at `tile_v`
    (ring-ordered fixtures; arbitrary meshes after the RCM reorder of
    data/preprocess.py), else 'fused' while the padded vertex count keeps
    the V-wide one-hot gather in budget, else 'xla'.  Returns the choice.

    Process-global, like set_edge_impl: call once per homogeneous batch
    (bench.py does this per V bucket)."""
    import numpy as np

    from morig_tpu.kernels.edge_fused import check_neighbor_locality

    V = max(int(np.asarray(e["tpl_nbr"]).shape[0]) for e in entries)
    local = V % tile_v == 0 and all(
        check_neighbor_locality(np.asarray(e[k])[None], tile_v=tile_v)
        for e in entries for k in ("tpl_nbr", "geo_nbr"))
    if local:
        set_edge_tile(tile_v)
        set_edge_impl("windowed")
    elif V <= max_fused_v:
        set_edge_impl("fused")
    else:
        set_edge_impl("xla")
    return get_edge_impl()


def _fusable(channels, V, H1, H2, tile_v=None, allow_small=False):
    tile_v = tile_v or _EDGE_TILE
    if get_default_norm() != "layer" or len(channels) != 2:
        return False
    if V % tile_v:
        return False
    if not allow_small and (H1 < 128 or H1 % 128 or H2 % 128):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except RuntimeError:
        return False


# Model-unit budget calibrated on v5e Mosaic stack accounting: the estimate
# below overcounts actual scoped-VMEM use by ~1.5x (measured: model 27.3 MB
# <-> actual 18.08 MB OOM at D=16,V=2048,H=256,TV=256; model 24.1 MB <->
# actual <=16 MB pass at H1=128), so 21 MB model-units ~= 14 MB actual,
# a safe margin under the 16 MB scoped limit.
_VMEM_BUDGET = 21 * 2 ** 20


def _vmem_tile(V, D, H1, H2, tile_v, windowed=False):
    """Largest vertex tile <= tile_v whose fused-kernel stack fits scoped
    VMEM, or None if no tile does (caller falls back to XLA).

    The full-table kernel materializes a (D*TV, V) bf16 one-hot, a
    (D*TV, P1) f32 gather and (D*TV, P2) f32 tail intermediates on the
    Mosaic stack, plus the double-buffered (V, P1) bf16 table block; the
    windowed kernel's gather width is 3*TV rows instead of V.  Exceeding
    the ~16 MB scoped budget is a COMPILE error (not a slowdown), so the
    dispatch must never emit a kernel over budget.  The windowed halo
    precondition (check_neighbor_locality at tile_v) does not survive a
    tile change, so windowed only ever uses the requested tile."""
    P1 = max(128, -(-H1 // 128) * 128)
    P2 = max(128, -(-H2 // 128) * 128)
    # the windowed halo precondition was checked at tile_v only, so windowed
    # never shrinks the tile: either tile_v itself fits (shape AND budget)
    # or the caller must fall back.  Tiles must be multiples of 128: the
    # (1, D, TV) neighbor-table block's last dim can't lower otherwise
    # (Mosaic requires last-dim % 128 == 0 or == the array dim).
    candidates = (tile_v,) if windowed else (tile_v, 128)
    for tv in candidates:
        if tv > tile_v or V % tv or tv % 128:
            continue
        width = 3 * tv if windowed else V
        need = D * tv * (2 * width + 4 * P1 + 4 * max(P1, P2)) \
            + 4 * width * P1
        if need <= _VMEM_BUDGET:
            return tv
    return None


def _vmem_tile_bwd(V, D, H1, H2, tile_v=128):
    """Largest vertex tile <= tile_v whose fused BACKWARD stack fits scoped
    VMEM, or None (caller falls back to remat-XLA for that layer).

    The backward holds the (D*TV, V) one-hot plus ~4 concurrently-live
    (D*TV, P1) and ~4 (D*TV, P2) fp32 rails (Mosaic fuses the elementwise
    LN/relu chains, but x/xn1/h must survive until the late matmuls and
    xn2/s-sign until the LN2 backward), and keeps BOTH the bf16 table block
    and the fp32 (V, P1) scatter accumulator resident.  Coefficients follow
    the sibling _vmem_tile's calibration style (model overcounts actual by
    ~1.5x against the 21 MB model budget); validated on TPU at the
    bench-train shape (V=2048, D=12, 128/256 -> TV=128,
    tests_tpu/test_edge_fused_tpu.py)."""
    # Empirical scoped-VMEM model calibrated on measured compile OOMs INSIDE
    # full train programs (where XLA parks the kernel's (B,V,H1) f32 outputs
    # in S(1) vmem, unlike the standalone kernel tests):
    #   D=12, V=2048, P=128/128, TV=128 -> 17.64 MB actual (OOM, limit 16)
    #   D=16, V=2048, P=128/128, TV=128 -> 23.82 MB actual (OOM)
    # actual ~= D*TV*(2V + 32*(P1+P2)) + 8*V*P1 within ~15%; gate at 15.5 MB
    # for margin.  At production shapes (V=2048, D=12) this rejects every
    # tile — the remat-XLA backward is the production training path; the
    # one-pass kernel engages only where it truly fits (small V / low D).
    P1 = max(128, -(-H1 // 128) * 128)
    P2 = max(128, -(-H2 // 128) * 128)
    for tv in (tile_v,):      # must stay a multiple of 128 (see _vmem_tile)
        if tv > tile_v or V % tv or tv % 128:
            continue
        need = D * tv * (2 * V + 32 * (P1 + P2)) + 8 * V * P1
        if need <= int(15.5 * 2 ** 20):
            return tv
    return None


class _Norm(nn.Module):
    """One post-ReLU normalization stage honoring the process default."""

    norm: Optional[str] = None
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None    # output/computation dtype (LayerNorm)

    @nn.compact
    def __call__(self, x, mask, train):
        norm = self.norm or get_default_norm()
        if norm == "batch":
            return MaskedBatchNorm(axis_name=self.axis_name, name="bn")(x, mask, train)
        if norm == "layer":
            return nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        return x


class EdgeMLP(nn.Module):
    """Per-edge message MLP over [x_i, x_j - x_i] with the decomposed linear
    first layer, followed by masked max over the degree axis.

    Parameterization: lin_self holds (W1 - W2) + bias, lin_nbr holds W2 — the
    exact reparameterization of the reference's first Linear over the
    concatenated input (basic_modules.py:154).

    The per-edge (B, V, D, H) intermediates are the framework's dominant HBM
    traffic; they are kept in bfloat16 (params stay fp32, LayerNorm statistics
    accumulate in fp32) — halving bandwidth on the hot path.  The reduced
    (B, V, H) output is returned in fp32.
    """

    channels: Sequence[int]
    axis_name: Optional[str] = None
    edge_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, nbr, nbr_mask, train: bool = False):
        # bf16 messages at inference only: training gradients through bf16
        # edge tensors measurably destabilize the small-lr Adam recipe, and
        # the "batch" norm mode is the exact-parity path — both stay fp32.
        norm = get_default_norm()
        dt = jnp.float32 if (train or norm == "batch") else self.edge_dtype
        h1 = self.channels[0]
        a = nn.Dense(h1, dtype=dt, name="lin_self")(x)
        b = nn.Dense(h1, dtype=dt, use_bias=False, name="lin_nbr")(x)

        if norm == "layer" and len(self.channels) == 2:
            # explicit tail params: shared by the XLA path and the fused
            # Pallas kernel (LayerNorm eps 1e-6, matching flax)
            h2 = self.channels[1]
            w2 = self.param("dense_1_kernel", nn.initializers.lecun_normal(), (h1, h2))
            b2 = self.param("dense_1_bias", nn.initializers.zeros, (h2,))
            g1 = self.param("ln0_scale", nn.initializers.ones, (h1,))
            be1 = self.param("ln0_bias", nn.initializers.zeros, (h1,))
            g2 = self.param("ln1_scale", nn.initializers.ones, (h2,))
            be2 = self.param("ln1_bias", nn.initializers.zeros, (h2,))

            impl = get_edge_impl()
            V = x.shape[1]
            # inference: fused on TPU whenever shapes allow ("auto"/"fused"/
            # "windowed").  training: fused forward + rematerialized XLA
            # backward (edge_fused.fused_edge_mlp_trainable), OPT-IN via
            # set_edge_impl("fused"|"windowed") — the bf16 fused forward adds
            # mixed-precision noise the default recipe doesn't assume.
            tile = _EDGE_TILE
            windowed = impl == "windowed" and V // tile >= 3
            D = nbr.shape[-1]
            base_ok = impl != "xla" and not self.is_initializing()
            args = (a.astype(jnp.float32), b.astype(jnp.float32),
                    nbr, nbr_mask, w2, b2, g1, be1, g2, be2)
            # sub-128-wide layers only pay off (and are worth their Mosaic
            # compile time) on large meshes; tiny fixtures keep XLA gathers
            allow_small = V >= 1024
            tv = _vmem_tile(V, D, h1, h2, tile, windowed=windowed)
            if windowed and tv is None:       # halo tile over budget: try
                windowed = False              # the full-table kernel instead
                tv = _vmem_tile(V, D, h1, h2, tile)
            if (base_ok and not train and tv is not None
                    and _fusable(self.channels, V, h1, h2,
                                 allow_small=allow_small)):
                from morig_tpu.kernels import edge_fused as ef

                # any channel width: sub-128 layers go through the lane-
                # padded dispatch (the XLA gather path costs ~3x a full
                # fused 128-wide layer even at H=16)
                return ef.fused_edge_mlp_auto(*args, windowed=windowed,
                                              tile_v=tv)
            # the trainable wrapper runs its forward at the kernel-default
            # tile (256), so its budget gate must be evaluated there
            tv_tr = min(256, V)
            if (base_ok and train and impl in ("fused", "windowed")
                    and _vmem_tile(V, D, h1, h2, tv_tr,
                                   windowed=windowed) == tv_tr
                    and _fusable(self.channels, V, h1, h2)):
                from morig_tpu.kernels import edge_fused as ef

                bw_tv = (_vmem_tile_bwd(V, D, h1, h2)
                         if get_edge_bwd() == "pallas" else None)
                return ef.fused_edge_mlp_trainable(
                    *args, windowed, False, bw_tv is not None, bw_tv or 128)

            from morig_tpu.kernels.edge_fused import _ln

            h = jnp.maximum(a[:, :, None, :] + gather_nbrs(b, nbr), 0.0)
            h = _ln(h, g1.astype(dt), be1.astype(dt))
            h = jnp.maximum(h @ w2.astype(dt) + b2.astype(dt), 0.0)
            h = _ln(h, g2.astype(dt), be2.astype(dt))
            return masked_max(h, nbr_mask, axis=2).astype(jnp.float32)

        h = a[:, :, None, :] + gather_nbrs(b, nbr)           # (B,V,D,H)
        h = nn.relu(h)
        h = _Norm(axis_name=self.axis_name, dtype=dt, name="norm_0")(h, nbr_mask, train)
        for i, ch in enumerate(self.channels[1:], start=1):
            h = nn.Dense(ch, dtype=dt, name=f"dense_{i}")(h)
            h = nn.relu(h)
            h = _Norm(axis_name=self.axis_name, dtype=dt, name=f"norm_{i}")(h, nbr_mask, train)
        return masked_max(h, nbr_mask, axis=2).astype(jnp.float32)


class EdgeConv(nn.Module):
    """DGCNN-style conv: max_j MLP([x_i, x_j - x_i]) over table neighbors.

    Reference: models/basic_modules.py:142-162 (message at :154).
    """

    mlp_channels: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, nbr, nbr_mask, train: bool = False):
        return EdgeMLP(self.mlp_channels, axis_name=self.axis_name, name="nn_pos")(
            x, nbr, nbr_mask, train
        )


class GCU(nn.Module):
    """Two parallel EdgeConvs — topology + geodesic edges — concat + fuse MLP.

    Reference: models/basic_modules.py:165-177.
    """

    out_channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mesh, train: bool = False):
        half = self.out_channels // 2
        x_tpl = EdgeConv([half, half], axis_name=self.axis_name, name="edge_conv_tpl")(
            x, mesh.tpl_nbr, mesh.tpl_mask, train
        )
        x_geo = EdgeConv([half, half], axis_name=self.axis_name, name="edge_conv_geo")(
            x, mesh.geo_nbr, mesh.geo_mask, train
        )
        x_out = jnp.concatenate([x_tpl, x_geo], axis=-1)
        return MLP([self.out_channels], axis_name=self.axis_name, name="mlp")(
            x_out, mesh.vert_mask, train
        )


class EdgeConvMotion(nn.Module):
    """EdgeConv with separate feature and position message MLPs.

    message = [nn_x([x_i, x_j - x_i]), nn_pos([pos_i, pos_j - pos_i])],
    max-aggregated per branch (max commutes with the channel concat).
    Reference: models/basic_modules.py:179-202.
    """

    x_channels: Sequence[int]
    pos_channels: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, x, nbr, nbr_mask, train: bool = False):
        x_feat = EdgeMLP(self.x_channels, axis_name=self.axis_name, name="nn_x")(
            x, nbr, nbr_mask, train
        )
        p_feat = EdgeMLP(self.pos_channels, axis_name=self.axis_name, name="nn_pos")(
            pos, nbr, nbr_mask, train
        )
        return jnp.concatenate([x_feat, p_feat], axis=-1)


class GCUMotion(nn.Module):
    """Motion-conditioned GCU: tpl+geo EdgeConvMotion pair + fuse MLP.

    Reference: models/basic_modules.py:205-219.  `pos` may be raw 3-d
    positions or a larger per-vertex descriptor (SkinNet passes a
    3+K*6..8-dim descriptor as `pos`; models/rignet.py:152-154).
    """

    out_channels: int
    dim_pos_feat: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, x, mesh, train: bool = False):
        half = self.out_channels // 2
        pc = [self.dim_pos_feat, self.dim_pos_feat]
        x_tpl = EdgeConvMotion([half, half], pc, axis_name=self.axis_name, name="edge_conv_tpl")(
            pos, x, mesh.tpl_nbr, mesh.tpl_mask, train
        )
        x_geo = EdgeConvMotion([half, half], pc, axis_name=self.axis_name, name="edge_conv_geo")(
            pos, x, mesh.geo_nbr, mesh.geo_mask, train
        )
        x_out = jnp.concatenate([x_tpl, x_geo], axis=-1)
        return MLP([self.out_channels], axis_name=self.axis_name, name="mlp")(
            x_out, mesh.vert_mask, train
        )
