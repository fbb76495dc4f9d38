"""Fused Pallas EdgeMLP kernel — the framework's hottest op.

The edge-message MLP (nn/gcu.py EdgeMLP) dominates every model's runtime.  In
the XLA path the gathered per-edge tensor (B, V, D, H) round-trips HBM between
the gather, the second Dense and the masked max — measured gather cost alone
is ~30x the bandwidth roofline on v5e (XLA lowers row gathers poorly).  This
kernel keeps everything in VMEM:

  for each (batch b, vertex tile of TV rows):
    load a-tile (TV,H1), the full b-table (V,H1), neighbor ids (D,TV), W2
    for d in 0..D-1 (static unroll):
      gather   = onehot(nbr[d]) @ b_table          # MXU, (TV,V)x(V,H1)
      h1       = LayerNorm(relu(a + gather))       # VPU, fp32 stats
      h2       = LayerNorm(relu(h1 @ W2 + b2))     # MXU + VPU
      acc      = where(mask[d], max(acc, h2), acc)
    out tile = acc                                  # only (TV,H2) hits HBM

Only the "layer" normalization mode is supported (LayerNorm eps matches flax,
1e-6).  Training runs the same forward through `fused_edge_mlp_trainable`,
whose backward is either the one-pass fused backward kernel (`_bwd_kernel`:
in-kernel recompute + every gradient without leaving VMEM) or a
rematerialized XLA VJP (exact fp32 cotangents) — see nn/gcu.py set_edge_bwd.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


def _ln(h, scale, bias, n_true=None):
    """LayerNorm; with `n_true`, statistics cover only the first n_true
    channels (the rest are zero lane padding whose scale/bias are zero, so
    their outputs stay exactly 0)."""
    if n_true is None:
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) * (h - mu), axis=-1, keepdims=True)
    else:
        mu = jnp.sum(h, axis=-1, keepdims=True) / n_true
        var = jnp.maximum(
            jnp.sum(h * h, axis=-1, keepdims=True) / n_true - mu * mu, 0.0)
    return (h - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _edge_tail(a, gathered, mask_dv, w2, b2, g1, be1, g2, be2, degree, TV, H2,
               h1_true=None, h2_true=None):
    """Shared tail: per-edge MLP on degree-major flattened rows + masked max.

    a (TV,H1) fp32; gathered (D*TV, H1) fp32 (row d*TV+v = features of
    neighbor d of vertex v); mask_dv (D,TV) int32.  Mosaic note: sublane-axis
    concatenation and static slices are used instead of (D,TV)<->(D*TV,)
    reshapes, which its layout inference rejects."""
    a_rep = jnp.concatenate([a] * degree, axis=0)          # (D*TV, H1)
    h = jnp.maximum(a_rep + gathered, 0.0)
    h = _ln(h, g1, be1, h1_true)
    h2 = jnp.dot(h.astype(jnp.bfloat16), w2, preferred_element_type=jnp.float32)
    h2 = jnp.maximum(h2 + b2, 0.0)
    h2 = _ln(h2, g2, be2, h2_true)
    acc = jnp.full((TV, H2), -1e30, jnp.float32)
    n_valid = jnp.zeros((TV, 1), jnp.int32)
    for d in range(degree):
        m = mask_dv[d, :].reshape(TV, 1)
        acc = jnp.where(m > 0, jnp.maximum(acc, h2[d * TV:(d + 1) * TV]), acc)
        n_valid = n_valid + m
    return jnp.where(n_valid > 0, acc, 0.0)


def _kernel(a_ref, btab_ref, nbr_ref, mask_ref, w2_ref, b2_ref,
            g1_ref, be1_ref, g2_ref, be2_ref, out_ref, *, degree,
            h1_true=None, h2_true=None):
    # ONE (D*TV, V) one-hot matmul gathers every edge of the tile at once —
    # large MXU ops instead of `degree` small ones (the small-matmul version
    # was pipeline-overhead-bound at ~2% MFU).
    a = a_ref[0].astype(jnp.float32)                       # (TV,H1)
    btab = btab_ref[0]                                     # (V,H1) bf16
    TV = a.shape[0]
    V = btab.shape[0]
    H2 = out_ref.shape[-1]
    g1, be1 = g1_ref[0].astype(jnp.float32), be1_ref[0].astype(jnp.float32)
    g2, be2 = g2_ref[0].astype(jnp.float32), be2_ref[0].astype(jnp.float32)
    w2 = w2_ref[:]
    b2 = b2_ref[0].astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (TV, V), 1)
    onehot = jnp.concatenate([
        (col == nbr_ref[0, d, :].reshape(TV, 1)) for d in range(degree)
    ], axis=0).astype(jnp.bfloat16)                        # (D*TV, V)
    gathered = jnp.dot(onehot, btab, preferred_element_type=jnp.float32)
    out_ref[0] = _edge_tail(a, gathered, mask_ref[0], w2, b2,
                            g1, be1, g2, be2, degree, TV, H2,
                            h1_true, h2_true)


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret",
                                             "h1_true", "h2_true"))
def fused_edge_mlp(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2, tile_v: int = 256,
                   interpret: bool = False, h1_true=None, h2_true=None):
    """a (B,V,H1) fp32/bf16, b_table (B,V,H1), nbr/mask (B,V,D) int32/bool,
    w2 (H1,H2), vectors (H,) — returns (B,V,H2) fp32.

    Semantics identical to nn/gcu.py EdgeMLP's XLA tail (relu→LN→dense→relu→
    LN→masked-max)."""
    B, V, H1 = a.shape
    D = nbr.shape[-1]
    H2 = w2.shape[-1]
    TV = min(tile_v, V)
    assert V % TV == 0, (V, TV)
    nbr_t = jnp.transpose(nbr, (0, 2, 1)).astype(jnp.int32)        # (B,D,V)
    mask_t = jnp.transpose(mask.astype(jnp.int32), (0, 2, 1))      # (B,D,V)

    grid = (B, V // TV)
    vec = lambda x: x.reshape(1, -1)
    out = pl.pallas_call(
        functools.partial(_kernel, degree=D, h1_true=h1_true, h2_true=h2_true),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TV, H1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, H1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, TV), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, TV), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, H2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TV, H2), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, V, H2), jnp.float32),
        interpret=interpret,
    )(
        a.astype(jnp.bfloat16), b_table.astype(jnp.bfloat16), nbr_t, mask_t,
        w2.astype(jnp.bfloat16), vec(b2), vec(g1), vec(be1), vec(g2), vec(be2),
    )
    return out


def _reference_edge_mlp(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2,
                        bf16: bool):
    if bf16:
        a = a.astype(jnp.bfloat16).astype(jnp.float32)
        b_table = b_table.astype(jnp.bfloat16).astype(jnp.float32)
    gathered = jax.vmap(lambda xb, nb: xb[nb])(b_table, nbr)     # (B,V,D,H1)
    h = jnp.maximum(a[:, :, None, :] + gathered, 0.0)
    h = _ln(h, g1, be1)
    if bf16:
        h2 = jnp.dot(h.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + b2
    else:
        h2 = h @ w2 + b2
    h2 = jnp.maximum(h2, 0.0)
    h2 = _ln(h2, g2, be2)
    neg = jnp.where(mask[..., None], h2, -1e30)
    out = jnp.max(neg, axis=2)
    return jnp.where(jnp.any(mask, axis=2)[..., None], out, 0.0)


def reference_edge_mlp(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2):
    """Pure-XLA fp32 oracle with identical semantics (for parity tests)."""
    return _reference_edge_mlp(a, b_table, nbr, mask, w2, b2, g1, be1, g2,
                               be2, bf16=False)


def reference_edge_mlp_bf16(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2):
    """XLA oracle matching the fused kernels' PRECISION exactly: bf16 input
    rounding and a bf16 second matmul with fp32 accumulation.  Gradients of
    this function route the masked-max backward identically to the fused
    backward kernel (same forward values -> same argmax), which makes
    elementwise gradient parity assertions deterministic."""
    return _reference_edge_mlp(a, b_table, nbr, mask, w2, b2, g1, be1, g2,
                               be2, bf16=True)


# ---------------------------------------------------------------------------
# windowed variant: neighbor locality -> O(1)-in-V gather cost
# ---------------------------------------------------------------------------
#
# For coherently-ordered meshes (ring-ordered fixtures; arbitrary meshes after
# a reverse-Cuthill-McKee reorder at preprocessing) every neighbor of a
# TV-sized vertex tile lies within the tile's 3-block halo.  The kernel then
# builds the one-hot against a 3*TV window instead of all V rows — the gather
# matmul shrinks from O(V) to O(3*TV) per row and stops scaling with mesh
# size.  Validity must be guaranteed by the caller (check_neighbor_locality).

def _kernel_windowed(a_ref, w0_ref, w1_ref, w2blk_ref, nbr_ref, mask_ref,
                     w2_ref, b2_ref, g1_ref, be1_ref, g2_ref, be2_ref,
                     out_ref, *, degree, tile_v, num_blocks,
                     h1_true=None, h2_true=None):
    a = a_ref[0].astype(jnp.float32)
    window = jnp.concatenate([w0_ref[0], w1_ref[0], w2blk_ref[0]], axis=0)  # (3TV,H1)
    TV = a.shape[0]
    H2 = out_ref.shape[-1]
    g1, be1 = g1_ref[0].astype(jnp.float32), be1_ref[0].astype(jnp.float32)
    g2, be2 = g2_ref[0].astype(jnp.float32), be2_ref[0].astype(jnp.float32)
    w2 = w2_ref[:]
    b2 = b2_ref[0].astype(jnp.float32)

    i = pl.program_id(1)
    ws = jnp.clip(i - 1, 0, num_blocks - 3) * tile_v      # window start row
    col = jax.lax.broadcasted_iota(jnp.int32, (TV, 3 * tile_v), 1)
    onehot = jnp.concatenate([
        (col == (nbr_ref[0, d, :].reshape(TV, 1) - ws)) for d in range(degree)
    ], axis=0).astype(jnp.bfloat16)                        # (D*TV, 3TV)
    gathered = jnp.dot(onehot, window, preferred_element_type=jnp.float32)
    out_ref[0] = _edge_tail(a, gathered, mask_ref[0], w2, b2,
                            g1, be1, g2, be2, degree, TV, H2,
                            h1_true, h2_true)


def check_neighbor_locality(nbr: np.ndarray, tile_v: int = 256) -> bool:
    """True iff every neighbor of every TV-tile lies in the tile's 3-block
    halo (the windowed kernel's precondition)."""
    nbr = np.asarray(nbr)
    B, V, D = nbr.shape
    if V % tile_v:
        return False
    nb = V // tile_v
    tiles = nbr.reshape(B, nb, tile_v, D)
    for i in range(nb):
        ws = np.clip(i - 1, 0, nb - 3) * tile_v
        t = tiles[:, i]
        if (t < ws).any() or (t >= ws + 3 * tile_v).any():
            return False
    return True


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret",
                                             "h1_true", "h2_true"))
def fused_edge_mlp_windowed(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2,
                            tile_v: int = 256, interpret: bool = False,
                            h1_true=None, h2_true=None):
    """Windowed fused EdgeMLP; caller must guarantee neighbor locality
    (check_neighbor_locality)."""
    B, V, H1 = a.shape
    D = nbr.shape[-1]
    H2 = w2.shape[-1]
    TV = min(tile_v, V)
    assert V % TV == 0 and V // TV >= 3, (V, TV)
    NB = V // TV
    nbr_t = jnp.transpose(nbr, (0, 2, 1)).astype(jnp.int32)
    mask_t = jnp.transpose(mask.astype(jnp.int32), (0, 2, 1))
    vec = lambda x: x.reshape(1, -1)

    def wblk(off):
        return pl.BlockSpec(
            (1, TV, H1),
            lambda b, i, off=off: (b, jnp.clip(i - 1, 0, NB - 3) + off, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(_kernel_windowed, degree=D, tile_v=TV, num_blocks=NB,
                          h1_true=h1_true, h2_true=h2_true),
        grid=(B, NB),
        in_specs=[
            pl.BlockSpec((1, TV, H1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            wblk(0), wblk(1), wblk(2),
            pl.BlockSpec((1, D, TV), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, TV), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((H1, H2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TV, H2), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, V, H2), jnp.float32),
        interpret=interpret,
    )(
        a.astype(jnp.bfloat16), b_table.astype(jnp.bfloat16),
        b_table.astype(jnp.bfloat16), b_table.astype(jnp.bfloat16),
        nbr_t, mask_t,
        w2.astype(jnp.bfloat16), vec(b2), vec(g1), vec(be1), vec(g2), vec(be2),
    )
    return out


# ---------------------------------------------------------------------------
# fused backward kernel
# ---------------------------------------------------------------------------
#
# Recomputes the forward INSIDE the kernel (the residuals are just the
# inputs, exactly like remat) and produces every gradient in one pass with
# no (B, V, D, H) HBM intermediates:
#   - the max backward routes dout to the argmax edges by exact equality
#     against the in-kernel recomputed per-edge outputs, splitting ties
#     equally (reduce_max VJP semantics);
#   - the gather backward (scatter-add into the neighbor table) is the
#     TRANSPOSE one-hot matmul (V, D*TV) x (D*TV, H1), accumulated across
#     vertex tiles in a VMEM-resident (V, H1) fp32 block;
#   - dW2/db2/LN-vector grads accumulate across the whole grid in resident
#     blocks (TPU grids run sequentially, so revisited blocks are safe).
# This is what makes fused-forward TRAINING profitable: the remat-XLA
# backward re-pays the XLA gather program; this kernel never leaves VMEM.

def _ln_fwd(h, scale, bias):
    """LayerNorm returning (out, xn, inv_sigma) for in-kernel backward."""
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) * (h - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xn = (h - mu) * inv
    return xn * scale + bias, xn, inv


def _ln_bwd(dy, scale, xn, inv):
    """Grad wrt the LN input given grad wrt its output (per-row statistics)."""
    dxn = dy * scale
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=-1, keepdims=True)
    return (dxn - m1 - xn * m2) * inv


def _bwd_kernel(a_ref, btab_ref, nbr_ref, mask_ref, w2_ref, w2t_ref, b2_ref,
                g1_ref, be1_ref, g2_ref, be2_ref, dout_ref,
                da_ref, db_ref, dw2_ref, db2_ref, dg1_ref, dbe1_ref,
                dg2_ref, dbe2_ref, *, degree):
    a = a_ref[0].astype(jnp.float32)                       # (TV,H1)
    btab = btab_ref[0]                                     # (V,H1) bf16
    TV = a.shape[0]
    V = btab.shape[0]
    g1, be1 = g1_ref[0].astype(jnp.float32), be1_ref[0].astype(jnp.float32)
    g2, be2 = g2_ref[0].astype(jnp.float32), be2_ref[0].astype(jnp.float32)
    w2 = w2_ref[:]
    w2t = w2t_ref[:]
    b2 = b2_ref[0].astype(jnp.float32)
    mask_dv = mask_ref[0]                                  # (D,TV) int32

    mxu = w2.dtype                                         # bf16 (or f32 in
    # the `precise` formula-validation mode of fused_edge_mlp_bwd)

    # ---- forward recompute (identical math to _kernel/_edge_tail) --------
    col = jax.lax.broadcasted_iota(jnp.int32, (TV, V), 1)
    onehot = jnp.concatenate([
        (col == nbr_ref[0, d, :].reshape(TV, 1)) for d in range(degree)
    ], axis=0).astype(mxu)                                 # (D*TV, V)
    gathered = jnp.dot(onehot, btab, preferred_element_type=jnp.float32)
    a_rep = jnp.concatenate([a] * degree, axis=0)          # (D*TV, H1)
    x = a_rep + gathered
    r = jnp.maximum(x, 0.0)
    h, xn1, inv1 = _ln_fwd(r, g1, be1)
    s = jnp.dot(h.astype(mxu), w2,
                preferred_element_type=jnp.float32) + b2
    t = jnp.maximum(s, 0.0)
    y, xn2, inv2 = _ln_fwd(t, g2, be2)                     # (D*TV, H2)

    H2 = y.shape[-1]
    acc = jnp.full((TV, H2), -1e30, jnp.float32)
    n_valid = jnp.zeros((TV, 1), jnp.int32)
    for d in range(degree):
        m = mask_dv[d, :].reshape(TV, 1)
        acc = jnp.where(m > 0, jnp.maximum(acc, y[d * TV:(d + 1) * TV]), acc)
        n_valid = n_valid + m

    # ---- max backward: equal split among exactly-equal valid edges -------
    dout = jnp.where(n_valid > 0, dout_ref[0].astype(jnp.float32), 0.0)
    eq_parts = []
    cnt = jnp.zeros((TV, H2), jnp.float32)
    for d in range(degree):
        m = (mask_dv[d, :].reshape(TV, 1) > 0)
        e = jnp.where(m, (y[d * TV:(d + 1) * TV] == acc).astype(jnp.float32),
                      0.0)
        eq_parts.append(e)
        cnt = cnt + e
    dshare = dout / jnp.maximum(cnt, 1.0)
    dy = jnp.concatenate([e * dshare for e in eq_parts], axis=0)  # (D*TV,H2)

    # ---- LN2 / relu / dense backward --------------------------------------
    dt = _ln_bwd(dy, g2, xn2, inv2)
    ds = jnp.where(s > 0, dt, 0.0)
    dh = jnp.dot(ds.astype(mxu), w2t,
                 preferred_element_type=jnp.float32)       # (D*TV, H1)
    dw2_c = jax.lax.dot_general(
        h.astype(mxu), ds.astype(mxu),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # ---- LN1 / relu backward ----------------------------------------------
    dr = _ln_bwd(dh, g1, xn1, inv1)
    dx = jnp.where(x > 0, dr, 0.0)                         # (D*TV, H1)

    # ---- input grads -------------------------------------------------------
    da = jnp.zeros_like(a)
    for d in range(degree):
        da = da + dx[d * TV:(d + 1) * TV]
    da_ref[0] = da
    db_c = jax.lax.dot_general(onehot, dx.astype(mxu),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (V,H1)

    # ---- accumulated outputs (blocks resident across grid steps) ---------
    i = pl.program_id(1)
    first_tile = i == 0
    first_all = jnp.logical_and(pl.program_id(0) == 0, first_tile)
    sums = (
        (dw2_ref, dw2_c),
        (db2_ref, jnp.sum(ds, axis=0, keepdims=True)),
        (dg1_ref, jnp.sum(dh * xn1, axis=0, keepdims=True)),
        (dbe1_ref, jnp.sum(dh, axis=0, keepdims=True)),
        (dg2_ref, jnp.sum(dy * xn2, axis=0, keepdims=True)),
        (dbe2_ref, jnp.sum(dy, axis=0, keepdims=True)),
    )

    @pl.when(first_tile)
    def _init_db():
        db_ref[0] = db_c

    @pl.when(jnp.logical_not(first_tile))
    def _acc_db():
        db_ref[0] = db_ref[0] + db_c

    @pl.when(first_all)
    def _init_sums():
        for ref, val in sums:
            ref[:] = val

    @pl.when(jnp.logical_not(first_all))
    def _acc_sums():
        for ref, val in sums:
            ref[:] = ref[:] + val


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret", "precise"))
def fused_edge_mlp_bwd(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2, dout,
                       tile_v: int = 128, interpret: bool = False,
                       precise: bool = False):
    """One-pass fused backward of `fused_edge_mlp` (full-table variant).

    Returns (da, db_table, dw2, db2, dg1, dbe1, dg2, dbe2), matching the
    cotangents of `reference_edge_mlp` up to bf16 matmul rounding (the
    rounding happens at different points than XLA's cast-VJP, so individual
    entries differ by ~bf16-eps times the local LayerNorm amplification).
    `precise=True` runs every matmul in fp32 — the formula-validation mode
    used by tests, where parity with the fp32 XLA VJP is ~1e-5.  Full
    128-multiple channel widths only (the trainable dispatch guarantees it).
    """
    B, V, H1 = a.shape
    D = nbr.shape[-1]
    H2 = w2.shape[-1]
    TV = min(tile_v, V)
    assert V % TV == 0, (V, TV)
    mxu = jnp.float32 if precise else jnp.bfloat16
    nbr_t = jnp.transpose(nbr, (0, 2, 1)).astype(jnp.int32)
    mask_t = jnp.transpose(mask.astype(jnp.int32), (0, 2, 1))
    vec = lambda z: z.reshape(1, -1)

    grid = (B, V // TV)
    const = lambda *blk: pl.BlockSpec(blk, lambda b, i: (0,) * len(blk),
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, degree=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TV, H1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, H1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, TV), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, TV), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            const(H1, H2),
            const(H2, H1),
            const(1, H2), const(1, H1), const(1, H1), const(1, H2), const(1, H2),
            pl.BlockSpec((1, TV, H2), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TV, H1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, H1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            const(H1, H2),
            const(1, H2), const(1, H1), const(1, H1), const(1, H2), const(1, H2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, V, H1), jnp.float32),
            jax.ShapeDtypeStruct((B, V, H1), jnp.float32),
            jax.ShapeDtypeStruct((H1, H2), jnp.float32),
            jax.ShapeDtypeStruct((1, H2), jnp.float32),
            jax.ShapeDtypeStruct((1, H1), jnp.float32),
            jax.ShapeDtypeStruct((1, H1), jnp.float32),
            jax.ShapeDtypeStruct((1, H2), jnp.float32),
            jax.ShapeDtypeStruct((1, H2), jnp.float32),
        ],
        interpret=interpret,
    )(
        a.astype(mxu), b_table.astype(mxu), nbr_t, mask_t,
        w2.astype(mxu), w2.T.astype(mxu), vec(b2),
        vec(g1), vec(be1), vec(g2), vec(be2), dout,
    )
    da, db, dw2, db2, dg1, dbe1, dg2, dbe2 = outs
    # db_table was accumulated per batch sample; it is already (B, V, H1).
    return (da, db, dw2, db2.reshape(-1), dg1.reshape(-1), dbe1.reshape(-1),
            dg2.reshape(-1), dbe2.reshape(-1))


# ---------------------------------------------------------------------------
# trainable wrapper: fused forward + rematerialized XLA backward
# ---------------------------------------------------------------------------
#
# The backward of the masked max needs the per-(vertex, channel) winning edge,
# which the fused kernel does not save (keeping it would spill (B,V,D,H2) to
# HBM — exactly the traffic the kernel eliminates).  Instead the backward
# REMATERIALIZES the XLA edge program and differentiates it: training pays the
# gather once (backward) instead of twice (forward+backward), and the forward
# runs at fused-kernel speed.  Gradients are exact for the fp32 XLA semantics;
# the bf16 fused forward differs from the fp32 primal by normal mixed-precision
# noise (same trade as remat-with-different-precision).

@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_edge_mlp_trainable(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2,
                             windowed: bool = False, interpret: bool = False,
                             pallas_bwd: bool = False, bwd_tile_v: int = 128):
    fn = fused_edge_mlp_windowed if windowed else fused_edge_mlp
    return fn(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2,
              interpret=interpret)


def _trainable_fwd(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2,
                   windowed, interpret, pallas_bwd, bwd_tile_v):
    out = fused_edge_mlp_trainable(a, b_table, nbr, mask, w2, b2, g1, be1,
                                   g2, be2, windowed, interpret, pallas_bwd,
                                   bwd_tile_v)
    return out, (a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2)


def _trainable_bwd(windowed, interpret, pallas_bwd, bwd_tile_v, res, g):
    a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2 = res

    if pallas_bwd:
        # one-pass fused backward: no XLA gather/scatter, no (B,V,D,H)
        # HBM intermediates.  The gather topology is tile-agnostic, so the
        # backward runs at its own (usually smaller) VMEM-gated tile even
        # when the forward was windowed.
        da, db, dw2, db2, dg1, dbe1, dg2, dbe2 = fused_edge_mlp_bwd(
            a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2, g,
            tile_v=bwd_tile_v, interpret=interpret)
        return da, db, None, None, dw2, db2, dg1, dbe1, dg2, dbe2

    def primal(a, b_table, w2, b2, g1, be1, g2, be2):
        return reference_edge_mlp(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2)

    _, vjp = jax.vjp(primal, a, b_table, w2, b2, g1, be1, g2, be2)
    da, db, dw2, db2, dg1, dbe1, dg2, dbe2 = vjp(g)
    return da, db, None, None, dw2, db2, dg1, dbe1, dg2, dbe2


fused_edge_mlp_trainable.defvjp(_trainable_fwd, _trainable_bwd)


# ---------------------------------------------------------------------------
# small-channel dispatch: lane padding
# ---------------------------------------------------------------------------

def fused_edge_mlp_auto(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2,
                        windowed: bool = False, tile_v: int = 256,
                        interpret: bool = False):
    """Dispatch to the fused kernels for ANY channel width.

    Widths below the 128 TPU lane width are zero-padded: a/b/W2 rows pad with
    zeros, LayerNorm scale/bias pad with zeros (so padded channels output
    exactly 0 and contribute nothing to the tail matmul), and the in-kernel
    LayerNorm statistics divide by the TRUE width.  This replaces the
    XLA-path gathers of the small edge layers (profiled at ~3x the cost of a
    full fused 128-wide layer) with the same single-gather-matmul kernel.
    """
    H1 = w2.shape[0]
    H2 = w2.shape[1]

    def up(n):
        return max(128, ((n + 127) // 128) * 128)

    P1, P2 = up(H1), up(H2)
    h1_true = H1 if P1 != H1 else None
    h2_true = H2 if P2 != H2 else None
    if P1 != H1 or P2 != H2:
        padc = lambda x, p: jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, p - x.shape[-1]),))
        a = padc(a, P1)
        b_table = padc(b_table, P1)
        w2 = jnp.pad(w2, ((0, P1 - H1), (0, P2 - H2)))
        b2 = jnp.pad(b2, (0, P2 - H2))
        g1 = jnp.pad(g1, (0, P1 - H1))     # zero scale -> padded channels = 0
        be1 = jnp.pad(be1, (0, P1 - H1))
        g2 = jnp.pad(g2, (0, P2 - H2))
        be2 = jnp.pad(be2, (0, P2 - H2))
    fn = fused_edge_mlp_windowed if windowed else fused_edge_mlp
    out = fn(a, b_table, nbr, mask, w2, b2, g1, be1, g2, be2,
             tile_v=tile_v, interpret=interpret,
             h1_true=h1_true, h2_true=h2_true)
    return out[..., :H2] if P2 != H2 else out
