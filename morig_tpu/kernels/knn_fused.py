"""Fused cosine-kNN Pallas kernel — kills the flow program's (V,P) traffic.

The DeformNet voting path (nn/deformnet.py:95,109 — reference
models/deformnet.py:49,92) and the CorrNet vismask 1-NN (nn/corrnet.py:144 —
reference models/corrnet.py:62-74) each materialize a (B,V,P) or (B,V,V)
similarity matrix in HBM and then run k argmax sweeps over it.  At bench
shapes (B*T=160, V=1536, P=1024) that is ~1-1.5 GB per materialization and
the sweeps re-read/re-write it k times — the single largest HBM-traffic
family in the flow phase (profiled: the two giant fusions + the sweep
fusions ≈ 40% of the 790 ms flow program).

This kernel never leaves VMEM: for each (batch b, query tile of TV rows) it
computes the similarity tile on the MXU, applies the candidate mask, runs the
k first-index-wins argmax sweeps in registers/VMEM, and writes only the
(TV, k) indices + scores to HBM.  Bytes from HBM drop from O(V*P) per sweep
to O(V*C + P*C) total.

Semantics match kernels/neighbors.py `knn(..., cosine=True)` exactly:
score = <q, c> (features expected pre-normalized), masked candidates get
NEG, ties resolve to the smallest index, fully-masked rows return index 0
with NEG scores.

Training: `knn_batched` carries a custom VJP (same cotangent structure as
the XLA path — gradients flow only into the selected (q, c_idx) pairs), so
the fused kernel is usable under jax.grad.
"""
from __future__ import annotations

import functools

import jax
import jax.dtypes
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
_KPAD = 128          # lane-padded k in the kernel output; sliced outside
# Scoped-VMEM budget for the in-kernel (TV, P) working set: the similarity
# tile (f32), the column iota (i32), and the selection mask/bf16 cast are all
# TV*P-sized — ~12 bytes/element with Mosaic's padding.  Mosaic's hard scoped
# limit is 16 MB; 10 MB leaves room for the I/O blocks + double buffering.
# (Observed: TV=512 at P=4096 allocates 17.42M and fails to compile.)
_VMEM_WORK_BUDGET = 10 * 1024 * 1024
_TILE_BYTES_PER_ELEM = 12


def _pick_tile(N: int, P: int, tile_v: int) -> int | None:
    """Largest vertex tile that divides N and keeps the (TV, P) working set
    inside the scoped-VMEM budget; None when even TV=8 cannot fit."""
    cap = _VMEM_WORK_BUDGET // (P * _TILE_BYTES_PER_ELEM)
    TV = min(tile_v, N)
    while TV > 8 and (N % TV or TV > cap):
        TV //= 2
    if TV < 8 or N % TV or TV > cap:
        return None
    return TV


def _knn_kernel(q_ref, ct_ref, m_ref, idx_ref, score_ref, *, k):
    _knn_body(q_ref, ct_ref, m_ref, None, idx_ref, score_ref, None, k=k, C=0)


def _knn_gather_kernel(q_ref, ct_ref, m_ref, vhl_ref, idx_ref, score_ref,
                       gout_ref, *, k, C):
    _knn_body(q_ref, ct_ref, m_ref, vhl_ref, idx_ref, score_ref, gout_ref,
              k=k, C=C)


def _knn_body(q_ref, ct_ref, m_ref, vhl_ref, idx_ref, score_ref, gout_ref,
              *, k, C):
    q = q_ref[0]                                   # (TV, C)
    ct = ct_ref[0]                                 # (C, P)
    m = m_ref[0]                                   # (1, P) int32
    sim = jax.lax.dot_general(
        q, ct, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (TV, P) fp32
    sim = jnp.where(m > 0, sim, NEG)
    TV, P = sim.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (TV, P), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (TV, _KPAD), 1)
    out_i = jnp.zeros((TV, _KPAD), jnp.int32)
    out_s = jnp.full((TV, _KPAD), NEG, jnp.float32)
    for j in range(k):
        smax = jnp.max(sim, axis=-1, keepdims=True)                  # (TV,1)
        # first index attaining the max (argmax tie-break parity)
        imax = jnp.min(jnp.where(sim == smax, col, P), axis=-1,
                       keepdims=True).astype(jnp.int32)              # (TV,1)
        imax = jnp.minimum(imax, P - 1)    # all-NEG rows: slot 0 semantics
        imax = jnp.where(smax > NEG / 2, imax, 0)
        out_i = jnp.where(kcol == j, imax, out_i)
        out_s = jnp.where(kcol == j, smax, out_s)
        msel = col == imax                                            # (TV,P)
        if gout_ref is not None:
            # the selection mask IS the gather one-hot: one (TV,P)@(P,2C)
            # MXU dot per sweep returns the selected value rows (hi/lo bf16
            # halves packed side by side, summed to ~2^-17-relative fp32) —
            # the consumer's row gather never touches HBM-side XLA gather
            g = jnp.dot(msel.astype(jnp.bfloat16), vhl_ref[0],
                        preferred_element_type=jnp.float32)           # (TV,2C)
            gout_ref[0, :, j, :] = g[:, :C] + g[:, C:]
        sim = jnp.where(msel, NEG, sim)
    idx_ref[0] = out_i
    score_ref[0] = out_s


@functools.partial(jax.jit, static_argnames=("k", "tile_v", "interpret"))
def _fused_raw(query, cand, mask, k: int, tile_v: int = 512,
               interpret: bool = False, values=None):
    """query (B,N,C), cand (B,P,C), mask (B,P) bool -> idx (B,N,k) i32,
    score (B,N,k) fp32 [, gathered (B,N,k,Cv) fp32 when `values` (B,P,Cv)
    is given].  N must divide by an 8-multiple tile; P % 128 == 0.

    The similarity matmul runs in bf16 with fp32 accumulation (the same
    precision the fused edge kernel uses; measured 2x over tiling in f32).
    With `values`, each sweep's selection mask doubles as a gather one-hot
    (one extra (TV,P)@(P,2Cv) dot per sweep) so the consumer's row gather
    never runs as an XLA per-row DMA loop."""
    B, N, C = query.shape
    P = cand.shape[1]
    assert P >= k, (P, k)
    TV = _pick_tile(N, P, tile_v)
    assert TV is not None, (N, P, tile_v)
    query = query.astype(jnp.bfloat16)
    cand_t = jnp.transpose(cand.astype(jnp.bfloat16), (0, 2, 1))   # (B,C,P)
    mask_i = mask.astype(jnp.int32)[:, None, :]                # (B,1,P)
    grid = (B, N // TV)
    in_specs = [
        pl.BlockSpec((1, TV, C), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, P), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, TV, _KPAD), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TV, _KPAD), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N, _KPAD), jnp.int32),
        jax.ShapeDtypeStruct((B, N, _KPAD), jnp.float32),
    ]
    if values is None:
        kern = functools.partial(_knn_kernel, k=k)
        args = (query, cand_t, mask_i)
    else:
        from morig_tpu.kernels.gather_fused import hilo_pack

        Cv = values.shape[-1]
        kern = functools.partial(_knn_gather_kernel, k=k, C=Cv)
        in_specs.append(pl.BlockSpec((1, P, 2 * Cv), lambda b, i: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        out_specs.append(pl.BlockSpec((1, TV, k, Cv),
                                      lambda b, i: (b, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, N, k, Cv), jnp.float32))
        args = (query, cand_t, mask_i, hilo_pack(values))
    out = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=tuple(out_specs),
        out_shape=tuple(out_shape), interpret=interpret,
    )(*args)
    if values is None:
        idx, score = out
        return idx[..., :k], score[..., :k]
    idx, score, gathered = out
    return idx[..., :k], score[..., :k], gathered


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_vjp(query, cand, mask, k: int, interpret: bool):
    return _fused_raw(query, cand, mask, k, interpret=interpret)


def _fused_fwd(query, cand, mask, k, interpret):
    idx, score = _fused_raw(query, cand, mask, k, interpret=interpret)
    return (idx, score), (query, cand, mask, idx)


def _fused_bwd(k, interpret, res, cots):
    query, cand, mask, idx = res
    _, d_score = cots                       # indices carry no cotangent
    d_score = d_score.astype(query.dtype)
    # score_j = <q_v, c_{idx_j}>  (selected entries only — identical
    # cotangent structure to the XLA topk-sweep path)
    c_sel = jax.vmap(lambda c, i: c[i])(cand, idx)            # (B,N,k,C)
    dq = jnp.einsum("bnk,bnkc->bnc", d_score, c_sel)
    contrib = d_score[..., None] * query[:, :, None, :]       # (B,N,k,C)
    dc = jax.vmap(
        lambda i, u: jnp.zeros(cand.shape[1:], query.dtype).at[
            i.reshape(-1)].add(u.reshape(-1, u.shape[-1]))
    )(idx, contrib)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    return dq, dc, dmask


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_g_vjp(query, cand, mask, values, k: int, interpret: bool):
    return _fused_raw(query, cand, mask, k, interpret=interpret,
                      values=values)


def _fused_g_fwd(query, cand, mask, values, k, interpret):
    out = _fused_raw(query, cand, mask, k, interpret=interpret, values=values)
    idx = out[0]
    return out, (query, cand, mask, idx, values.shape)


def _fused_g_bwd(k, interpret, res, cots):
    query, cand, mask, idx, vshape = res
    _, d_score, d_gathered = cots
    dq, dc, dmask = _fused_bwd(k, interpret, (query, cand, mask, idx),
                               (None, d_score))
    # gathered_j = values[idx_j]: cotangent scatter-adds into the selected
    # rows (selection itself is non-differentiable, like the XLA
    # gather-of-top_k path)
    dvals = jax.vmap(
        lambda i, g: jnp.zeros(vshape[1:], g.dtype).at[
            i.reshape(-1)].add(g.reshape(-1, g.shape[-1]))
    )(idx, d_gathered)
    return dq, dc, dmask, dvals


_fused_g_vjp.defvjp(_fused_g_fwd, _fused_g_bwd)


# ---------------------------------------------------------------------------
# public entry: batched cosine kNN with automatic fused/XLA dispatch
# ---------------------------------------------------------------------------

# "auto" = fused Pallas kernel on accelerator backends (hardware-verified in
# tests_tpu/test_knn_fused_tpu.py: exact scores, ~1.2x over the XLA sweep at
# bench shapes, and no (B,V,P) HBM materialization), XLA sweep on CPU.
_IMPL = "auto"     # "auto" | "fused" | "xla"


def set_knn_impl(mode: str) -> None:
    """"fused" = Pallas kernel, "xla" = vmapped neighbors.knn,
    "auto" = fused on non-CPU backends when shapes allow.  Read at trace
    time (like gcu.set_edge_impl)."""
    global _IMPL
    assert mode in ("auto", "fused", "xla")
    _IMPL = mode


def get_knn_impl() -> str:
    return _IMPL


def _shapes_ok(query, cand, k) -> bool:
    B, N, C = query.shape
    P = cand.shape[1]
    # k <= _KPAD: the kernel writes k results into a _KPAD-wide block; an
    # oversized k would silently truncate to _KPAD columns (ADVICE r4 #1).
    # _pick_tile None: no vertex tile keeps the (TV, P) working set inside
    # scoped VMEM — the XLA sweep handles those shapes.
    return (N % 8 == 0) and (P % 128 == 0) and (P >= k) and (C <= 512) \
        and (k <= _KPAD) and (_pick_tile(N, P, 512) is not None)


def knn_batched(query, cand, k: int, cand_mask=None, *, gather_values=None,
                interpret=False):
    """Batched cosine top-k: (B,N,C) x (B,P,C) -> idx, score (B,N,k).

    Drop-in for `vmap(lambda q,c,m: neighbors.knn(q,c,k,m,cosine=True))`.
    Dispatches to the fused Pallas kernel when enabled and shapes allow;
    otherwise falls back to the vmapped XLA path.

    With `gather_values` (B,P,Cv), also returns `values[idx]` (B,N,k,Cv) as a
    third output — on the fused path the gather happens inside the kernel
    (the sweep's selection mask doubles as the gather one-hot, ~2^-17
    relative), replacing the XLA per-row gather that profiled at 6-8 ns/row.
    """
    from morig_tpu.kernels import neighbors as nbk

    if cand_mask is None:
        cand_mask = jnp.ones(cand.shape[:2], bool)
    use_fused = interpret or _IMPL == "fused" or (
        _IMPL == "auto"
        and jax.default_backend() not in ("cpu",)
    )
    gv_ok = gather_values is None or (
        gather_values.shape[-1] <= 256 and gather_values.shape[1] % 16 == 0)
    if use_fused and _shapes_ok(query, cand, k) and gv_ok:
        # on CPU the Mosaic backend is unavailable; interpret mode keeps the
        # fused path testable end-to-end (slow but exact)
        interp = interpret or jax.default_backend() == "cpu"
        if gather_values is None:
            return _fused_vjp(query, cand, cand_mask, k, interp)
        return _fused_g_vjp(query, cand, cand_mask,
                            gather_values.astype(jnp.float32), k, interp)
    idx, score = jax.vmap(lambda q, c, m: nbk.knn(q, c, k, m, cosine=True))(
        query, cand, cand_mask)
    if gather_values is None:
        return idx, score
    gathered = jax.vmap(lambda v, i: v[i])(gather_values, idx)
    return idx, score, gathered
