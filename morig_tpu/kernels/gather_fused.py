"""Fused one-hot-matmul row gather — kills the flow program's gather stalls.

XLA lowers batched row gathers (`vmap(lambda v, i: v[i])`) on TPU to a
row-at-a-time DMA loop: ~6-8 ns per gathered row regardless of row width.
The PointNet++ SA grouping, FP interpolation, and DeformNet voting/completion
paths gather 5.2M / 1.3M / 1.2M rows per flow iteration — profiled at
~87 ms/iter of the 672 ms flow program (tools/profile_flow_roofline.py,
round 5), all running at ~2 GB/s effective.

This kernel re-expresses the gather as `one_hot(idx) @ values` with the
one-hot built in VMEM (never materialized to HBM) and the matmul on the MXU:
  * one-hot construction: one VPU compare+select per (row, candidate) —
    ~1024 lanes/cycle, so ~1 ns/row at N=1024;
  * exactness: values are split hi/lo into two bf16 halves packed side by
    side, so ONE matmul of width 2C reconstructs the fp32 value to ~2^-17
    relative (hi covers the top 8 mantissa bits, lo the next 8+) — the
    documented tolerance of every consumer (parity tests pass at 1e-4).

Reference call sites being replaced: torch-geometric's gather-based message
passing in models/basic_modules.py:66-138 and the boolean-indexed flow
interpolation of models/deformnet.py:49-95.

Training keeps the XLA gather (fp32-bitexact, scatter-add backward); the
kernel is inference-path only, selected by the `train` flag at each site.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 2 ** 20


def hilo_pack(values: jax.Array) -> jax.Array:
    """Pack fp32 (..., C) into (..., 2C) bf16 [hi | lo] halves.

    The split is done via bit masking: XLA folds f32->bf16->f32 convert
    pairs under its excess-precision rule, which silently zeroes an
    arithmetic `x - bf16(x)` residual.  Truncating the low mantissa bits
    instead gives an exactly-representable bf16 hi and an exact f32
    residual (hi's mantissa is a prefix of x's), rounded once into bf16 lo.
    `one_hot @ packed` then reconstructs the value to ~2^-17 relative as
    `out[:C] + out[C:]`."""
    hi32 = jax.lax.bitcast_convert_type(values, jnp.uint32) \
        & jnp.uint32(0xFFFF0000)
    vh32 = jax.lax.bitcast_convert_type(hi32, jnp.float32)
    vh = vh32.astype(jnp.bfloat16)                       # exact
    vl = (values - vh32).astype(jnp.bfloat16)
    return jnp.concatenate([vh, vl], axis=-1)


def _gather_kernel(idx_ref, vhl_ref, out_ref, *, N, C):
    # idx arrives as an 8-sublane row group — the smallest legal VMEM block
    # for an int32 array (Mosaic requires the last-two block dims divisible
    # by (8, 128) or equal to the array dims; a (1, TM) block of (B, Mp) is
    # rejected on hardware and 1D blocks hit XLA/Mosaic minor-tiling
    # mismatches — interpret-mode tests enforce neither).  One dynamic
    # sublane read picks this program's row; refetch cost is 8x the idx
    # bytes (~0.2 ms/GB-scale call), vs B x for a full-batch block.
    idx = idx_ref[0, pl.program_id(0) % 8]               # (TM,) int32
    TM = idx.shape[0]
    # one-hot built TRANSPOSED (candidates on sublanes, gather rows on
    # lanes): the idx block then stays (1, TM) — a plain 2D slice of the
    # (B, M) index array, avoiding the 128x-padded (B, M, 1) relayout copy
    # XLA emits for a trailing singleton dim (profiled at 4 ms/iter)
    ii = jax.lax.broadcasted_iota(jnp.int32, (N, TM), 0)
    oh_t = (ii == idx[None, :]).astype(jnp.bfloat16)     # (N, TM)
    res = jax.lax.dot_general(
        oh_t, vhl_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TM, 2C)
    out_ref[0] = res[:, :C] + res[:, C:]


def _pick_tm(M, N, C):
    """Largest m-tile whose one-hot + output + idx row group fit VMEM."""
    tm = 4096
    while tm > 128 and (tm * N * 2 + tm * C * 4 + 2 * N * 2 * C * 2
                        + 8 * tm * 4 > _VMEM_BUDGET or tm > M):
        tm //= 2
    return max(tm, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_fused_raw(values, idx, interpret: bool = False):
    """values (B, N, C) f32, idx (B, M) int32 -> (B, M, C) f32."""
    B, N, C = values.shape
    M = idx.shape[1]
    vhl = hilo_pack(values)                              # (B, N, 2C)
    TM = _pick_tm(M, N, C)
    Mp = -(-M // TM) * TM
    Bp = -(-B // 8) * 8
    idx_p = jnp.pad(idx, ((0, Bp - B), (0, Mp - M)))         # (Bp, Mp)
    idx_g = idx_p.reshape(Bp // 8, 8, Mp)                    # 8-row groups
    G = Mp // TM
    out = pl.pallas_call(
        functools.partial(_gather_kernel, N=N, C=C),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, 8, TM), lambda b, m: (b // 8, 0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 2 * C), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TM, C), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Mp, C), jnp.float32),
        interpret=interpret,
    )(idx_g, vhl)
    return out[:, :M]


_IMPL = "auto"     # "auto" | "fused" | "xla"


def set_gather_impl(mode: str) -> None:
    """"fused" = Pallas one-hot matmul, "xla" = native gather, "auto" =
    fused on non-CPU backends when shapes allow.  Read at trace time."""
    global _IMPL
    assert mode in ("auto", "fused", "xla")
    _IMPL = mode


def get_gather_impl() -> str:
    return _IMPL


def _shapes_ok(values, idx) -> bool:
    B, N, C = values.shape
    # N on the one-hot lane axis (any size works, cost scales with it; cap
    # where the values block itself would blow VMEM), 2C packed lanes
    return N % 16 == 0 and N * 2 * C * 2 <= 4 * 2 ** 20 and C <= 256


def gather_rows(values, idx, train: bool = False, *, interpret: bool = False):
    """Batched row gather: (B, N, C) values, (B, ...) int32 -> (B, ..., C).

    Drop-in for `vmap(lambda v, i: v[i])`.  Inference on accelerators routes
    through the fused one-hot-matmul kernel (values reconstructed to ~2^-17
    relative); training and CPU keep the exact XLA gather.
    """
    lead = idx.shape
    idx2 = idx.reshape(idx.shape[0], -1)
    use_fused = interpret or _IMPL == "fused" or (
        _IMPL == "auto" and not train
        and jax.default_backend() not in ("cpu",)
    )
    if use_fused and _shapes_ok(values, idx2):
        interp = interpret or jax.default_backend() == "cpu"
        out = _gather_fused_raw(values, idx2, interpret=interp)
    else:
        out = jax.vmap(lambda v, i: v[i])(values, idx2)
    return out.reshape(lead + (values.shape[-1],))
