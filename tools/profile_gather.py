"""Micro-benchmark: voxel-grid lookup strategies for the LOS sampling.

The volumetric-geodesic LOS pass is ~12M random lookups into an 88^3
occupancy grid per pipeline iteration (geometry/voxel.py inside_check_jax) —
essentially 100 % of the device geodesic cost (tools/profile_geodesic.py).
Compares lowering strategies at bench scale:

  A. 3-coordinate advanced indexing grid[x, y, z]   (current)
  B. flattened linear-index gather  grid_flat[i]
  C. B with the grid padded to 128^3 (shift/or index arithmetic)

  python tools/profile_gather.py [--n 8000000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from morig_tpu.core.compile_cache import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp
import numpy as np


def _fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=5):
    _fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _fence(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_000_000)
    args = ap.parse_args()
    D = 88
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.random((D, D, D)) > 0.5)
    grid_flat = jnp.asarray(np.asarray(grid).reshape(-1).astype(np.uint8))
    Dp = 128
    gp = np.zeros((Dp, Dp, Dp), np.uint8)
    gp[:D, :D, :D] = np.asarray(grid)
    grid_pad = jnp.asarray(gp.reshape(-1))
    idx = jnp.asarray(rng.integers(0, D, (args.n, 3)).astype(np.int32))

    @jax.jit
    def a(grid, idx):
        return grid[idx[:, 0], idx[:, 1], idx[:, 2]]

    @jax.jit
    def b(grid_flat, idx):
        lin = (idx[:, 0] * D + idx[:, 1]) * D + idx[:, 2]
        return grid_flat[lin]

    @jax.jit
    def c(grid_pad, idx):
        lin = (
            (idx[:, 0].astype(jnp.int32) << 14)
            | (idx[:, 1].astype(jnp.int32) << 7)
            | idx[:, 2].astype(jnp.int32)
        )
        return grid_pad[lin]

    # D: gather whole z-ROWS (contiguous minor dim — lane-vectorized), then
    # select the z entry with a one-hot multiply-reduce on the VPU.  Element
    # gathers pay full gather latency per SAMPLE; this pays it per ROW and
    # streams 88 contiguous bytes each.
    grid_rows = jnp.asarray(
        np.asarray(grid).reshape(D * D, D).astype(np.uint8))
    zi = jnp.arange(D, dtype=jnp.int32)

    @jax.jit
    def d(grid_rows, idx):
        rows = grid_rows[idx[:, 0] * D + idx[:, 1]]            # (N, D)
        z1h = (idx[:, 2:3] == zi[None, :])
        return jnp.max(jnp.where(z1h, rows, 0), axis=-1)

    # E: D with a bf16 dot instead of the masked max (MXU-eligible form)
    grid_rows_bf = grid_rows.astype(jnp.bfloat16)

    @jax.jit
    def e(grid_rows_bf, idx):
        rows = grid_rows_bf[idx[:, 0] * D + idx[:, 1]]         # (N, D)
        z1h = (idx[:, 2:3] == zi[None, :]).astype(jnp.bfloat16)
        return jnp.sum(rows * z1h, axis=-1)

    print(f"N={args.n}")
    print(f"  A 3d-index bool grid : {timeit(a, grid, idx):8.1f} ms")
    print(f"  B flat u8 gather     : {timeit(b, grid_flat, idx):8.1f} ms")
    print(f"  C flat u8 pow2 shift : {timeit(c, grid_pad, idx):8.1f} ms")
    print(f"  D z-row u8 + 1hot max: {timeit(d, grid_rows, idx):8.1f} ms")
    print(f"  E z-row bf16 + dot   : {timeit(e, grid_rows_bf, idx):8.1f} ms")


if __name__ == "__main__":
    main()
