"""Voxel grids: binvox IO, mesh voxelization, containment and line-of-sight.

Replaces utils/binvox_rw.py (format IO), utils/mst_utils.py:15-29
(inside_check), and — by design — the trimesh ray-casting visibility of
joint2rig.py:71-94: on TPU, vertex↔bone visibility is computed by sampling
the segment inside the same 88³ occupancy grid used everywhere else
(SURVEY.md §7 design move 5), vmapped over (vertex, bone) pairs.

The voxelizer lets the framework generate grids for synthetic fixtures and
for meshes that ship without .binvox files (the reference assumes
pre-computed binvox, README workflow).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Voxels:
    data: np.ndarray          # (D, D, D) bool, x-major
    translate: np.ndarray     # (3,)
    scale: float
    dims: int = 88


# ---------------------------------------------------------------------------
# binvox format IO (format: https://www.patrickmin.com/binvox/binvox.html)
# ---------------------------------------------------------------------------

def read_binvox(path: str) -> Voxels:
    with open(path, "rb") as f:
        line = f.readline().strip()
        if not line.startswith(b"#binvox"):
            raise ValueError(f"not a binvox file: {path}")
        dims = translate = scale = None
        while True:
            line = f.readline().strip().split()
            if not line:
                continue
            if line[0] == b"dim":
                dims = [int(x) for x in line[1:4]]
            elif line[0] == b"translate":
                translate = [float(x) for x in line[1:4]]
            elif line[0] == b"scale":
                scale = float(line[1])
            elif line[0] == b"data":
                break
        raw = np.frombuffer(f.read(), dtype=np.uint8)
    values, counts = raw[::2], raw[1::2].astype(np.int64)
    flat = np.repeat(values.astype(bool), counts)
    data = flat.reshape(dims)  # binvox stores x-major: [x][z][y]
    data = np.transpose(data, (0, 2, 1))
    return Voxels(data=np.ascontiguousarray(data),
                  translate=np.asarray(translate, np.float64),
                  scale=scale, dims=dims[0])


def write_binvox(vox: Voxels, path: str) -> None:
    data = np.transpose(vox.data, (0, 2, 1)).reshape(-1).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#binvox 1\n")
        f.write(f"dim {vox.dims} {vox.dims} {vox.dims}\n".encode())
        f.write(("translate " + " ".join(f"{t:g}" for t in vox.translate) + "\n").encode())
        f.write(f"scale {vox.scale:g}\n".encode())
        f.write(b"data\n")
        # RLE encode
        out = bytearray()
        i = 0
        n = len(data)
        while i < n:
            v = data[i]
            j = i
            while j < n and data[j] == v and j - i < 255:
                j += 1
            out += bytes([v, j - i])
            i = j
        f.write(bytes(out))


# ---------------------------------------------------------------------------
# voxelization
# ---------------------------------------------------------------------------

def voxelize_mesh(verts: np.ndarray, faces: np.ndarray, dims: int = 88,
                  pad: float = 0.02) -> Voxels:
    """Solid voxelization: rasterize the surface by dense face sampling, then
    flood-fill from the boundary and invert to get interior+surface.  The
    flood fill uses the C++ accelerator when built (morig_tpu.native),
    falling back to scipy binary_dilation."""
    lo = verts.min(0) - pad
    hi = verts.max(0) + pad
    scale = float((hi - lo).max())
    translate = lo

    grid = np.zeros((dims, dims, dims), bool)
    # deterministic barycentric supersampling: grid spacing <= half a cell,
    # so the rasterized shell is watertight for the flood fill below
    cell = scale / dims
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    edge = np.maximum(
        np.linalg.norm(v1 - v0, axis=1),
        np.maximum(np.linalg.norm(v2 - v0, axis=1), np.linalg.norm(v2 - v1, axis=1)),
    )
    n_per_face = np.clip(np.ceil(edge / cell * 2.0).astype(int) + 1, 2, 64)
    pts = [verts]
    for n in np.unique(n_per_face):
        sel = n_per_face == n
        i, j = np.meshgrid(np.arange(n + 1), np.arange(n + 1), indexing="ij")
        keep = (i + j) <= n
        u = (i[keep] / n)[None, :, None]
        w = (j[keep] / n)[None, :, None]
        a, b, c = v0[sel][:, None], v1[sel][:, None], v2[sel][:, None]
        pts.append((a + u * (b - a) + w * (c - a)).reshape(-1, 3))
    pts = np.concatenate(pts, axis=0)
    idx = np.clip(np.round((pts - translate) / scale * dims).astype(int), 0, dims - 1)
    grid[idx[:, 0], idx[:, 1], idx[:, 2]] = True

    # flood fill exterior
    from morig_tpu import native

    solid = native.solid_fill(grid)
    if solid is None:  # pure-python fallback
        from scipy import ndimage

        outside = np.zeros_like(grid)
        outside[0, :, :] = outside[-1, :, :] = True
        outside[:, 0, :] = outside[:, -1, :] = True
        outside[:, :, 0] = outside[:, :, -1] = True
        outside &= ~grid
        struct = ndimage.generate_binary_structure(3, 1)
        outside = ndimage.binary_dilation(outside, struct, iterations=-1, mask=~grid)
        solid = ~outside
    return Voxels(data=solid, translate=translate.astype(np.float64), scale=scale, dims=dims)


# ---------------------------------------------------------------------------
# containment + line of sight
# ---------------------------------------------------------------------------

def inside_check_np(pts: np.ndarray, vox: Voxels) -> np.ndarray:
    """Boolean mask of points inside the voxelized mesh (mst_utils.py:15-29)."""
    vc = (pts - vox.translate) / vox.scale * vox.dims
    vc = np.round(vc).astype(int)
    in_bounds = np.logical_and(np.all(vc >= 0, 1), np.all(vc < vox.dims, 1))
    vc = np.clip(vc, 0, vox.dims - 1)
    occupied = vox.data[vc[:, 0], vc[:, 1], vc[:, 2]]
    return np.logical_and(in_bounds, occupied)


def vox_to_device(vox: Voxels):
    """Pack a Voxels into jax arrays for use inside jit."""
    return (
        jnp.asarray(vox.data),
        jnp.asarray(vox.translate, jnp.float32),
        jnp.asarray(vox.scale, jnp.float32),
    )


def inside_check_jax(pts: jax.Array, grid: jax.Array, translate: jax.Array,
                     scale: jax.Array) -> jax.Array:
    """Device containment test; pts (..., 3) -> bool (...).

    The lookup gathers the whole contiguous z-ROW grid[x, y, :] per point and
    selects the z entry with a one-hot masked max on the VPU.  TPU gathers
    pay their latency per gathered ROW, so trading 88 streamed bytes per
    lookup for element-granularity indexing is ~2.1x faster than the flat
    linear-index element gather (tools/profile_gather.py: 46 ms vs 99 ms per
    8M lookups), and this path runs ~12M lookups per rig-prediction
    iteration (the volumetric-geodesic LOS sampling)."""
    dims = grid.shape[0]
    vc = (pts - translate) / scale * dims
    vc = jnp.round(vc).astype(jnp.int32)
    in_bounds = jnp.all((vc >= 0) & (vc < dims), axis=-1)
    vc = jnp.clip(vc, 0, dims - 1)
    rows = grid.astype(jnp.uint8).reshape(dims * dims, dims)[
        vc[..., 0] * dims + vc[..., 1]]                       # (..., D)
    z1h = vc[..., 2:3] == jnp.arange(dims, dtype=jnp.int32)
    occ = jnp.max(jnp.where(z1h, rows, 0), axis=-1)
    return in_bounds & (occ > 0)


@partial(jax.jit, static_argnames=("num_samples",))
def segment_inside_fraction(
    starts: jax.Array, ends: jax.Array,
    grid: jax.Array, translate: jax.Array, scale: jax.Array,
    num_samples: int = 32,
) -> jax.Array:
    """Fraction of uniformly-spaced samples on each segment that lie inside
    the volume.  Replaces both `sample_on_bone`+`inside_check` pair counting
    (joint2rig.py:238-240) and — with fraction≈1 as the criterion — the
    trimesh ray-cast visibility of joint2rig.py:71-94, fully vectorized.

    starts/ends: (..., 3); returns (...) float in [0, 1].
    """
    t = jnp.linspace(0.0, 1.0, num_samples)
    samples = starts[..., None, :] + t[:, None] * (ends - starts)[..., None, :]
    inside = inside_check_jax(samples, grid, translate, scale)
    return jnp.mean(inside.astype(jnp.float32), axis=-1)
