"""Profile the device volumetric-geodesic sub-pieces at bench shapes.

Times (vmapped over B meshes, jitted, steady-state):
  A. vertex_bone_visibility alone   (LOS sampling gathers)
  B. + percentile/far pruning       (the per-bone sort)
  C. full vertex_bone_geodesic_device (adds the min-plus fallback)

  python tools/profile_geodesic.py [--batch 32] [--verts 1536] [--bones 8]
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


def _fence(out):
    # block_until_ready is NOT a reliable fence on the tunneled backend;
    # force execution by fetching a scalar (verify skill / round-2 recipe)
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, *args, iters=5):
    _fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _fence(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--verts", type=int, default=1536)
    ap.add_argument("--bones", type=int, default=8)
    ap.add_argument("--anchors", type=int, default=512)
    ap.add_argument("--los-samples", type=int, default=16)
    args = ap.parse_args()

    from morig_tpu.data.synthetic import make_capsule_rig
    from morig_tpu.geometry import skeleton as sk
    from morig_tpu.geometry.bones import vertex_bone_visibility
    from morig_tpu.geometry.geodesic import (
        surface_geodesic, vertex_bone_geodesic_device,
    )
    from morig_tpu.geometry.voxel import vox_to_device, voxelize_mesh

    cap = make_capsule_rig(37, 36)
    V = args.verts
    Bn, Bm = args.batch, args.bones
    verts = np.zeros((V, 3), np.float32)
    verts[: len(cap.verts)] = cap.verts
    rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                 parents=cap.parents, skins=cap.skins)
    bones, _, isleaf = sk.get_bones(rig)
    bones_p = np.zeros((Bm, 6), np.float32)
    nb = min(len(bones), Bm)
    bones_p[:nb] = bones[:nb]
    bmask = np.zeros(Bm, bool)
    bmask[:nb] = True
    vox = voxelize_mesh(cap.verts, cap.faces, dims=88)
    grid, tr, sc = vox_to_device(vox)
    sgm = surface_geodesic(cap.verts, cap.faces)
    sg = np.full((V, V), 1e30, np.float32)
    sg[: sgm.shape[0], : sgm.shape[1]] = np.minimum(sgm, 1e30)

    vB = jnp.asarray(np.stack([verts] * Bn))
    bB = jnp.asarray(np.stack([bones_p] * Bn))
    mB = jnp.asarray(np.stack([bmask] * Bn))
    sB = jnp.asarray(np.stack([sg] * Bn), jnp.bfloat16)
    gB = jnp.stack([grid] * Bn)
    tB = jnp.stack([tr] * Bn)
    cB = jnp.stack([sc] * Bn)

    S = args.los_samples
    A = args.anchors

    @jax.jit
    def vis_only(v, b, g, t, c):
        return jax.vmap(lambda vv, bb, gg, tt, cc: vertex_bone_visibility(
            vv, bb, gg, tt, cc, num_samples=S))(v, b, g, t, c)

    @jax.jit
    def geo_full(v, b, m, s, g, t, c):
        return jax.vmap(lambda vv, bb, mm, ss, gg, tt, cc:
                        vertex_bone_geodesic_device(
                            vv, bb, mm, ss, gg, tt, cc,
                            num_anchors=A, los_samples=S))(v, b, m, s, g, t, c)

    @jax.jit
    def geo_exact(v, b, m, s, g, t, c):
        return jax.vmap(lambda vv, bb, mm, ss, gg, tt, cc:
                        vertex_bone_geodesic_device(
                            vv, bb, mm, ss, gg, tt, cc,
                            num_anchors=None, los_samples=32))(v, b, m, s, g, t, c)

    t_vis = timeit(vis_only, vB, bB, gB, tB, cB)
    t_geo = timeit(geo_full, vB, bB, mB, sB, gB, tB, cB)
    t_gex = timeit(geo_exact, vB, bB, mB, sB, gB, tB, cB)
    print(f"B={Bn} V={V} Bm={Bm} A={A} S={S}")
    print(f"  visibility only      : {t_vis*1e3:8.1f} ms")
    print(f"  geodesic (anchored)  : {t_geo*1e3:8.1f} ms")
    print(f"  geodesic (exact)     : {t_gex*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
