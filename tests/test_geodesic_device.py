"""Device volumetric vertex→bone geodesic vs the host reference path
(geometry/geodesic.py vertex_bone_geodesic, joint2rig.py:307-360 semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from morig_tpu.data.synthetic import make_capsule_rig
from morig_tpu.geometry import skeleton as sk
from morig_tpu.geometry.geodesic import (
    surface_geodesic, vertex_bone_geodesic, vertex_bone_geodesic_device,
)
from morig_tpu.geometry.voxel import vox_to_device, voxelize_mesh


@pytest.fixture(scope="module")
def fixture():
    cap = make_capsule_rig(n_lat=13, n_lon=12)
    rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                 parents=cap.parents, skins=cap.skins)
    bones, _, isleaf = sk.get_bones(rig)
    vox = voxelize_mesh(cap.verts, cap.faces, dims=48)
    surf = surface_geodesic(cap.verts, cap.faces)
    return cap, bones, vox, surf


def test_device_geodesic_matches_host(fixture):
    cap, bones, vox, surf = fixture
    V = len(cap.verts)
    host = vertex_bone_geodesic(cap.verts, bones, vox, surface_geo=surf)

    Bmax = 8
    bones_p = np.zeros((Bmax, 6), np.float32)
    bones_p[: len(bones)] = bones
    bmask = np.zeros(Bmax, bool)
    bmask[: len(bones)] = True
    grid, tr, sc = vox_to_device(vox)
    dev = np.asarray(vertex_bone_geodesic_device(
        jnp.asarray(cap.verts), jnp.asarray(bones_p), jnp.asarray(bmask),
        jnp.asarray(np.minimum(surf, 1e30), jnp.bfloat16), grid, tr, sc,
    )).astype(np.float64)

    # padded bones are +inf, real ones finite
    assert (dev[:, len(bones):] > 1e29).all()
    real = dev[:, : len(bones)]
    assert np.isfinite(real).all()

    # geodesic >= straight-line distance (up to bf16 rounding)
    from morig_tpu.geometry.bones import point_to_segment_dist

    d, _ = point_to_segment_dist(jnp.asarray(cap.verts),
                                 jnp.asarray(bones, jnp.float32))
    d = np.asarray(d)
    assert (real >= d - 0.02).all()

    # agreement with the host path: the capsule is convex-ish so most pairs
    # are visible (exactly equal) and the occluded fallbacks differ only by
    # the min-plus vs nearest-visible-vertex formulation + bf16
    rel = np.abs(real - host) / np.maximum(host, 1e-3)
    assert np.median(rel) < 0.02, float(np.median(rel))
    assert (rel < 0.05).mean() > 0.85, float((rel < 0.05).mean())


def test_device_geodesic_no_visible_falls_back_to_dist(fixture):
    """A bone far outside the volume (no voxel-LOS pair) must fall back to
    the straight distance, matching the host path."""
    cap, bones, vox, surf = fixture
    far_bone = np.array([[5.0, 5.0, 5.0, 6.0, 5.0, 5.0]], np.float32)
    Bmax = 4
    bones_p = np.zeros((Bmax, 6), np.float32)
    bones_p[0] = far_bone
    bmask = np.zeros(Bmax, bool)
    bmask[0] = True
    grid, tr, sc = vox_to_device(vox)
    dev = np.asarray(vertex_bone_geodesic_device(
        jnp.asarray(cap.verts), jnp.asarray(bones_p), jnp.asarray(bmask),
        jnp.asarray(np.minimum(surf, 1e30), jnp.bfloat16), grid, tr, sc,
    ))
    from morig_tpu.geometry.bones import point_to_segment_dist

    d, _ = point_to_segment_dist(jnp.asarray(cap.verts), jnp.asarray(far_bone))
    np.testing.assert_allclose(dev[:, 0], np.asarray(d)[:, 0], rtol=1e-5)


def test_device_geodesic_anchor_mode_close_to_full(fixture):
    """The throughput configuration (strided anchors + fewer LOS samples)
    must stay close to the exact device path: anchor fallbacks only bias
    occluded distances UP, and visible pairs are unaffected."""
    cap, bones, vox, surf = fixture
    Bmax = 8
    bones_p = np.zeros((Bmax, 6), np.float32)
    bones_p[: len(bones)] = bones
    bmask = np.zeros(Bmax, bool)
    bmask[: len(bones)] = True
    grid, tr, sc = vox_to_device(vox)
    sg = jnp.asarray(np.minimum(surf, 1e30), jnp.bfloat16)
    args = (jnp.asarray(cap.verts), jnp.asarray(bones_p), jnp.asarray(bmask),
            sg, grid, tr, sc)
    full = np.asarray(vertex_bone_geodesic_device(*args)).astype(np.float64)
    # ~40% anchor ratio (the default 512/1536 regime, scaled to this fixture)
    fast = np.asarray(vertex_bone_geodesic_device(
        *args, num_anchors=192, los_samples=16)).astype(np.float64)
    real_f = full[:, : len(bones)]
    real_a = fast[:, : len(bones)]
    rel = np.abs(real_a - real_f) / np.maximum(real_f, 1e-3)
    assert np.median(rel) < 0.03, float(np.median(rel))
    assert (rel < 0.15).mean() > 0.98, float((rel < 0.15).mean())
    # anchors only bias occluded distances UP
    assert (real_a >= real_f - 0.02).all()


def test_device_geodesic_candidate_mode_preserves_topk(fixture):
    """The candidate-restricted throughput path (per-vertex LOS rays only to
    the K' euclidean-nearest bones) must preserve the K-nearest-bone
    selection + distances the skin descriptors consume."""
    cap, bones, vox, surf = fixture
    Bmax = 8
    bones_p = np.zeros((Bmax, 6), np.float32)
    bones_p[: len(bones)] = bones
    bmask = np.zeros(Bmax, bool)
    bmask[: len(bones)] = True
    grid, tr, sc = vox_to_device(vox)
    sg = jnp.asarray(np.minimum(surf, 1e30), jnp.bfloat16)
    args = (jnp.asarray(cap.verts), jnp.asarray(bones_p), jnp.asarray(bmask),
            sg, grid, tr, sc)
    A = 192
    full = np.asarray(vertex_bone_geodesic_device(
        *args, num_anchors=A, los_samples=16)).astype(np.float64)
    cand = np.asarray(vertex_bone_geodesic_device(
        *args, num_anchors=A, los_samples=16,
        num_candidates=4)).astype(np.float64)

    # non-candidate entries are +inf; candidates carry finite distances
    assert (np.isfinite(cand) | (cand > 1e29)).all()
    K = 2  # the descriptor keeps the K geodesically-nearest bones
    nn_full = np.argsort(full, axis=1)[:, :K]
    nn_cand = np.argsort(cand, axis=1)[:, :K]
    # selected sets agree for nearly every vertex (the percentile statistic
    # moves from all vertices to the anchor rows, so a handful of borderline
    # far-visible pairs may flip)
    same = (np.sort(nn_full, 1) == np.sort(nn_cand, 1)).all(1)
    assert same.mean() > 0.97, float(same.mean())
    # and the distances of the agreed selections match closely
    d_full = np.take_along_axis(full, nn_full, 1)[same]
    d_cand = np.take_along_axis(cand, nn_full, 1)[same]
    rel = np.abs(d_cand - d_full) / np.maximum(d_full, 1e-3)
    assert np.median(rel) < 0.02, float(np.median(rel))
