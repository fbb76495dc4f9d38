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
