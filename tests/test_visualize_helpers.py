"""Visualization helper coverage: label colormaps and the tracking
quaternion smoothing of visualize_tracking.py:43-61."""
import numpy as np

from morig_tpu.eval.visualize import (
    label_colormap, skin_colors, smooth_tracking_quats,
)
from morig_tpu.geometry.skeleton import Rig


def test_label_colormap_distinct():
    cm = label_colormap(48)
    assert cm.shape == (48, 3)
    assert (cm >= 0).all() and (cm <= 1).all()
    # pairwise distinct (no two labels share a color)
    d = np.linalg.norm(cm[:, None] - cm[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 1e-3


def test_skin_colors_shape():
    rng = np.random.default_rng(0)
    skins = rng.random((50, 7))
    c = skin_colors(skins)
    assert c.shape == (50, 3)


def _toy_rig():
    pos = np.array([[0, 0, 0], [0, 0.4, 0], [0.3, 0.6, 0]], float)
    parents = np.array([-1, 0, 1])
    rng = np.random.default_rng(1)
    skins = np.abs(rng.normal(size=(25, 3)))
    skins /= skins.sum(1, keepdims=True)
    return Rig(names=["a", "b", "c"], pos=pos, parents=parents, skins=skins)


def test_smooth_quats_identity_is_rest():
    rig = _toy_rig()
    rng = np.random.default_rng(2)
    rest = rng.normal(size=(25, 3)).astype(np.float32)
    T = 6
    quats = np.zeros((3, T, 4))
    quats[..., 3] = 1.0           # identity in the repo's (x, y, z, w) order
    traj, sm = smooth_tracking_quats(rig, rest, quats)
    assert traj.shape == (25, T, 3)
    for t in range(T):
        np.testing.assert_allclose(traj[:, t, :], rest, atol=1e-5)
    # smoothing preserves unit norm
    np.testing.assert_allclose(np.linalg.norm(sm, axis=-1), 1.0, atol=1e-6)


def test_smooth_quats_damps_jitter():
    """A temporally jittered rotation sequence must get closer to its clean
    version after smoothing."""
    from morig_tpu.geometry.rotations import matrix_to_quaternion
    import jax.numpy as jnp

    rig = _toy_rig()
    rng = np.random.default_rng(3)
    rest = rng.normal(size=(25, 3)).astype(np.float32)
    T = 12

    def rotz_quat(a):
        return np.array([0.0, 0.0, np.sin(a / 2), np.cos(a / 2)])  # (x,y,z,w)

    clean = np.zeros((3, T, 4))
    noisy = np.zeros((3, T, 4))
    for t in range(T):
        base = 0.4 * np.sin(np.pi * t / (T - 1))
        for j in range(3):
            clean[j, t] = rotz_quat(base)
            noisy[j, t] = rotz_quat(base + 0.12 * rng.normal())
    noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True)

    traj_noisy, _ = smooth_tracking_quats(rig, rest, noisy.copy(), num_pass=0)
    traj_smooth, _ = smooth_tracking_quats(rig, rest, noisy.copy(), num_pass=2)
    traj_clean, _ = smooth_tracking_quats(rig, rest, clean.copy(), num_pass=0)
    err_noisy = np.abs(traj_noisy - traj_clean).mean()
    err_smooth = np.abs(traj_smooth - traj_clean).mean()
    assert err_smooth < err_noisy


def test_smooth_quats_hemisphere_alignment():
    """q and -q encode the same rotation; a sequence that flips hemisphere
    mid-stream must NOT cancel to ~0 in the temporal blend (the 1-2-1 average
    of q with -q normalizes to garbage without sign alignment)."""
    rig = _toy_rig()
    rng = np.random.default_rng(4)
    rest = rng.normal(size=(25, 3)).astype(np.float32)
    T = 7
    quats = np.zeros((3, T, 4))
    quats[..., 3] = 1.0
    quats[:, 2:4] *= -1.0         # identity again, opposite hemisphere
    traj, sm = smooth_tracking_quats(rig, rest, quats)
    np.testing.assert_allclose(np.linalg.norm(sm, axis=-1), 1.0, atol=1e-6)
    for t in range(T):
        np.testing.assert_allclose(traj[:, t, :], rest, atol=1e-5)
