"""predict_rig_batch (the throughput path: fused device programs, packed
transfers, device descriptor packing) must agree with the per-mesh
predict_rig reference path on joints, skeleton topology, and skinning."""
import numpy as np
import pytest

import jax

from morig_tpu.core import batch as B
from morig_tpu.data.synthetic import make_capsule_rig
from morig_tpu.geometry.voxel import voxelize_mesh
from morig_tpu.pipelines.rig_predict import capsule_predictor

pytestmark = pytest.mark.slow


def test_batch_matches_single():
    predictor, pose_ds, rig_ds = capsule_predictor(
        train_steps=8, num_points=64, n_lat=9, n_lon=8)
    cap = make_capsule_rig(9, 8)
    vox = voxelize_mesh(cap.verts, cap.faces, dims=24)

    entries = [rig_ds._mesh_cache[i] for i in range(2)]
    pts_frames = [
        np.stack([m.pts_traj[:, t, :] for t in range(1, 6)])
        for m in pose_ds.models[:2]
    ]

    singles = [
        predictor.predict_rig(entries[i], pts_frames[i], vox=vox)
        for i in range(2)
    ]
    batched = predictor.predict_rig_batch(entries, pts_frames, voxes=[vox, vox])

    assert len(batched) == 2
    for rig_s, rig_b in zip(singles, batched):
        # same joint count and positions (the NMS/flip pipeline is shared;
        # device vs host float paths may reorder ties -> compare as sets)
        assert rig_b.num_joints == rig_s.num_joints, (
            rig_b.num_joints, rig_s.num_joints)
        ds = np.sort(rig_s.pos.round(4), axis=0)
        db = np.sort(rig_b.pos.round(4), axis=0)
        np.testing.assert_allclose(db, ds, atol=5e-3)
        # skinning: same shape, valid rows normalized in both paths
        assert rig_b.skins.shape == rig_s.skins.shape
        for rig in (rig_b, rig_s):
            rows = rig.skins.sum(1)
            ok = rows > 0
            np.testing.assert_allclose(rows[ok], 1.0, atol=1e-4)
        # full weight matrices agree after aligning joint order by position.
        # The capsule's symmetry makes many vertex-bone distances exactly
        # tied; host stable argsort vs device top_k break those ties
        # differently, flipping which of two equidistant bones receives a
        # K-slot weight — tolerate a small fraction of such tie flips.
        d = np.linalg.norm(rig_b.pos[:, None] - rig_s.pos[None], axis=-1)
        perm = np.argmin(d, axis=1)
        assert len(set(perm.tolist())) == rig_b.num_joints, "joint map not 1:1"
        diff = np.abs(rig_b.skins - rig_s.skins[:, perm])
        mismatch = np.mean(diff > 0.05)
        assert mismatch < 0.10, f"{mismatch:.3f} of weights differ beyond ties"


@pytest.mark.fast
def test_batch_fingerprint_content_based():
    """Cache fingerprints must be content-based: identical rebuilt entries
    reuse the cache; different meshes (even at the same object ids) do not."""
    import numpy as np
    from morig_tpu.core import batch as B
    from morig_tpu.pipelines.rig_predict import batch_fingerprint

    rng = np.random.default_rng(0)
    v = rng.normal(size=(40, 3)).astype(np.float32)
    e = np.array([[i, (i + 1) % 40] for i in range(40)])
    a = [B.build_mesh(v, e, e, 64)]
    b = [B.build_mesh(v.copy(), e.copy(), e.copy(), 64)]   # fresh objects
    assert batch_fingerprint(1, 5, a) == batch_fingerprint(1, 5, b)
    c = [B.build_mesh(v + 0.01, e, e, 64)]                 # different mesh
    assert batch_fingerprint(1, 5, a) != batch_fingerprint(1, 5, c)
    assert batch_fingerprint(1, 4, a) != batch_fingerprint(1, 5, a)
