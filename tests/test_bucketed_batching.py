"""Per-bucket batching: mixed-size datasets must pad each model to its own
bucket (not the dataset max), emit bucket-homogeneous batches, and reduce
padding waste (SURVEY.md §7.1; round-1 weakness: one global pad bucket)."""
import numpy as np
import pytest

from morig_tpu.data.pose import PoseDataset, PoseModel, capsule_pose_dataset
from morig_tpu.data.synthetic import make_capsule_sequence


def _models_two_sizes():
    models = []
    for i, (n_lat, n_lon) in enumerate([(7, 6), (7, 6), (13, 12), (13, 12)]):
        seq = make_capsule_sequence(num_frames=4, num_points=32, seed=i,
                                    n_lat=n_lat, n_lon=n_lon)
        models.append(PoseModel(
            name=f"m{i}", vtx_traj=seq["vtx_traj"], pts_traj=seq["pts_traj"],
            corr_v2p=seq["corr_v2p"], corr_p2v=seq["corr_p2v"],
            vismask=seq["vismask"], tpl_edges=seq["tpl_edges"],
            geo_edges=seq["geo_edges"],
        ))
    return models


def test_buckets_assigned_per_model():
    models = _models_two_sizes()
    ds = PoseDataset(models, buckets=(64, 256))
    small_v = models[0].num_verts
    big_v = models[2].num_verts
    assert small_v <= 64 < big_v <= 256
    assert ds.bucket_of == [64, 64, 256, 256]
    assert ds.pad_verts == 256
    # mesh cache padded to the model's own bucket
    assert ds._mesh_cache[0]["verts"].shape[0] == 64
    assert ds._mesh_cache[2]["verts"].shape[0] == 256


def test_epoch_batches_homogeneous_and_cover_all():
    models = _models_two_sizes()
    ds = PoseDataset(models, buckets=(64, 256))
    rng = np.random.default_rng(0)
    seen = set()
    shapes = set()
    for b in ds.epoch_batches(rng, batch_size=2, kind="modelsresource",
                              sequential=False, train=True):
        V = b.mesh.verts.shape[1]
        shapes.add(V)
        # every sample slot in a batch has the same static V by construction;
        # the per-batch vert_mask must match the true sizes of its models
        nv = np.asarray(b.mesh.vert_mask).sum(1)
        assert all(n in (models[0].num_verts, models[2].num_verts) for n in nv)
        seen.update(int(n) for n in nv)
    assert shapes == {64, 256}, "both buckets must be emitted at native size"

    # padding waste drops: per-model padded area vs single global pad
    waste_bucketed = sum(ds.bucket_of[i] - m.num_verts for i, m in enumerate(models))
    waste_global = sum(ds.pad_verts - m.num_verts for m in models)
    assert waste_bucketed < waste_global / 2


def test_mixed_bucket_batch_rejected():
    models = _models_two_sizes()
    ds = PoseDataset(models, buckets=(64, 256))
    with pytest.raises(AssertionError):
        ds.batch([0, 2], 0, 1)


def test_ragged_tail_and_eval_determinism():
    models = _models_two_sizes()[:3]          # buckets: [64, 64, 256]
    ds = PoseDataset(models, buckets=(64, 256))
    rng = np.random.default_rng(0)
    train_batches = list(ds.epoch_batches(rng, 2, "modelsresource", False, True))
    assert all(b.mesh.verts.shape[0] == 2 for b in train_batches)
    ev = list(ds.epoch_batches(rng, 2, "modelsresource", False, False))
    # eval keeps deterministic order: bucket 64 first (models 0,1), then 256
    assert ev[0].mesh.verts.shape[1] == 64
    assert ev[-1].mesh.verts.shape[1] == 256


def test_single_bucket_backcompat():
    ds = capsule_pose_dataset(num_models=2, num_frames=4, num_points=32,
                              n_lat=7, n_lon=6)
    b = ds.batch([0, 1], 0, 1)
    assert b.mesh.verts.shape[1] == ds.pad_verts
