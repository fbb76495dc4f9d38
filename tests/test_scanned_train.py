"""Epoch-scanned trainer == loop trainer (train/scanned.py vs run_epochs).

The scanned runner must reproduce run_epochs exactly: same schedule rng
stream, same per-batch jax rng splits, same Meter averaging, same strict-<
best-on-val rule.  Small float drift is allowed (the fused scan program is a
different XLA program than per-batch dispatches)."""
import json
import os

import jax
import numpy as np
import pytest

from morig_tpu.data.pose import capsule_pose_dataset
from morig_tpu.data.rig import capsule_rig_dataset
from morig_tpu.data.skeleton_data import capsule_skel_dataset
from morig_tpu.train import trainer
from morig_tpu.train.scanned import (
    const_scan_batcher, pose_scan_batcher, rig_scan_batcher,
    run_epochs_scanned, with_val_dataset,
)
from morig_tpu.train.stages import BoneStage, CorrPoseStage, RigStage

KW = dict(num_points=64, n_lat=7, n_lon=6)

# the equivalence tests train twice (loop + scan) with full-model compiles
slow = pytest.mark.slow


def _read_log(d):
    out = {}
    with open(os.path.join(d, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            out[(r["epoch"], r["split"])] = {
                k: v for k, v in r.items()
                if k not in ("epoch", "split", "time", "epoch_wall_s")
            }
    return out


def _run_both(stage_fn, loop_batches, batcher, epochs, chunk, tmp_path,
              init_sample):
    logs = {}
    finals = {}
    bests = {}
    for mode in ("loop", "scan"):
        stage = stage_fn()
        state = stage.init_state(jax.random.key(0), init_sample)
        d = str(tmp_path / mode)
        logger = trainer.MetricLogger(d)
        rng_np = np.random.default_rng(7)
        if mode == "loop":
            state, best = trainer.run_epochs(
                stage, state,
                train_batches=lambda e: loop_batches(rng_np, True),
                val_batches=lambda: loop_batches(rng_np, False),
                test_batches=None, epochs=epochs, checkpoint_dir=d,
                logger=logger, rng=jax.random.key(3),
            )
        else:
            state, best = run_epochs_scanned(
                stage, state, batcher, epochs=epochs, checkpoint_dir=d,
                logger=logger, rng=jax.random.key(3), rng_np=rng_np,
                chunk_epochs=chunk,
            )
        logger.close()
        logs[mode] = _read_log(d)
        finals[mode] = state
        bests[mode] = best
    return logs, finals, bests


def _assert_equiv(logs, finals, bests, epochs):
    for e in range(1, epochs + 1):
        for split in ("train", "val"):
            a, b = logs["loop"][(e, split)], logs["scan"][(e, split)]
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_allclose(a[k], b[k], rtol=2e-3, atol=2e-4,
                                           err_msg=f"epoch {e} {split} {k}")
    assert bests["loop"] == bests["scan"]
    pa = jax.tree.leaves(finals["loop"].params)
    pb = jax.tree.leaves(finals["scan"].params)
    for x, y in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-4)


@slow
def test_scanned_matches_loop_corr(tmp_path):
    tr = capsule_pose_dataset(num_models=3, num_frames=4, **KW)
    va = capsule_pose_dataset(num_models=2, num_frames=4, seed=9, **KW)
    epochs, chunk, bs = 4, 3, 2

    def loop_batches(rng, train):
        ds = tr if train else va
        return ds.epoch_batches(rng, bs, "modelsresource", False, train)

    b = with_val_dataset(
        pose_scan_batcher(tr, bs, "modelsresource", False),
        pose_scan_batcher(va, bs, "modelsresource", False),
    )

    def stage_fn():
        s = CorrPoseStage()
        s.train_vismask = True
        s.vis_branch_start_epoch = 0
        return s

    init = tr.batch([0, 1], 0, 1)
    logs, finals, bests = _run_both(stage_fn, loop_batches, b, epochs, chunk,
                                    tmp_path, init)
    _assert_equiv(logs, finals, bests, epochs)


@slow
def test_scanned_matches_loop_rig(tmp_path):
    tr = capsule_rig_dataset(num_models=3, **KW)
    epochs, chunk, bs = 3, 2, 2

    def loop_batches(rng, train):
        return tr.epoch_batches(rng, bs, train)

    b = rig_scan_batcher(tr, bs)

    def stage_fn():
        return RigStage(arch="jointnet", num_embed_sample=32)

    init = tr.batch([0, 1])
    logs, finals, bests = _run_both(stage_fn, loop_batches, b, epochs, chunk,
                                    tmp_path, init)
    _assert_equiv(logs, finals, bests, epochs)


@slow
def test_scanned_matches_loop_const_bone(tmp_path):
    sample = capsule_skel_dataset(num_models=2, max_joints=8, **KW)
    epochs, chunk = 3, 2

    def loop_batches(rng, train):
        yield sample

    b = const_scan_batcher(sample)
    logs, finals, bests = _run_both(lambda: BoneStage(), loop_batches, b,
                                    epochs, chunk, tmp_path, sample)
    _assert_equiv(logs, finals, bests, epochs)


def test_chunk_splits_at_vis_branch_boundary(tmp_path):
    """A chunk straddling vis_branch_start_epoch must split so the branch
    enables exactly at the reference epoch (train_corr_pose.py:224-226)."""
    from morig_tpu.train.scanned import _chunk_ranges

    assert _chunk_ranges(0, 10, 4, 5) == [(0, 4), (4, 5), (5, 9), (9, 10)]
    assert _chunk_ranges(0, 6, 10, None) == [(0, 6)]
    assert _chunk_ranges(3, 6, 2, None) == [(3, 5), (5, 6)]
    assert _chunk_ranges(0, 6, 2, 0) == [(0, 2), (2, 4), (4, 6)]


@slow
def test_early_stop_patience(tmp_path):
    """With patience, training halts at a chunk boundary once best-on-val is
    older than the patience window; the best checkpoint is still on disk."""
    sample = capsule_skel_dataset(num_models=2, max_joints=8, **KW)
    b = const_scan_batcher(sample)
    stage = BoneStage()
    state = stage.init_state(jax.random.key(0), sample)
    d = str(tmp_path / "es")
    logger = trainer.MetricLogger(d)
    # init_lowest=-inf: no epoch can ever improve, so best stays -1 and the
    # patience check fires after the first chunk
    _, best = run_epochs_scanned(
        stage, state, b, epochs=20, checkpoint_dir=d, logger=logger,
        rng=jax.random.key(1), rng_np=np.random.default_rng(0),
        chunk_epochs=4, init_lowest=float("-inf"), early_stop_patience=3,
    )
    log = _read_log(d)
    ran = {e for e, s in log}
    assert max(ran) == 4, f"expected stop after first 4-epoch chunk, got {ran}"
    assert best == -1
    assert os.path.exists(os.path.join(d, "checkpoint.msgpack"))
