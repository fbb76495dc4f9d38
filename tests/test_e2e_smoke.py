"""Fast-tier end-to-end smoke: the FULL rig-prediction DAG and the scanned
trainer run in the every-commit tier (VERDICT r3 weak #5: nothing end-to-end
in the quick pass).

Tiny shapes keep this under ~60 s on the CPU host: the point is that the
whole pipeline (flow -> joints -> MST -> skin -> assembled Rig) executes and
produces a structurally valid rig, and that the scanned epoch runner matches
the loop runner on a miniature config.  Accuracy floors live in the slow tier
(test_accuracy_floor.py)."""
import numpy as np
import pytest

KW = dict(num_points=48, n_lat=7, n_lon=6)


@pytest.fixture(scope="module")
def tiny_predictor():
    from morig_tpu.pipelines.rig_predict import capsule_predictor

    # train_steps=0: structural assertions don't need trained weights, and
    # skipping the 4 train-step programs halves the tier's compile bill
    return capsule_predictor(train_steps=0, num_embed_sample=32, **KW)


def test_batched_dag_smoke(tiny_predictor):
    """predict_rig_batch (the throughput path the bench times) end-to-end at
    toy sizes: valid tree, normalized skins, bounded joints — the structural
    contract of joint2rig.py:397-510, checked every commit."""
    predictor, pose_ds, rig_ds = tiny_predictor
    entries = [rig_ds._mesh_cache[i] for i in (0, 1)]
    pts_list = [
        np.transpose(m.pts_traj[:, 1:6, :], (1, 0, 2)) for m in pose_ds.models
    ]
    rigs = predictor.predict_rig_batch(entries, pts_list)
    assert len(rigs) == 2
    for rig, entry in zip(rigs, entries):
        J = rig.num_joints
        assert J >= 1
        assert (rig.parents < 0).sum() == 1
        assert all(-1 <= p < J for p in rig.parents)
        assert sum(len(l) for l in rig.levels()) == J
        nv = int(np.asarray(entry["vert_mask"]).sum())
        assert rig.skins.shape == (nv, J)
        np.testing.assert_allclose(rig.skins.sum(1), 1.0, atol=1e-4)
        v = entry["verts"][np.asarray(entry["vert_mask"])]
        lo, hi = v.min(0) - 1.1, v.max(0) + 1.1
        assert ((rig.pos >= lo) & (rig.pos <= hi)).all()


@pytest.mark.slow
def test_single_mesh_dag_matches_batched(tiny_predictor):
    """The per-mesh predict_rig path (its own B=1 program set) agrees with
    the batched path structurally."""
    predictor, pose_ds, rig_ds = tiny_predictor
    m = pose_ds.models[0]
    entry = rig_ds._mesh_cache[0]
    pts_frames = np.stack([m.pts_traj[:, t, :] for t in range(1, 6)])

    rig = predictor.predict_rig(entry, pts_frames)
    assert (rig.parents < 0).sum() == 1
    nv = int(np.asarray(entry["vert_mask"]).sum())
    assert rig.skins.shape[0] == nv
    np.testing.assert_allclose(rig.skins.sum(1), 1.0, atol=1e-4)


def test_scanned_matches_loop_smoke(tmp_path):
    """Miniature scanned-vs-loop equivalence (BoneStage, 2 epochs): the
    scanned runner's rng/metric/best-on-val contract checked every commit."""
    import jax

    from morig_tpu.data.skeleton_data import capsule_skel_dataset
    from morig_tpu.train import trainer
    from morig_tpu.train.scanned import const_scan_batcher, run_epochs_scanned
    from morig_tpu.train.stages import BoneStage

    sample = capsule_skel_dataset(num_models=2, max_joints=8, **KW)
    epochs = 2
    results = {}
    for mode in ("loop", "scan"):
        stage = BoneStage()
        state = stage.init_state(jax.random.key(0), sample)
        d = str(tmp_path / mode)
        logger = trainer.MetricLogger(d)
        if mode == "loop":
            state, best = trainer.run_epochs(
                stage, state, train_batches=lambda e: iter([sample]),
                val_batches=lambda: iter([sample]), test_batches=None,
                epochs=epochs, checkpoint_dir=d, logger=logger,
                rng=jax.random.key(3),
            )
        else:
            state, best = run_epochs_scanned(
                stage, state, const_scan_batcher(sample), epochs=epochs,
                checkpoint_dir=d, logger=logger, rng=jax.random.key(3),
                rng_np=np.random.default_rng(7), chunk_epochs=2,
            )
        logger.close()
        results[mode] = (state, best)
    assert results["loop"][1] == results["scan"][1]
    pa = jax.tree.leaves(results["loop"][0].params)
    pb = jax.tree.leaves(results["scan"][0].params)
    for x, y in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-4)
