"""Command-line workflow: one CLI covering the reference's six training
scripts and evaluation flow (SURVEY.md §2.11-2.12).

  python -m morig_tpu.cli train corr_pose   --data capsule --epochs 3
  python -m morig_tpu.cli train deform_pose --data /path/to/train --init-extractor ckpt/
  python -m morig_tpu.cli train joints|mask|skin|bone|root ...
  python -m morig_tpu.cli predict-rig --data capsule --out results/
  python -m morig_tpu.cli track --data capsule --out results/
  python -m morig_tpu.cli bench --smoke

Hyper-parameter defaults follow the reference scripts (train_corr_pose.py:
252-281, train_rig.py:270-292); `--data capsule` uses the synthetic fixture.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--data", default="capsule",
                   help="'capsule', 'creature' (branching synthetic family), "
                        "or a dataset folder in the reference layout")
    p.add_argument("--kind", default="modelsresource",
                   choices=["modelsresource", "deformingthings"])
    p.add_argument("--sequential", action="store_true")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--checkpoint", default="checkpoints/run")
    p.add_argument("--logdir", default="logs/run")
    p.add_argument("--resume", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-models", type=int, default=2, help="capsule fixture size")
    p.add_argument("--fixture-points", type=int, default=None,
                   help="capsule fixture point-cloud size (default 1024)")
    p.add_argument("--fixture-lat", type=int, default=None,
                   help="capsule fixture latitude rings (default 17)")
    p.add_argument("--fixture-lon", type=int, default=None,
                   help="capsule fixture longitude segments (default 16)")
    p.add_argument("--platform", default=None, help="force jax platform (cpu/tpu)")
    p.add_argument("--scan-epochs", type=int, default=0,
                   help="fuse N epochs per device dispatch (train/scanned.py; "
                        "recommended ~25 over high-latency device links; "
                        "0 = per-batch loop)")
    p.add_argument("--edge-impl", default=None,
                   choices=["auto", "xla", "fused", "windowed"],
                   help="edge-message implementation (nn/gcu.py "
                        "set_edge_impl); 'fused'/'windowed' also enable the "
                        "Pallas fused forward for TRAINING")
    p.add_argument("--edge-bwd", default=None, choices=["pallas", "remat_xla"],
                   help="backward for fused-forward training "
                        "(set_edge_bwd; default pallas)")
    p.add_argument("--knn-impl", default=None,
                   choices=["auto", "xla", "fused"],
                   help="cosine-kNN implementation for DeformNet voting / "
                        "CorrNet vismask (kernels/knn_fused.py set_knn_impl; "
                        "default auto = fused Pallas on accelerators)")


def _setup(args):
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "edge_impl", None):
        from morig_tpu.nn.gcu import set_edge_impl

        set_edge_impl(args.edge_impl)
    if getattr(args, "edge_bwd", None):
        from morig_tpu.nn.gcu import set_edge_bwd

        set_edge_bwd(args.edge_bwd)
    if getattr(args, "knn_impl", None):
        from morig_tpu.kernels.knn_fused import set_knn_impl

        set_knn_impl(args.knn_impl)


def _fixture_kw(args):
    kw = {}
    if getattr(args, "fixture_points", None):
        kw["num_points"] = args.fixture_points
    if getattr(args, "fixture_lat", None):
        kw["n_lat"] = args.fixture_lat
    if getattr(args, "fixture_lon", None):
        kw["n_lon"] = args.fixture_lon
    return kw


def _pose_dataset(args, shape: bool = False):
    from morig_tpu.data.pose import PoseDataset, capsule_pose_dataset

    if args.data == "capsule":
        nf = 2 if shape else 6
        return capsule_pose_dataset(num_models=args.num_models, num_frames=nf,
                                    **_fixture_kw(args))
    if args.data == "creature":
        from morig_tpu.data.creature import creature_pose_dataset

        nf = 2 if shape else 6
        return creature_pose_dataset(num_models=args.num_models, seed=args.seed,
                                     num_frames=nf)
    if shape:
        from morig_tpu.data.loaders import load_shape_models

        return PoseDataset(load_shape_models(args.data))
    from morig_tpu.data.loaders import load_pose_models

    return PoseDataset(load_pose_models(args.data, args.kind, args.sequential))


def _rig_dataset(args):
    from morig_tpu.data.rig import RigDataset, capsule_rig_dataset

    if args.data == "capsule":
        return capsule_rig_dataset(num_models=args.num_models, **_fixture_kw(args))
    if args.data == "creature":
        from morig_tpu.data.creature import creature_rig_dataset

        return creature_rig_dataset(num_models=args.num_models, seed=args.seed)
    from morig_tpu.data.loaders import load_rig_models

    return RigDataset(load_rig_models(args.data))


def _scan_batcher_for(dataset, sample, args):
    """Build a ScanBatcher for --scan-epochs from the dataset type; None when
    the dataset can't be scanned (multi-bucket pose sets)."""
    from morig_tpu.data.pose import PoseDataset
    from morig_tpu.data.rig import RigDataset
    from morig_tpu.train.scanned import (
        const_scan_batcher, pose_scan_batcher, rig_scan_batcher,
    )

    if isinstance(dataset, PoseDataset):
        if len(set(dataset.bucket_of)) != 1:
            print("[train] --scan-epochs needs a single vertex bucket; "
                  "falling back to the per-batch loop")
            return None
        return pose_scan_batcher(dataset, args.batch_size, args.kind,
                                 args.sequential)
    if isinstance(dataset, RigDataset):
        return rig_scan_batcher(dataset, args.batch_size)
    return const_scan_batcher(sample)


def _train_loop(stage, dataset, args, batch_fn, default_epochs, state=None):
    import jax

    from morig_tpu.train import checkpoint as ckpt
    from morig_tpu.train.trainer import MetricLogger, run_epochs

    rng_np = np.random.default_rng(args.seed)
    sample = next(batch_fn(rng_np))
    if state is None:
        state = stage.init_state(jax.random.key(args.seed), sample)
    start_epoch = 0
    if args.resume:
        state, meta = ckpt.load_checkpoint(state, args.resume)
        start_epoch = int(meta.get("epoch", 0))
    epochs = args.epochs or default_epochs
    logger = MetricLogger(args.logdir)
    scan = getattr(args, "scan_epochs", 0)
    batcher = _scan_batcher_for(dataset, sample, args) if scan else None
    if batcher is not None:
        from morig_tpu.train.scanned import run_epochs_scanned

        state, best = run_epochs_scanned(
            stage, state, batcher,
            epochs=epochs, checkpoint_dir=args.checkpoint, logger=logger,
            start_epoch=start_epoch, rng=jax.random.key(args.seed + 1),
            rng_np=rng_np, chunk_epochs=scan,
        )
    else:
        state, best = run_epochs(
            stage, state,
            train_batches=lambda e: batch_fn(rng_np),
            val_batches=lambda: batch_fn(rng_np, train=False),
            test_batches=None,
            epochs=epochs, checkpoint_dir=args.checkpoint, logger=logger,
            start_epoch=start_epoch, rng=jax.random.key(args.seed + 1),
        )
    print(f"best epoch: {best}; checkpoints in {args.checkpoint}")
    return state


def cmd_train(args):
    _setup(args)
    import jax

    stage_name = args.stage
    if stage_name in ("corr_pose", "corr_shape"):
        from morig_tpu.train.stages import CorrPoseStage

        ds = _pose_dataset(args, shape=stage_name == "corr_shape")
        stage = CorrPoseStage()
        if args.train_vismask:
            stage.train_vismask = True

        def batches(rng, train=True):
            return ds.epoch_batches(rng, args.batch_size, args.kind,
                                    args.sequential, train)

        _train_loop(stage, ds, args, batches, 300)
    elif stage_name in ("deform_pose", "deform_shape"):
        from morig_tpu.train import checkpoint as ckpt
        from morig_tpu.train.stages import DeformPoseStage

        ds = _pose_dataset(args, shape=stage_name == "deform_shape")
        stage = DeformPoseStage(train_extractor=args.train_extractor)

        def batches(rng, train=True):
            return ds.epoch_batches(rng, args.batch_size, args.kind,
                                    args.sequential, train)

        state = None
        if args.init_extractor:
            import jax as _jax

            sample = next(batches(np.random.default_rng(args.seed)))
            state = stage.init_state(_jax.random.key(args.seed), sample)
            from morig_tpu.train.stages import CorrPoseStage

            corr = CorrPoseStage()
            corr_state = corr.init_state(_jax.random.key(0), sample)
            corr_state, _ = ckpt.load_checkpoint(corr_state, args.init_extractor)
            state = stage.init_extractor_from(state, corr_state.params,
                                              corr_state.batch_stats)
        _train_loop(stage, ds, args, batches, 150, state=state)
    elif stage_name in ("joints", "mask"):
        from morig_tpu.train.stages import RigStage

        ds = _rig_dataset(args)
        arch = "jointnet" if stage_name == "joints" else "masknet"
        stage = RigStage(arch=arch, num_embed_sample=min(512, ds.pad_verts))

        def batches(rng, train=True):
            return ds.epoch_batches(rng, args.batch_size, train)

        _train_loop(stage, ds, args, batches, 120)
    elif stage_name == "skin":
        from morig_tpu.train.stages import SkinStage

        ds = _rig_dataset(args)
        stage = SkinStage(num_embed_sample=min(512, ds.pad_verts))

        def batches(rng, train=True):
            return ds.epoch_batches(rng, args.batch_size, train)

        _train_loop(stage, ds, args, batches, 120)
    elif stage_name in ("bone", "root"):
        from morig_tpu.data.skeleton_data import capsule_skel_dataset
        from morig_tpu.train.stages import BoneStage, RootStage

        if args.data == "creature":
            # diverse joint sets: GT + perturbed copies per creature
            from morig_tpu.data.creature import creature_skel_dataset

            sample = creature_skel_dataset(num_models=args.num_models,
                                           seed=args.seed)
        elif args.data != "capsule":
            from morig_tpu.data.rig import RigDataset
            from morig_tpu.data.loaders import load_rig_models
            from morig_tpu.data.skeleton_data import build_skel_sample

            rig_ds = RigDataset(load_rig_models(args.data))
            sample = build_skel_sample(
                rig_ds._mesh_cache, [m.rig.pos for m in rig_ds.models],
                [m.rig for m in rig_ds.models],
            )
        else:
            sample = capsule_skel_dataset(num_models=args.num_models, max_joints=16)
        stage = BoneStage() if stage_name == "bone" else RootStage()

        def batches(rng, train=True):
            yield sample

        _train_loop(stage, None, args, batches, 80)
    else:
        raise SystemExit(f"unknown stage {stage_name}")


def cmd_eval(args):
    """Offline metrics: correspondence accuracy-vs-tolerance, mean flow L2,
    attention precision-recall (eval_corr/deform/attn equivalents), and the
    results-folder batch workflows `eval rig` / `eval tracking`
    (eval_rigging.py:48-131, eval_tracking.py:213-235)."""
    _setup(args)
    if args.what in ("rig", "tracking"):
        from morig_tpu.eval.folder_eval import (
            eval_rig_folder, eval_tracking_folder,
        )

        if not args.res or not args.gt:
            raise SystemExit("eval rig/tracking needs --res and --gt folders")
        if args.what == "rig":
            eval_rig_folder(args.res, args.gt)
        else:
            eval_tracking_folder(args.res, args.gt)
        return
    import jax

    from morig_tpu.data.pose import eval_frame_pair
    from morig_tpu.eval import metrics as M
    from morig_tpu.train import checkpoint as ckpt

    ds = _pose_dataset(args)
    src_f, tar_f = eval_frame_pair(args.sequential)
    nf = min(m.num_frames for m in ds.models)
    src_f, tar_f = min(src_f, nf - 2), min(tar_f, nf - 1)

    if args.what == "corr":
        from morig_tpu.train.stages import CorrPoseStage

        stage = CorrPoseStage()
        batch = ds.batch(list(range(min(len(ds), args.batch_size))), src_f, tar_f)
        state = stage.init_state(jax.random.key(0), batch)
        if args.resume:
            state, _ = ckpt.load_checkpoint(state, args.resume)
        vtx_f, pts_f, vis, tau = stage.infer(state, batch)
        i = 0
        vm = np.asarray(batch.mesh.vert_mask[i])
        corr = np.asarray(batch.corr.v2p[i])[np.asarray(batch.corr.v2p_mask[i])]
        curve = M.corr_accuracy_curve(
            np.asarray(vtx_f[i])[vm], np.asarray(pts_f[i]), corr,
            np.asarray(batch.points.pts[i]),
        )
        for tol, acc in curve.items():
            print(f"tolerance {tol:.2f}: accuracy {acc:.4f}")
    elif args.what == "deform":
        from morig_tpu.train.stages import DeformPoseStage

        stage = DeformPoseStage()
        batch = ds.batch(list(range(min(len(ds), args.batch_size))), src_f, tar_f)
        state = stage.init_state(jax.random.key(0), batch)
        if args.resume:
            state, _ = ckpt.load_checkpoint(state, args.resume)
        flow, *_ = stage.infer(state, batch)
        vm = np.asarray(batch.mesh.vert_mask)
        err = M.mean_flow_l2(np.asarray(flow)[vm], np.asarray(batch.gt_flow)[vm])
        print(f"mean flow L2: {err:.5f}  (reference runs: 0.06631 / 0.06352, eval_deform.py:4-5)")
    elif args.what == "attn":
        from morig_tpu.train.stages import RigStage

        rig_ds = _rig_dataset(args)
        stage = RigStage(arch="masknet", num_embed_sample=min(512, rig_ds.pad_verts))
        batch = rig_ds.batch(list(range(min(len(rig_ds), args.batch_size))))
        state = stage.init_state(jax.random.key(0), batch)
        if args.resume:
            state, _ = ckpt.load_checkpoint(state, args.resume)
        _, _, logits = stage.infer(state, batch.pred_flow, batch.mesh)
        i = 0
        vm = np.asarray(batch.mesh.vert_mask[i])
        pr = M.attention_pr_curve(np.asarray(logits[i, :, 0])[vm],
                                  np.asarray(batch.attn_mask[i])[vm])
        for t, p, r in pr:
            print(f"threshold {t:.2f}: precision {p:.3f} recall {r:.3f}")
    else:
        raise SystemExit(args.what)


def cmd_predict_rig(args):
    _setup(args)
    import jax

    from morig_tpu.pipelines.rig_predict import capsule_predictor

    os.makedirs(args.out, exist_ok=True)
    predictor, pose_ds, rig_ds = capsule_predictor(train_steps=args.train_steps)
    for i, m in enumerate(pose_ds.models):
        out = os.path.join(args.out, f"{m.name}_rig.txt")
        if os.path.exists(out) and not args.force:
            # resumable-DAG property: skip models whose artifact exists
            # (joint2rig.py:287-288)
            print(f"{m.name}: exists, skipped ({out})")
            continue
        pts_frames = np.stack([m.pts_traj[:, t, :] for t in range(1, 6)])
        entry = rig_ds._mesh_cache[i]
        inter = {} if args.save_intermediates else None
        rig = predictor.predict_rig(entry, pts_frames, intermediates=inter)
        rig.save(out)
        if args.save_intermediates:
            # the eval_rigging.py artifact pair (shifted pts + attention,
            # train_rig.py:257,264) consumed by `eval rig --res` — stage
            # byproducts stashed by predict_rig, not recomputed
            from morig_tpu.data.mesh_io import write_ply_points
            from morig_tpu.geometry import skeleton as sk

            write_ply_points(os.path.join(args.out, f"{m.name}_shift.ply"),
                             inter["shifted"])
            np.save(os.path.join(args.out, f"{m.name}_attn.npy"), inter["attn"])
            gt = rig_ds.models[i].rig
            sk.Rig(names=list(gt.names), pos=gt.pos, parents=gt.parents,
                   skins=gt.skins).save(
                os.path.join(args.out, f"{m.name}_gt_rig.txt"))
        print(f"{m.name}: {rig.num_joints} joints -> {out}")


def cmd_track(args):
    _setup(args)
    import jax

    from morig_tpu.core import batch as B
    from morig_tpu.data.synthetic import make_capsule_sequence
    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.eval.metrics import flow_errors
    from morig_tpu.geometry import skeleton as sk
    from morig_tpu.pipelines.tracking import Tracker
    from morig_tpu.train.stages import DeformPoseStage

    os.makedirs(args.out, exist_ok=True)
    seq = make_capsule_sequence(num_frames=args.frames, num_points=256)
    cap = seq["rig"]
    rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                 parents=cap.parents, skins=cap.skins)
    entry = B.build_mesh(cap.verts, seq["tpl_edges"], seq["geo_edges"], 1024)
    ds = capsule_pose_dataset(num_models=1, num_frames=4, num_points=256)
    stage = DeformPoseStage()
    state = stage.init_state(jax.random.key(0), ds.batch([0], 0, 2))
    tracker = Tracker(stage, state, rig, entry)
    traj, vis, quats = tracker.run(cap.verts, seq["pts_traj"])
    errs = flow_errors(traj, seq["vtx_traj"][:, 1:, :], seq["vismask"][:, 1:])
    extra = {}
    if args.smooth_passes > 0:
        # visualize_tracking.py:43-61 workflow: temporally smooth the
        # per-joint quaternions and re-pose, then dump overlay PLYs
        from morig_tpu.eval.visualize import (export_tracking,
                                              smooth_tracking_quats)

        straj, squats = smooth_tracking_quats(rig, cap.verts, quats,
                                              num_pass=args.smooth_passes)
        extra = dict(pred_vtx_traj_smooth=straj, pred_quats_smooth=squats)
        export_tracking(args.out, "capsule_smooth", straj,
                        seq["pts_traj"][:, 1:, :])
    np.savez(os.path.join(args.out, "capsule_tracking.npz"),
             pred_vtx_traj=traj, pred_vismask=vis, pred_quats=quats,
             **extra, **errs)
    print(errs)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="morig_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a pipeline stage")
    t.add_argument("stage", choices=["corr_pose", "corr_shape", "deform_pose",
                                     "deform_shape", "joints", "mask", "skin",
                                     "bone", "root"])
    _add_common(t)
    t.add_argument("--train-vismask", action="store_true")
    t.add_argument("--train-extractor", action="store_true")
    t.add_argument("--init-extractor", default="",
                   help="corr checkpoint to initialize the deform extractor")
    t.set_defaults(fn=cmd_train)

    ev = sub.add_parser("eval", help="offline metrics (corr/deform/attn) and "
                                     "results-folder eval (rig/tracking)")
    ev.add_argument("what", choices=["corr", "deform", "attn", "rig", "tracking"])
    _add_common(ev)
    ev.add_argument("--res", default="", help="results folder (eval rig/tracking)")
    ev.add_argument("--gt", default="", help="ground-truth folder (eval rig/tracking)")
    ev.set_defaults(fn=cmd_eval)

    p = sub.add_parser("predict-rig", help="full rig prediction demo")
    _add_common(p)
    p.add_argument("--out", default="results")
    p.add_argument("--train-steps", type=int, default=10)
    p.add_argument("--save-intermediates", action="store_true",
                   help="also dump {name}_shift.ply/_attn.npy/_gt_rig.txt "
                        "(the eval_rigging.py artifact layout)")
    p.add_argument("--force", action="store_true",
                   help="recompute even when {name}_rig.txt exists "
                        "(default skips, joint2rig.py:287-288)")
    p.set_defaults(fn=cmd_predict_rig)

    b = sub.add_parser("bench", help="rig-prediction throughput benchmark")
    b.add_argument("--smoke", action="store_true")
    b.add_argument("--iters", type=int, default=20)
    b.add_argument("--batch", type=int, default=8)

    def _bench(args):
        import bench as bench_mod  # repo-root bench.py
        import sys as _sys

        argv = []
        if args.smoke:
            argv.append("--smoke")
        argv += ["--iters", str(args.iters), "--batch", str(args.batch)]
        _sys.argv = ["bench.py"] + argv
        bench_mod.main()

    b.set_defaults(fn=_bench)

    tr = sub.add_parser("track", help="tracking demo on the capsule")
    _add_common(tr)
    tr.add_argument("--out", default="results")
    tr.add_argument("--frames", type=int, default=6)
    tr.add_argument("--smooth-passes", type=int, default=2,
                    help="temporal quaternion-smoothing passes for the "
                         "visualization outputs (visualize_tracking.py:44; "
                         "0 disables)")
    tr.set_defaults(fn=cmd_track)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
