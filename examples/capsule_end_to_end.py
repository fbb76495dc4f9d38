"""End-to-end demo: train every stage on the synthetic capsule, run the full
rig-prediction pipeline and tracking, report metrics.

This is the framework's "golden path" — the six-stage workflow of the
reference (README.md:30-205) compressed onto the synthetic fixture:

    corr/deform -> joints+mask -> bone+root -> skin -> rig -> tracking

Run:  python examples/capsule_end_to_end.py [--steps N] [--platform cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="results/capsule_demo")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.data.rig import capsule_rig_dataset
    from morig_tpu.data.skeleton_data import capsule_skel_dataset
    from morig_tpu.data.synthetic import make_capsule_rig, make_capsule_sequence
    from morig_tpu.eval.metrics import flow_errors, joint_match_metrics, skin_l1
    from morig_tpu.geometry import skeleton as sk
    from morig_tpu.geometry.voxel import voxelize_mesh
    from morig_tpu.pipelines.rig_predict import RigPredictor
    from morig_tpu.pipelines.tracking import Tracker
    from morig_tpu.train.stages import (
        BoneStage, CorrPoseStage, DeformPoseStage, RigStage, RootStage, SkinStage,
    )
    from morig_tpu.utils.profiling import StageTimer

    os.makedirs(args.out, exist_ok=True)
    timer = StageTimer()
    kw = dict(num_points=256, n_lat=13, n_lon=12)
    pose_ds = capsule_pose_dataset(num_models=2, num_frames=6, **kw)
    rig_ds = capsule_rig_dataset(num_models=2, **kw)
    skel_s = capsule_skel_dataset(num_models=2, max_joints=8, **kw)
    pose_b = pose_ds.batch([0, 1], 0, 2)
    rig_b = rig_ds.batch([0, 1])

    rng = jax.random.key(0)

    # stage 1: correspondence pretraining, then hand the extractor to the
    # deform stage (the reference's corr ckpt -> --init_extractor flow,
    # train_deform_pose.py:149)
    corr = CorrPoseStage()
    corr_state = corr.init_state(jax.random.key(7), pose_b)
    r = jax.random.key(2)
    with timer.section("train_corr"):
        for step in range(max(args.steps // 2, 1)):
            r, s = jax.random.split(r)
            corr_state, cm = corr.train_step(corr_state, pose_b, s)
            if step % 25 == 0:
                print(f"corr step {step}: loss={float(cm['total_loss']):.3f}")

    stages = {
        "deform": (DeformPoseStage(), pose_b),
        "joints": (RigStage(arch="jointnet", num_embed_sample=128), rig_b),
        "mask": (RigStage(arch="masknet", num_embed_sample=128), rig_b),
        "skin": (SkinStage(num_embed_sample=128), rig_b),
        "bone": (BoneStage(), skel_s),
        "root": (RootStage(), skel_s),
    }
    states = {}
    for name, (stage, batch) in stages.items():
        states[name] = stage.init_state(jax.random.key(hash(name) % 2**31), batch)
    states["deform"] = stages["deform"][0].init_extractor_from(
        states["deform"], corr_state.params, corr_state.batch_stats)

    r = jax.random.key(1)
    with timer.section("train_all_stages"):
        for step in range(args.steps):
            r, s = jax.random.split(r)
            last = {}
            for name, (stage, batch) in stages.items():
                if name == "deform" and step >= args.steps // 2:
                    continue  # deform converges fast on the fixture
                states[name], m = stage.train_step(states[name], batch, s)
                last[name] = float(m["total_loss"])
            if step % 25 == 0:
                print(f"step {step}: " + " ".join(f"{n}={v:.3f}" for n, v in last.items()))

    predictor = RigPredictor(
        stages["deform"][0], states["deform"],
        stages["joints"][0], states["joints"],
        stages["mask"][0], states["mask"],
        stages["root"][0], states["root"],
        stages["bone"][0], states["bone"],
        stages["skin"][0], states["skin"],
    )

    cap = make_capsule_rig(13, 12)
    vox = voxelize_mesh(cap.verts, cap.faces, dims=48)
    m0 = pose_ds.models[0]
    pts_frames = np.stack([m0.pts_traj[:, t, :] for t in range(1, 6)])
    with timer.section("predict_rig"):
        rig = predictor.predict_rig(rig_ds._mesh_cache[0], pts_frames, vox=vox)
    rig.save(os.path.join(args.out, "capsule_rig.txt"))

    gt = rig_ds.models[0].rig
    jm = joint_match_metrics(rig.pos, gt.pos, feature_sizes=0.12)
    print("\n== rig prediction ==")
    print(f"pred joints: {rig.num_joints} (gt {gt.num_joints})")
    print({k: round(v, 4) for k, v in jm.items()})

    # tracking with the trained deform stage
    seq = make_capsule_sequence(num_frames=8, max_bend=0.5, partial=False, seed=5, **kw)
    track_rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                       parents=cap.parents, skins=cap.skins)
    from morig_tpu.core.batch import build_mesh

    entry = build_mesh(cap.verts, seq["tpl_edges"], seq["geo_edges"],
                       rig_ds.pad_verts)
    tracker = Tracker(stages["deform"][0], states["deform"], track_rig, entry)
    t0 = time.perf_counter()
    with timer.section("tracking"):
        traj, vis, quats = tracker.run(cap.verts, seq["pts_traj"])
    fps = traj.shape[1] / (time.perf_counter() - t0)
    errs = flow_errors(traj, seq["vtx_traj"][:, 1:, :], seq["vismask"][:, 1:])
    print("\n== tracking ==")
    print({k: round(v, 5) for k, v in errs.items()}, f"| {fps:.2f} tracked frames/sec")

    print("\n== stage timings ==")
    print(timer.report())


if __name__ == "__main__":
    main()
