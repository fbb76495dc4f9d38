"""Post-campaign tracking evaluation over ALL held-out creatures at once.

The reference evaluates tracking one mesh at a time over the whole test set
(eval_tracking.py:207-235); here the five held-out branching creatures are
tracked simultaneously in one scanned BatchedTracker program, which both
produces per-model full/visible flow errors (eval_tracking.py:230-235
metrics) and measures aggregate tracked frames/sec on the chip
(VERDICT r2 next #4).

  python tools/eval_campaign_tracking.py --dir campaign_out \
      [--frames 11] [--points 512] [--timing-iters 3]

Writes <dir>/results/tracking_batched.json and per-creature
creature<seed>_tracking.npz artifacts (eval-tracking CLI layout).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from morig_tpu.core.compile_cache import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="campaign_out")
    ap.add_argument("--frames", type=int, default=11)
    ap.add_argument("--points", type=int, default=512)
    ap.add_argument("--target-verts", type=int, default=1900)
    ap.add_argument("--timing-iters", type=int, default=3)
    ap.add_argument("--seeds", default="200,201,202,203,204")
    args = ap.parse_args()

    from morig_tpu.core import batch as B
    from morig_tpu.data.creature import make_creature_sequence
    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.eval.metrics import flow_errors
    from morig_tpu.geometry import skeleton as sk
    from morig_tpu.pipelines.tracking import BatchedTracker
    from morig_tpu.train import checkpoint as ckpt
    from morig_tpu.train.stages import DeformPoseStage

    seeds = [int(s) for s in args.seeds.split(",")]

    # trained DeformNet from the campaign (params are shape-independent of
    # the init batch, so a tiny capsule batch suffices as the template)
    stage = DeformPoseStage()
    seq_best = os.path.join(args.dir, "deform_seq", "model_best.msgpack")
    tiny = capsule_pose_dataset(num_models=1, num_frames=3, num_points=64,
                                n_lat=7, n_lon=6)
    state = stage.init_state(jax.random.key(0), tiny.batch([0], 0, 1))
    # prefer the sequential deform model: tracking consumes frame-to-frame
    # deltas (eval_tracking.py:21 loads the seq checkpoint)
    best = seq_best if os.path.exists(seq_best) \
        else os.path.join(args.dir, "deform", "model_best.msgpack")
    state, meta = ckpt.load_checkpoint(state, best)
    print(f"[track-eval] deform checkpoint: {best} (epoch {meta.get('epoch')})")

    # held-out creatures: GT rigs + animated partial point-cloud sequences
    rigs, entries, seqs = [], [], []
    PAD = 2048
    for s in seeds:
        seq = make_creature_sequence(seed=s, num_frames=args.frames,
                                     num_points=args.points,
                                     target_verts=args.target_verts)
        c = seq["rig"]
        rigs.append(sk.Rig(names=list(c.names), pos=c.joints.astype(np.float64),
                           parents=c.parents, skins=c.skins))
        entries.append(B.build_mesh(c.verts, seq["tpl_edges"],
                                    seq["geo_edges"], PAD))
        seqs.append(seq)
        print(f"[track-eval] creature{s}: V={len(c.verts)} J={c.joints.shape[0]}")

    tracker = BatchedTracker(stage, state, rigs, entries, max_joints=32)
    run = tracker.make_scanned()

    Bn = len(seeds)
    vtx0 = np.stack([B.pad_to(seqs[i]["rig"].verts, PAD) for i in range(Bn)])
    pts_b = np.stack([s["pts_traj"] for s in seqs])

    t0 = time.time()
    traj, vis, quats = run(vtx0, pts_b)          # includes compile
    compile_s = time.time() - t0

    # steady-state timing on the jitted program (fence by host fetch)
    v0d, pts_seq = run.last_args
    times = []
    for _ in range(args.timing_iters):
        t0 = time.time()
        out = run.jitted(v0d, pts_seq)
        float(jnp.sum(out[0][0, 0]))
        times.append(time.time() - t0)
    dt = min(times)
    frames = Bn * (args.frames - 1)
    fps = frames / dt

    res_dir = os.path.join(args.dir, "results")
    os.makedirs(res_dir, exist_ok=True)
    per_model = []
    for i, s in enumerate(seeds):
        nv = len(seqs[i]["rig"].verts)
        terr = flow_errors(traj[i, :nv], seqs[i]["vtx_traj"][:, 1:, :],
                           seqs[i]["vismask"][:, 1:])
        np.savez(os.path.join(res_dir, f"creature{s}_tracking.npz"),
                 pred_vtx_traj=traj[i, :nv], pred_vismask=vis[i, :nv],
                 pred_quats=quats[i])
        per_model.append(dict(seed=s, **{k: float(v) for k, v in terr.items()}))
        print(f"[track-eval] creature{s}: {terr}")

    summary = dict(
        per_model=per_model,
        mean=dict(
            full_flow_error=float(np.mean([m["full_flow_error"]
                                           for m in per_model])),
            vis_flow_error=float(np.mean([m.get("vis_flow_error", np.nan)
                                          for m in per_model])),
        ),
        batched=dict(num_meshes=Bn, frames_per_mesh=args.frames - 1,
                     aggregate_frames_per_sec=fps, steady_seconds=dt,
                     first_call_seconds=compile_s,
                     points=args.points, pad_verts=PAD),
    )
    with open(os.path.join(res_dir, "tracking_batched.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("[track-eval] SUMMARY:", json.dumps(summary["mean"]),
          f"aggregate {fps:.1f} frames/sec ({Bn} meshes batched)")


if __name__ == "__main__":
    main()
