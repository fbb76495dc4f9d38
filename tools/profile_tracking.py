"""Tracking-path profile: wall-time per frame for the single-mesh scanned
tracker vs the BatchedTracker at several batch sizes, plus a flow-vs-IK
split (the per-frame chain is DeformNet flow -> IK1 -> gate -> IK2;
eval_tracking.py:56-171).  Tunnel-safe fencing via scalar fetch.

  python tools/profile_tracking.py [--frames 41] [--batches 1,4,8,16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from morig_tpu.core.compile_cache import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp
import numpy as np


def fence(x):
    leaves = [v for v in jax.tree_util.tree_leaves(x) if hasattr(v, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=41)
    ap.add_argument("--batches", default="1,4,8,16")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from morig_tpu.core import batch as B
    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.data.synthetic import make_capsule_rig, make_capsule_sequence
    from morig_tpu.geometry import skeleton as sk
    from morig_tpu.kernels.edge_fused import check_neighbor_locality
    from morig_tpu.nn import gcu
    from morig_tpu.pipelines.tracking import (
        BatchedTracker, Tracker, make_scanned_tracker,
    )
    from morig_tpu.train.stages import DeformPoseStage

    kw = dict(n_lat=37, n_lon=36)
    cap = make_capsule_rig(**kw)
    seq = make_capsule_sequence(num_frames=args.frames, max_bend=0.5,
                                num_points=1024, **kw)
    V_raw = cap.verts.shape[0]
    PAD = ((V_raw + 255) // 256) * 256
    entry = B.build_mesh(cap.verts, seq["tpl_edges"], seq["geo_edges"], PAD,
                         tpl_max_degree=12, geo_max_degree=12)
    local = all(check_neighbor_locality(np.asarray(entry[k])[None], tile_v=128)
                for k in ("tpl_nbr", "geo_nbr"))
    gcu.set_edge_tile(128)
    gcu.set_edge_impl("windowed" if local else "fused")

    init_kw = dict(num_points=64, n_lat=9, n_lon=8)
    pose_b = capsule_pose_dataset(
        num_models=2, num_frames=4, **init_kw).batch([0, 1], 0, 2)
    deform = DeformPoseStage()
    state = deform.init_state(jax.random.key(0), pose_b)
    rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                 parents=cap.parents, skins=cap.skins)

    # ---- single-mesh scanned tracker --------------------------------------
    tracker = Tracker(deform, state, rig, entry)
    run1 = make_scanned_tracker(tracker)
    run1(cap.verts, seq["pts_traj"])                       # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        traj, _, _ = run1(cap.verts, seq["pts_traj"])
    dt = (time.perf_counter() - t0) / args.iters
    T = traj.shape[1]
    print(f"single : {dt*1e3:8.1f} ms  {T/dt:7.1f} fps "
          f"({dt/T*1e3:.2f} ms/frame)")

    # flow-only per frame: the same DeformNet forward the scanned tracker
    # runs (mirrors make_scanned_tracker's flow_fn), scanned without IK
    import dataclasses

    nv = tracker.num_valid
    pad_v = tracker.mesh_entry["verts"].shape[0]
    mesh_proto = B.stack_meshes([tracker.mesh_entry])

    def flow_only(verts, pts_seq):
        def step(v, p):
            verts_p = jnp.concatenate(
                [v, jnp.zeros((pad_v - nv, 3), jnp.float32)], axis=0)
            mesh = dataclasses.replace(mesh_proto, verts=verts_p[None])
            points = B.PointBatch(p[None], jnp.ones((1, p.shape[0]), bool))
            ei = jnp.zeros((1, 1, 2), jnp.int32)
            em = jnp.zeros((1, 1), bool)
            sample = B.PoseSample(
                mesh=mesh, points=points, corr=B.CorrBatch(ei, em, ei, em),
                vismask=jnp.zeros(mesh.vert_mask.shape),
                gt_flow=jnp.zeros(mesh.verts.shape))
            f, *_ = tracker.stage.infer(tracker.state, sample)
            return v + f[0, :nv], f[0, :nv]
        _, fl = jax.lax.scan(step, verts, pts_seq)
        return fl

    pts_seq = jnp.asarray(np.transpose(
        np.asarray(seq["pts_traj"], np.float32)[:, 1:, :], (1, 0, 2)))
    fj = jax.jit(flow_only)
    v0 = jnp.asarray(cap.verts, jnp.float32)
    fence(fj(v0, pts_seq))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        fence(fj(v0, pts_seq))
    dtf = (time.perf_counter() - t0) / args.iters
    print(f"  flow-only: {dtf*1e3:8.1f} ms ({dtf/T*1e3:.2f} ms/frame; "
          f"IK+gate = {(dt-dtf)/T*1e3:.2f} ms/frame)")

    # ---- batched tracker at several B -------------------------------------
    for NB in [int(x) for x in args.batches.split(",")]:
        btr = BatchedTracker(deform, state, [rig] * NB, [entry] * NB,
                             max_joints=8)
        run_b = btr.make_scanned()
        vtx0_b = np.stack([B.pad_to(cap.verts, PAD)] * NB)
        pts_b = np.stack([seq["pts_traj"]] * NB)
        run_b(vtx0_b, pts_b)                               # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            traj_b, _, _ = run_b(vtx0_b, pts_b)
        dtb = (time.perf_counter() - t0) / args.iters
        Tb = traj_b.shape[2]
        print(f"B={NB:<4d}: {dtb*1e3:8.1f} ms  {NB*Tb/dtb:7.1f} aggregate fps "
              f"({dtb/Tb*1e3:.2f} ms/frame-step)")


if __name__ == "__main__":
    main()
