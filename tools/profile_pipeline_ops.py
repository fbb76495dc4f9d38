"""Per-op device profile of one full predict_rig_batch iteration at bench
shapes — aggregates the device track across all pipeline programs.

--geo additionally passes per-mesh surface-geodesic matrices so the
reference-faithful volumetric skin-descriptor path is the one profiled."""
import collections, glob, gzip, json, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    import jax.numpy as jnp
    from morig_tpu.core import batch as B
    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.data.rig import capsule_rig_dataset
    from morig_tpu.data.skeleton_data import capsule_skel_dataset
    from morig_tpu.data.synthetic import make_capsule_rig
    from morig_tpu.geometry.voxel import voxelize_mesh
    from morig_tpu.kernels.edge_fused import check_neighbor_locality
    from morig_tpu.nn import gcu
    from morig_tpu.pipelines.rig_predict import RigPredictor
    from morig_tpu.train.stages import (
        BoneStage, DeformPoseStage, RigStage, RootStage, SkinStage,
    )

    kw = dict(num_points=1024, n_lat=37, n_lon=36)
    Bn, T = (32 if "--b32" in sys.argv else 8), 5
    pose_ds = capsule_pose_dataset(num_models=Bn, num_frames=T + 1, **kw)
    V_raw = pose_ds.models[0].vtx_traj.shape[0]
    PAD = ((V_raw + 255) // 256) * 256
    entries = [B.build_mesh(m.vtx_traj[:, 0, :], m.tpl_edges, m.geo_edges, PAD,
                            tpl_max_degree=12, geo_max_degree=12)
               for m in pose_ds.models]
    pts_frames_list = [np.transpose(m.pts_traj[:, 1:T + 1, :], (1, 0, 2))
                       for m in pose_ds.models]
    cap = make_capsule_rig(kw["n_lat"], kw["n_lon"])
    vox = voxelize_mesh(cap.verts, cap.faces, dims=88)
    voxes = [vox] * Bn
    surf_geos = None
    if "--geo" in sys.argv:
        from morig_tpu.geometry.geodesic import surface_geodesic

        surf_geos = [surface_geodesic(cap.verts, cap.faces)] * Bn
    local = all(check_neighbor_locality(np.asarray(e[k])[None], tile_v=128)
                for e in entries for k in ("tpl_nbr", "geo_nbr"))
    gcu.set_edge_tile(128)
    gcu.set_edge_impl("windowed" if local else "fused")

    init_kw = dict(num_points=64, n_lat=9, n_lon=8)
    pose_b = capsule_pose_dataset(num_models=2, num_frames=4, **init_kw).batch([0, 1], 0, 2)
    rig_b = capsule_rig_dataset(num_models=2, **init_kw).batch([0, 1])
    skel_s = capsule_skel_dataset(num_models=2, max_joints=8, **init_kw)
    rng = jax.random.key(0)
    deform = DeformPoseStage(); joint = RigStage(arch="jointnet", num_embed_sample=128)
    mask = RigStage(arch="masknet", num_embed_sample=128)
    skin = SkinStage(num_embed_sample=128); bone = BoneStage(); root = RootStage()
    predictor = RigPredictor(
        deform, deform.init_state(rng, pose_b),
        joint, joint.init_state(rng, rig_b),
        mask, mask.init_state(rng, rig_b),
        root, root.init_state(rng, skel_s),
        bone, bone.init_state(rng, skel_s),
        skin, skin.init_state(rng, rig_b))
    dcache = {}
    predictor.predict_rig_batch(entries, pts_frames_list, voxes=voxes,
                                surf_geos=surf_geos,
                                device_cache=dcache)  # compile
    with jax.profiler.trace("/tmp/pipetrace"):
        for _ in range(2):
            predictor.predict_rig_batch(entries, pts_frames_list, voxes=voxes,
                                        surf_geos=surf_geos,
                                        device_cache=dcache)

    d = sorted(glob.glob("/tmp/pipetrace/plugins/profile/*"))[-1]
    path = glob.glob(d + "/*.trace.json.gz")[0]
    with gzip.open(path) as fh:
        data = json.load(fh)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pid = [p for p, n in pids.items() if "TPU" in n][0]
    agg = collections.Counter(); cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") == dev_pid and e.get("tid") not in (2,):
            agg[e["name"]] += e.get("dur", 0); cnt[e["name"]] += 1
    total = sum(agg.values())
    print(f"total device op time: {total/1000:.1f} ms over 2 iters")
    for n, dsum in agg.most_common(30):
        print(f"{dsum/1000:9.2f} ms  x{cnt[n]:4d}  {n[:80]}")


if __name__ == "__main__":
    main()
