"""Ad-hoc device profiling helpers (run on the TPU host).

profile_flow_bisect: time the components of the DeformNet forward at bench
shapes (B*T=40, V=1536, P=1024) to find where the flow-program milliseconds
go: MeshEncoder / PointEncoder / vismask head / voting knn / GCNDeform.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_fn(fn, *args, iters=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    try:
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = cost.get("flops", 0.0)
    except Exception:
        fl = 0.0
    print(f"{label:24s} {dt:8.1f} ms   {fl/1e9:8.1f} GF   "
          f"{fl/ (dt/1000) / 1e12:6.2f} TF/s")
    return dt


def main():
    from morig_tpu.core import batch as B
    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.nn import gcu
    from morig_tpu.nn.corrnet import CorrNet, MeshEncoder, PointEncoder
    from morig_tpu.nn.deformnet import DeformNet, GCNDeform
    from morig_tpu.kernels.edge_fused import check_neighbor_locality

    kw = dict(num_points=1024, n_lat=37, n_lon=36)
    BT = 40
    ds = capsule_pose_dataset(num_models=4, num_frames=6, **kw)
    V_raw = ds.models[0].vtx_traj.shape[0]
    PAD = ((V_raw + 255) // 256) * 256
    entries = [B.build_mesh(m.vtx_traj[:, 0, :], m.tpl_edges, m.geo_edges, PAD)
               for m in ds.models]
    mesh = B.stack_meshes([entries[i % 4] for i in range(BT)])
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(BT, 1024, 3)).astype(np.float32) * 0.3)
    points = B.PointBatch(pts, jnp.ones((BT, 1024), bool))
    local = all(check_neighbor_locality(np.asarray(e[k])[None])
                for e in entries for k in ("tpl_nbr", "geo_nbr"))
    gcu.set_edge_impl("windowed" if local else "fused")
    print("backend:", jax.default_backend(), "pad:", PAD, "BT:", BT,
          "impl:", gcu.get_edge_impl())

    key = jax.random.key(0)
    dn = DeformNet()
    dvars = dn.init(key, mesh, points, False, None)

    full = jax.jit(lambda v, m, p: dn.apply(v, m, p, False, None)[0])
    bench_fn(full, dvars, mesh, points, label="DeformNet fwd")

    cn = CorrNet()
    cvars = {"params": dvars["params"]["corr_extractor"],
             "batch_stats": dvars["batch_stats"]["corr_extractor"]}
    corr = jax.jit(lambda v, m, p: cn.apply(v, m, p, False, True, None)[0])
    bench_fn(corr, cvars, mesh, points, label="CorrNet fwd (w/ vis)")

    me = MeshEncoder()
    mvars = {"params": dvars["params"]["corr_extractor"]["mesh_enc"],
             "batch_stats": dvars["batch_stats"]["corr_extractor"]["mesh_enc"]}
    mesh_enc = jax.jit(lambda v, m: me.apply(v, m, False))
    bench_fn(mesh_enc, mvars, mesh, label="MeshEncoder")

    pe = PointEncoder()
    pvars = {"params": dvars["params"]["corr_extractor"]["pts_enc"],
             "batch_stats": dvars["batch_stats"]["corr_extractor"]["pts_enc"]}
    pts_enc = jax.jit(lambda v, p: pe.apply(v, p, False, None))
    bench_fn(pts_enc, pvars, points, label="PointEncoder")

    gd = GCNDeform(3)
    gvars = {"params": dvars["params"]["completing"],
             "batch_stats": dvars["batch_stats"]["completing"]}
    feat = jnp.zeros((BT, PAD, 4), jnp.float32)
    gcn = jax.jit(lambda v, p, f, m: gd.apply(v, p, f, m, False))
    bench_fn(gcn, gvars, mesh.verts, feat, mesh, label="GCNDeform")

    gcu.set_edge_impl("xla")
    me2 = jax.jit(lambda v, m: me.apply(v, m, False))
    bench_fn(me2, mvars, mesh, label="MeshEncoder (xla)")
    gcu.set_edge_impl("auto")


if __name__ == "__main__":
    main()
