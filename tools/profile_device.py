"""Ad-hoc device profiling helpers (run on the TPU host).

Times the components of the DeformNet forward at bench shapes
(B*T=40, V=1536, P=1024): MeshEncoder / PointEncoder / GCNDeform / full.
Inputs are cycled across pre-uploaded variants so a caching runtime cannot
dedupe repeated executions.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(x):
    """Force execution: on the tunneled backend block_until_ready is not a
    reliable fence — fetch a scalar reduction instead."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench_fn(fn, arg_variants, iters=20, label=""):
    out = fn(*arg_variants[0])
    _force(out)
    t0 = time.perf_counter()
    outs = [fn(*arg_variants[i % len(arg_variants)]) for i in range(iters)]
    for o in outs:
        _force(o)   # device executions serialize; fetches drain the stream
    dt = (time.perf_counter() - t0) / iters * 1000
    try:
        cost = fn.lower(*arg_variants[0]).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = cost.get("flops", 0.0)
    except Exception:
        fl = 0.0
    print(f"{label:24s} {dt:8.1f} ms   {fl/1e9:8.1f} GF   "
          f"{fl / max(dt/1000, 1e-9) / 1e12:6.2f} TF/s", flush=True)
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
    NV = 3    # input variants
    ds = capsule_pose_dataset(num_models=4, num_frames=6, **kw)
    V_raw = ds.models[0].vtx_traj.shape[0]
    PAD = ((V_raw + 255) // 256) * 256
    entries = [B.build_mesh(m.vtx_traj[:, 0, :], m.tpl_edges, m.geo_edges, PAD)
               for m in ds.models]
    mesh = B.stack_meshes([entries[i % 4] for i in range(BT)])
    rng = np.random.default_rng(0)
    pts_vars = [
        jax.device_put(rng.normal(size=(BT, 1024, 3)).astype(np.float32) * 0.3)
        for _ in range(NV)
    ]
    pmask = jnp.ones((BT, 1024), bool)
    points_vars = [B.PointBatch(p, pmask) for p in pts_vars]
    local = all(check_neighbor_locality(np.asarray(e[k])[None])
                for e in entries for k in ("tpl_nbr", "geo_nbr"))
    gcu.set_edge_impl("windowed" if local else "fused")
    print("backend:", jax.default_backend(), "pad:", PAD, "BT:", BT,
          "impl:", gcu.get_edge_impl(), flush=True)

    key = jax.random.key(0)
    dn = DeformNet()
    dvars = dn.init(key, mesh, points_vars[0], False, None)
    params = dvars["params"]
    stats = dvars.get("batch_stats", {})

    full = jax.jit(lambda p, m, pt: dn.apply({"params": p}, m, pt, False, None)[0])
    bench_fn(full, [(params, mesh, pv) for pv in points_vars], label="DeformNet fwd")

    cn = CorrNet()
    cp = params["corr_extractor"]
    corr = jax.jit(lambda p, m, pt: cn.apply({"params": p}, m, pt, False, True, None))
    bench_fn(corr, [(cp, mesh, pv) for pv in points_vars], label="CorrNet (w/ vis)")

    me = MeshEncoder()
    mp = cp["mesh_enc"]
    vert_vars = [
        dataclasses_replace_verts(mesh, pts_vars[i][:, :PAD % 1024 or 1024, :], PAD)
        for i in range(NV)
    ]
    mesh_enc = jax.jit(lambda p, m: me.apply({"params": p}, m, False))
    bench_fn(mesh_enc, [(mp, mv) for mv in vert_vars], label="MeshEncoder")

    pe = PointEncoder()
    pp = cp["pts_enc"]
    pts_enc = jax.jit(lambda p, pt: pe.apply({"params": p}, pt, False, None))
    bench_fn(pts_enc, [(pp, pv) for pv in points_vars], label="PointEncoder")

    gd = GCNDeform(3)
    gp = params["completing"]
    feat_vars = [jnp.pad(pts_vars[i][:, : PAD - 1024 if PAD > 1024 else 1024, :1],
                         ((0, 0), (0, max(0, PAD - (PAD - 1024 if PAD > 1024 else 1024))), (0, 3)))
                 for i in range(NV)]
    feat_vars = [jnp.zeros((BT, PAD, 4), jnp.float32) + i * 1e-3 for i in range(NV)]
    gcn = jax.jit(lambda p, pos, f, m: gd.apply({"params": p}, pos, f, m, False))
    bench_fn(gcn, [(gp, vert_vars[i].verts, feat_vars[i], mesh) for i in range(NV)],
             label="GCNDeform")

    gcu.set_edge_impl("xla")
    mesh_enc2 = jax.jit(lambda p, m: me.apply({"params": p}, m, False))
    bench_fn(mesh_enc2, [(mp, mv) for mv in vert_vars], label="MeshEncoder (xla)")
    gcu.set_edge_impl("auto")


def dataclasses_replace_verts(mesh, noise_src, PAD):
    import dataclasses

    base = mesh.verts
    n = jnp.broadcast_to(
        jnp.mean(noise_src) * 1e-3, base.shape)
    return dataclasses.replace(mesh, verts=base + n)


if __name__ == "__main__":
    main()
