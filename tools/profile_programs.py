"""Wall-time each compiled pipeline program standalone at bench shapes.

Runs one predict_rig_batch to populate the program cache + recorded args
(record_args), then times every program with scalar-fetch fencing (the
tunnel-safe fence — block_until_ready is unreliable on the axon backend).

  python tools/profile_programs.py [--geo] [--batch 32] [--iters 3]

--roofline additionally pulls flops + bytes-accessed from each program's
XLA cost analysis and reports arithmetic intensity, the HBM-vs-MXU bound,
the speed-of-light time under the v5e roofline (flops/peak_flops vs
bytes/peak_bw, whichever is larger) and the % of that bound achieved —
the record the VERDICT asks for to explain the rig path's MFU.
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


def fence(out):
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geo", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--roofline", action="store_true")
    ap.add_argument("--trace", default=None, metavar="PREFIX",
                    help="per-op device profile of the one cached program "
                         "whose name starts with PREFIX")
    ap.add_argument("--hlo", default=None, metavar="PREFIX",
                    help="dump compiled HLO of the program whose name starts "
                         "with PREFIX to /tmp/<name>.hlo")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="v5e bf16 peak")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="v5e HBM bandwidth GB/s")
    args = ap.parse_args()

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
    Bn, T = args.batch, 5
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
    if args.geo:
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
    deform = DeformPoseStage()
    joint = RigStage(arch="jointnet", num_embed_sample=128)
    mask = RigStage(arch="masknet", num_embed_sample=128)
    skin = SkinStage(num_embed_sample=128)
    bone = BoneStage()
    root = RootStage()
    predictor = RigPredictor(
        deform, deform.init_state(rng, pose_b),
        joint, joint.init_state(rng, rig_b),
        mask, mask.init_state(rng, rig_b),
        root, root.init_state(rng, skel_s),
        bone, bone.init_state(rng, skel_s),
        skin, skin.init_state(rng, rig_b))
    predictor.record_args = True
    dcache: dict = {}
    predictor.predict_rig_batch(entries, pts_frames_list, voxes=voxes,
                                surf_geos=surf_geos, device_cache=dcache)

    if args.hlo:
        name = next(n for n in predictor._jit_cache if n.startswith(args.hlo))
        w = predictor._jit_cache[name]
        a = predictor._last_args[name]
        txt = w.jitted.lower(*a).compile().as_text()
        out = f"/tmp/{name}.hlo"
        with open(out, "w") as fh:
            fh.write(txt)
        print(f"wrote {out} ({len(txt)} bytes)")
        return

    if args.trace:
        import collections
        import glob
        import gzip
        import json

        name = next(n for n in predictor._jit_cache if n.startswith(args.trace))
        w = predictor._jit_cache[name]
        a = predictor._last_args[name]
        fence(w.jitted(*a))                                   # warm
        with jax.profiler.trace("/tmp/progtrace"):
            for _ in range(max(args.iters, 1)):
                fence(w.jitted(*a))
        d = sorted(glob.glob("/tmp/progtrace/plugins/profile/*"))[-1]
        path = glob.glob(d + "/*.trace.json.gz")[0]
        with gzip.open(path) as fh:
            data = json.load(fh)
        ev = data["traceEvents"]
        pids = {e["pid"]: e["args"]["name"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev_pid = [p for p, n in pids.items() if "TPU" in n][0]
        agg = collections.Counter(); cnt = collections.Counter()
        for e in ev:
            if (e.get("ph") == "X" and e.get("pid") == dev_pid
                    and e.get("tid") not in (2,)):
                agg[e["name"]] += e.get("dur", 0); cnt[e["name"]] += 1
        it = max(args.iters, 1)
        total = sum(agg.values())
        print(f"[{name}] total device op time: {total/1000/it:.1f} ms/iter")
        for n, dsum in agg.most_common(25):
            print(f"{dsum/1000/it:9.2f} ms  x{cnt[n]//it:4d}  {n[:90]}")
        return

    if args.roofline:
        print(f"{'program':28s} {'ms':>8s} {'GFLOP':>8s} {'GB':>7s} "
              f"{'AI':>7s} {'bound':>7s} {'SoL ms':>8s} {'%SoL':>6s}")
    for name, w in predictor._jit_cache.items():
        a = predictor._last_args.get(name)
        if a is None or args.iters <= 0:
            continue
        fence(w.jitted(*a))                                   # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fence(w.jitted(*a))
        dt = (time.perf_counter() - t0) / args.iters
        if not args.roofline:
            print(f"  {name:28s}: {dt*1e3:8.1f} ms")
            continue
        try:
            cost = w.jitted.lower(*a).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            fl = float(cost.get("flops", 0.0))
            by = float(cost.get("bytes accessed", 0.0))
        except Exception:
            fl = by = 0.0
        t_mxu = fl / (args.peak_tflops * 1e12)
        t_hbm = by / (args.peak_gbs * 1e9)
        sol = max(t_mxu, t_hbm)
        bound = "MXU" if t_mxu >= t_hbm else "HBM"
        ai = fl / max(by, 1.0)
        pct = 100.0 * sol / dt if dt > 0 else 0.0
        print(f"{name:28s} {dt*1e3:8.1f} {fl/1e9:8.2f} {by/1e9:7.3f} "
              f"{ai:7.1f} {bound:>7s} {sol*1e3:8.2f} {pct:5.1f}%")

    if os.environ.get("DUMP_FUSION"):
        tname, fname = os.environ["DUMP_FUSION"].split(":")
        w = predictor._jit_cache[tname]
        a = predictor._last_args[tname]
        txt = w.jitted.lower(*a).compile().as_text()
        import re

        m = re.search(rf"%{fname} = [^\n]*", txt)
        if not m:
            print(f"{fname}: not found")
        else:
            line = m.group(0)
            print(line[:1500])
            cm = re.search(r"(?:calls|fusion)=%?([\w.\-]+)", line)
            if cm:
                comp = cm.group(1)
                cdef = re.search(
                    rf"%{re.escape(comp)} [^\n]*\{{(.*?)\n\}}", txt, re.S)
                if cdef:
                    print("--- called computation ---")
                    print(cdef.group(0)[:6000])
        return

    if os.environ.get("TRACE_PROGRAM"):
        import collections
        import glob
        import gzip
        import json

        tname = os.environ["TRACE_PROGRAM"]
        w = predictor._jit_cache[tname]
        a = predictor._last_args[tname]
        with jax.profiler.trace("/tmp/progtrace"):
            for _ in range(2):
                fence(w.jitted(*a))
        d = sorted(glob.glob("/tmp/progtrace/plugins/profile/*"))[-1]
        path = glob.glob(d + "/*.trace.json.gz")[0]
        with gzip.open(path) as fh:
            data = json.load(fh)
        ev = data["traceEvents"]
        pids = {e["pid"]: e["args"]["name"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev_pid = [p for p, n in pids.items() if "TPU" in n][0]
        agg = collections.Counter()
        cnt = collections.Counter()
        for e in ev:
            if (e.get("ph") == "X" and e.get("pid") == dev_pid
                    and e.get("tid") not in (2,)):
                agg[e["name"]] += e.get("dur", 0)
                cnt[e["name"]] += 1
        print(f"--- {tname} device ops over 2 runs ---")
        for n, dsum in agg.most_common(25):
            print(f"{dsum/1000:9.2f} ms  x{cnt[n]:5d}  {n[:90]}")


if __name__ == "__main__":
    main()
