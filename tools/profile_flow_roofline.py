"""Per-op roofline of the bench flow_joints program at EXACT bench shapes.

Builds the same predictor + batch as bench.py phase A (B=32, T=5, V pad 1536,
vox dims 88, volumetric surf-geo), executes predict_rig_batch once to populate
the jit cache, then traces N repeats of the requested program alone and prints,
for each hot op: device time, estimated bytes (sum of operand+output buffer
sizes parsed from the compiled HLO definition — the same read-once/write-once
model XLA's bytes-accessed uses), achieved GB/s vs HBM peak, and the HLO body
so the op class is identifiable.  VERDICT r4 next #1: the recorded evidence
for "bound vs fixable" per dominant op.

Usage: python tools/profile_flow_roofline.py [--program flow|skin] [--reps 3]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8,
               "u64": 8, "c64": 8, "c128": 16}
_SHAPE_RE = re.compile(r"\b(f64|f32|bf16|f16|s64|s32|s16|s8|u64|u32|u16|u8|pred|c64|c128)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--program", default="flow", choices=["flow", "skin"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--peak-gbps", type=float, default=819.0)
    ap.add_argument("--top", type=int, default=24)
    args = ap.parse_args()

    from morig_tpu.core.compile_cache import setup_compile_cache

    setup_compile_cache()
    import jax
    import numpy as np

    from morig_tpu.core import batch as B
    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.data.rig import capsule_rig_dataset
    from morig_tpu.data.skeleton_data import capsule_skel_dataset
    from morig_tpu.data.synthetic import make_capsule_rig
    from morig_tpu.geometry.geodesic import surface_geodesic
    from morig_tpu.geometry.voxel import voxelize_mesh
    from morig_tpu.nn import gcu
    from morig_tpu.pipelines.rig_predict import RigPredictor
    from morig_tpu.train.stages import (
        BoneStage, DeformPoseStage, RigStage, RootStage, SkinStage,
    )

    kw = dict(num_points=1024, n_lat=37, n_lon=36)
    Bn, T = args.batch, 5
    pose_ds = capsule_pose_dataset(num_models=Bn, num_frames=T + 1, **kw)
    V_raw = pose_ds.models[0].vtx_traj.shape[0]
    PAD = max(256, ((V_raw + 255) // 256) * 256)
    entries = [
        B.build_mesh(m.vtx_traj[:, 0, :], m.tpl_edges, m.geo_edges, pad_verts=PAD,
                     tpl_max_degree=12, geo_max_degree=12)
        for m in pose_ds.models
    ]
    pts_frames_list = [
        np.transpose(m.pts_traj[:, 1:T + 1, :], (1, 0, 2)) for m in pose_ds.models
    ]
    cap = make_capsule_rig(kw["n_lat"], kw["n_lon"])
    vox = voxelize_mesh(cap.verts, cap.faces, dims=88)
    surf = surface_geodesic(cap.verts, cap.faces)
    gcu.auto_select_edge_impl(entries, tile_v=128)
    print("edge impl:", gcu.get_edge_impl(), file=sys.stderr)

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
        skin, skin.init_state(rng, rig_b),
    )
    predictor.record_args = True
    dcache: dict = {}
    import time

    t0 = time.perf_counter()
    predictor.predict_rig_batch(entries, pts_frames_list, voxes=[vox] * Bn,
                                surf_geos=[surf] * Bn, device_cache=dcache)
    print(f"full DAG compile+run {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    prefix = {"flow": "flow_joints", "skin": "skin_full"}[args.program]
    name = next(n for n in predictor._jit_cache if n.startswith(prefix))
    wrapper = predictor._jit_cache[name]
    pargs = predictor._last_args[name]
    out = wrapper.jitted(*pargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = wrapper.jitted(*pargs)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    print(f"program {name}: wall {wall*1000:.1f} ms/iter", file=sys.stderr)

    trace_dir = f"/tmp/roofline_{args.program}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.reps):
            out = wrapper.jitted(*pargs)
        jax.block_until_ready(out)

    d = sorted(glob.glob(trace_dir + "/plugins/profile/*"))[-1]
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
        if e.get("ph") == "X" and e.get("pid") == dev_pid and e.get("tid") not in (2,):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total_us = sum(agg.values())
    print(f"\ntotal device op time: {total_us/1000/args.reps:.1f} ms/iter "
          f"(wall {wall*1000:.1f})")

    hlo = wrapper.jitted.lower(*pargs).compile().as_text()
    # map each op name to its full definition line (operand shapes included)
    defs = {}
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?([\w.\-]+) = ", ls)
        if m:
            defs.setdefault(m.group(1), ls)

    rows = []
    for n, dur_us in agg.most_common(args.top):
        base = n.split("/")[-1]
        dline = defs.get(base, "")
        nbytes = shape_bytes(dline.split(", calls=")[0]) if dline else 0
        t_s = dur_us / 1e6 / args.reps
        gbps = nbytes * cnt[n] / args.reps / max(t_s, 1e-12) / 1e9 if nbytes else 0.0
        rows.append((n, t_s * 1000, cnt[n] // args.reps, nbytes, gbps, dline))

    print(f"\n{'ms/iter':>8} {'x':>4} {'MB':>8} {'GB/s':>7} {'%HBM':>5}  op")
    for n, ms, c, nb, gbps, _ in rows:
        print(f"{ms:8.2f} {c:4d} {nb/2**20:8.1f} {gbps:7.1f} "
              f"{100*gbps/args.peak_gbps:5.1f}  {n[:70]}")
    print("\n--- HLO definitions (top ops) ---")
    for n, ms, c, nb, gbps, dline in rows[:14]:
        print(f"[{ms:7.2f} ms x{c}] {n}\n    {dline[:360]}\n")


if __name__ == "__main__":
    main()
