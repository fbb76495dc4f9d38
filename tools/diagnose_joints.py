"""Diagnose joint under-detection on held-out creatures: instrument every
stage of the eval_rigging.py joint-extraction chain (attn filter -> bandwidth
-> mean-shift -> NMS -> flip) with the campaign's trained checkpoints.

  python tools/diagnose_joints.py --dir campaign_out [--seed 200]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from morig_tpu.core.compile_cache import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="campaign_out")
    ap.add_argument("--seed", type=int, default=200)
    ap.add_argument("--target-verts", type=int, default=1900)
    ap.add_argument("--points", type=int, default=1024)
    args = ap.parse_args()

    from morig_tpu.data.creature import creature_rig_dataset
    from morig_tpu.geometry.clustering import (
        estimate_bandwidth, meanshift_cluster, nms_modes, flip_joints,
    )
    from morig_tpu.train import checkpoint as ckpt
    from morig_tpu.train.stages import RigStage

    ds = creature_rig_dataset(num_models=1, seed=args.seed,
                              num_points=args.points,
                              target_verts=args.target_verts)
    m = ds.models[0]
    gt = m.rig
    dj = np.linalg.norm(gt.pos[:, None] - gt.pos[None], axis=-1)
    np.fill_diagonal(dj, np.inf)
    nn_d = dj.min(1)
    print(f"GT joints: {gt.num_joints}; nearest-joint dist: "
          f"min={nn_d.min():.4f} med={np.median(nn_d):.4f} max={nn_d.max():.4f}")

    b = ds.batch([0])
    joint = RigStage(arch="jointnet", num_embed_sample=min(512, ds.pad_verts))
    mask = RigStage(arch="masknet", num_embed_sample=min(512, ds.pad_verts))
    jst = joint.init_state(jax.random.key(0), b)
    mst = mask.init_state(jax.random.key(0), b)
    jst, _ = ckpt.load_checkpoint(jst, os.path.join(args.dir, "joints", "model_best.msgpack"))
    mst, _ = ckpt.load_checkpoint(mst, os.path.join(args.dir, "mask", "model_best.msgpack"))

    _, _, disp = joint.infer(jst, b.pred_flow, b.mesh)
    _, _, attn_logit = mask.infer(mst, b.pred_flow, b.mesh)
    vm = np.asarray(b.mesh.vert_mask[0])
    verts = np.asarray(b.mesh.verts[0])[vm]
    shifted = verts + np.tanh(np.asarray(disp[0]))[vm]
    attn = jax.nn.sigmoid(attn_logit[0, :, 0])
    attn = np.asarray(attn)[vm]

    # how close are shifted points to GT joints?
    d2j = np.linalg.norm(shifted[:, None] - gt.pos[None], axis=-1)
    near = d2j.min(1)
    print(f"shifted->GT-joint dist: med={np.median(near):.4f} "
          f"p90={np.percentile(near, 90):.4f}")
    # which GT joints attract any shifted point within 0.05?
    per_j = (d2j < 0.05).any(0)
    print(f"GT joints with a shifted point within 0.05: {per_j.sum()}/{len(per_j)}")

    a_n = (attn - attn.min()) / max(attn.max() - attn.min(), 1e-10)
    for thr in (0.1, 0.3, 0.5):
        print(f"attn_norm>{thr}: {(a_n > thr).sum()}/{len(a_n)} survivors")
    sel = a_n > 0.1
    pts = np.concatenate([shifted[sel], shifted[sel] * [-1, 1, 1]])  # reflect
    bw = float(estimate_bandwidth(jnp.asarray(pts, jnp.float32)))
    print(f"bandwidth(q=0.04) over {len(pts)} pts = {bw:.4f} "
          f"(vs med GT joint spacing {np.median(nn_d):.4f})")

    w = np.concatenate([a_n[sel], a_n[sel]])
    moved = np.asarray(meanshift_cluster(jnp.asarray(pts, jnp.float32), bw,
                                         jnp.asarray(w, jnp.float32), num_iter=30))
    # rough unique-mode count pre-NMS at several merge radii
    for r in (bw, 0.5 * bw, 0.25 * bw):
        used = np.zeros(len(moved), bool)
        k = 0
        for i in range(len(moved)):
            if used[i]:
                continue
            used |= np.linalg.norm(moved - moved[i], axis=-1) < r
            k += 1
        print(f"pre-NMS distinct modes at radius {r:.4f}: {k}")

    for dens in (0.05, 0.02, 0.01):
        modes, d = nms_modes(moved, w, bw, dens, 0.7, return_density=True)
        fm, _, _ = flip_joints(modes, extra=d)
        print(f"NMS thrd_density={dens}: {len(modes)} modes -> {len(fm)} after flip")
    # bandwidth sweep at the reference density
    for scale in (1.0, 0.7, 0.5, 0.35):
        bws = bw * scale
        moved2 = np.asarray(meanshift_cluster(jnp.asarray(pts, jnp.float32), bws,
                                              jnp.asarray(w, jnp.float32), num_iter=30))
        modes, d = nms_modes(moved2, w, bws, 0.02, 0.7, return_density=True)
        fm, _, _ = flip_joints(modes, extra=d)
        print(f"bandwidth x{scale} ({bws:.4f}): {len(modes)} modes -> "
              f"{len(fm)} after flip")


if __name__ == "__main__":
    main()
