"""Joint-extraction hyperparameter sweep on the trained campaign checkpoints.

The round-3/4 campaigns show the clustering stage (not the nets) limits joint
IoU: v3 over-predicts on creature 200 (27 pred vs 22 GT, P=0.48) with the
reference defaults (bandwidth q=0.04, keep 0.1, density 0.02, NMS-attn 0.7 —
eval_rigging.py:80-95, cluster_utils.py:39-63).  This tool tunes those four
thresholds on the campaign's VALIDATION creatures and reports the chosen
config on the held-out TEST creatures, reusing the trained jointnet/masknet
checkpoints (no retraining).

  python tools/sweep_joint_params.py --dir campaign_v3 --dump   # infer once
  python tools/sweep_joint_params.py --dir campaign_v3          # sweep

The dump phase stores, per creature: shifted points (valid verts only), raw
attention, and the inside-voxel mask — everything upstream of the swept
thresholds.  The sweep phase is host/CPU numpy + small jitted mean-shift
programs; one mean-shift per (quantile, keep) pair is shared across all
(density, attn_nms) combos.
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VAL_SEEDS = [100, 101, 102]
TEST_SEEDS = [200, 201, 202, 203, 204]


def dump(args):
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from morig_tpu.core.compile_cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from morig_tpu.data.creature import creature_rig_dataset, make_creature
    from morig_tpu.geometry.voxel import inside_check_np, voxelize_mesh
    from morig_tpu.train import checkpoint as ckpt
    from morig_tpu.train.stages import RigStage

    z = np.load(os.path.join(args.dir, "pred_flows.npz"))
    out = {}
    for split, seeds, key in (("val", VAL_SEEDS, "val"), ("te", TEST_SEEDS, "te")):
        flows = [z[f"{key}{i}"] for i in range(len(seeds))]
        ds = creature_rig_dataset(num_models=len(seeds), seed=seeds[0],
                                  num_points=args.points,
                                  target_verts=args.target_verts,
                                  pred_flows=flows)
        joint = RigStage(arch="jointnet",
                         num_embed_sample=min(512, ds.pad_verts))
        mask = RigStage(arch="masknet",
                        num_embed_sample=min(512, ds.pad_verts))
        b = ds.batch(list(range(len(seeds))))
        jst = joint.init_state(jax.random.key(0), b)
        mst = mask.init_state(jax.random.key(0), b)
        jst, _ = ckpt.load_checkpoint(
            jst, os.path.join(args.dir, "joints", "model_best.msgpack"))
        mst, _ = ckpt.load_checkpoint(
            mst, os.path.join(args.dir, "mask", "model_best.msgpack"))
        _, _, disp = joint.infer(jst, b.pred_flow, b.mesh)
        _, _, attn_logit = mask.infer(mst, b.pred_flow, b.mesh)
        disp = np.asarray(disp)
        attn = np.asarray(jax.nn.sigmoid(attn_logit[..., 0]))
        for i, s in enumerate(seeds):
            vm = np.asarray(b.mesh.vert_mask[i])
            verts = np.asarray(b.mesh.verts[i])[vm]
            shifted = verts + np.tanh(disp[i])[vm]
            c = make_creature(s, target_verts=args.target_verts)
            vox = voxelize_mesh(c.verts, c.faces)
            inside = np.asarray(inside_check_np(shifted, vox), bool)
            gt = ds.models[i].rig
            out[f"{split}{s}_shifted"] = shifted.astype(np.float32)
            out[f"{split}{s}_attn"] = attn[i][vm].astype(np.float32)
            out[f"{split}{s}_inside"] = inside
            out[f"{split}{s}_gtpos"] = gt.pos.astype(np.float32)
            print(f"[dump] {split} creature{s}: {vm.sum()} verts, "
                  f"{inside.sum()} inside, {gt.num_joints} GT joints")
    np.savez_compressed(os.path.join(args.dir, "joint_sweep_inputs.npz"), **out)
    print(f"[dump] wrote {args.dir}/joint_sweep_inputs.npz")


def _feature_sizes(gt_pos):
    import numpy as np

    dj = np.linalg.norm(gt_pos[:, None] - gt_pos[None], axis=-1)
    np.fill_diagonal(dj, np.inf)
    return np.clip(0.5 * dj.min(1), 0.03, 0.10)


def sweep(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from morig_tpu.eval.metrics import joint_match_metrics
    from morig_tpu.geometry.clustering import (
        estimate_bandwidth, flip_joints, meanshift_cluster, nms_modes,
        symmetrize_reflect,
    )

    z = np.load(os.path.join(args.dir, "joint_sweep_inputs.npz"))

    quantiles = [float(x) for x in args.quantiles.split(",")]
    keeps = [float(x) for x in args.keeps.split(",")]
    densities = [float(x) for x in args.densities.split(",")]
    attn_nms = [float(x) for x in args.attn_nms.split(",")]

    def creature(split, s):
        return (z[f"{split}{s}_shifted"], z[f"{split}{s}_attn"],
                z[f"{split}{s}_inside"], z[f"{split}{s}_gtpos"])

    def eval_creature(shifted, attn_raw, inside, gt_pos, results):
        """Fill results[(q, keep, dens, anms)] with this creature's metrics."""
        spread = attn_raw.max() - attn_raw.min()
        attn = ((attn_raw - attn_raw.min()) / spread
                if spread > 1e-10 else attn_raw.astype(np.float64))
        fs = _feature_sizes(gt_pos)
        for q, keep in itertools.product(quantiles, keeps):
            sel = inside & (attn > keep)
            pts, a = shifted[sel], attn[sel]
            if len(pts) < 2:
                for dens, anms in itertools.product(densities, attn_nms):
                    results.setdefault((q, keep, dens, anms), []).append(
                        dict(joint_IoU=0.0, joint_precision=0.0,
                             joint_recall=0.0, chamfer_j2j=np.inf, n_pred=0))
                continue
            pts, a = symmetrize_reflect(pts.astype(np.float32), a)
            bw = float(estimate_bandwidth(jnp.asarray(pts), quantile=q))
            moved = np.asarray(meanshift_cluster(
                jnp.asarray(pts), jnp.asarray(bw), jnp.asarray(a),
                num_iter=30))
            for dens, anms in itertools.product(densities, attn_nms):
                modes = nms_modes(moved, a, bw, dens, anms)
                modes, _ = flip_joints(modes)
                if len(modes) == 0:
                    m = dict(joint_IoU=0.0, joint_precision=0.0,
                             joint_recall=0.0, chamfer_j2j=np.inf)
                else:
                    m = joint_match_metrics(modes, gt_pos, fs)
                m = dict(m, n_pred=len(modes))
                results.setdefault((q, keep, dens, anms), []).append(m)

    val_results: dict = {}
    for s in VAL_SEEDS:
        eval_creature(*creature("val", s), val_results)
        print(f"[sweep] val creature{s} done")

    def agg(ms):
        return dict(
            mean_iou=float(np.mean([m["joint_IoU"] for m in ms])),
            min_iou=float(np.min([m["joint_IoU"] for m in ms])),
            mean_recall=float(np.mean([m["joint_recall"] for m in ms])),
            mean_precision=float(np.mean([m["joint_precision"] for m in ms])),
            mean_cd=float(np.mean([m["chamfer_j2j"] for m in ms])),
        )

    ranked = sorted(val_results.items(),
                    key=lambda kv: (-agg(kv[1])["mean_iou"],
                                    -agg(kv[1])["min_iou"]))
    print("\n[sweep] top-10 on validation (q, keep, density, attn_nms):")
    for cfg, ms in ranked[:10]:
        a = agg(ms)
        print(f"  q={cfg[0]:.3f} keep={cfg[1]:.2f} dens={cfg[2]:.3f} "
              f"anms={cfg[3]:.2f}: IoU={a['mean_iou']:.3f} "
              f"min={a['min_iou']:.3f} P={a['mean_precision']:.3f} "
              f"R={a['mean_recall']:.3f} CD={a['mean_cd']:.4f}")
    default_key = (0.04, 0.1, 0.02, 0.7)
    if default_key in val_results:
        a = agg(val_results[default_key])
        print(f"  [reference defaults] IoU={a['mean_iou']:.3f} "
              f"min={a['min_iou']:.3f}")

    best = ranked[0][0]
    print(f"\n[sweep] best on val: q={best[0]} keep={best[1]} "
          f"dens={best[2]} anms={best[3]}")

    # held-out evaluation at the chosen config AND the defaults
    for name, cfg in (("default", default_key), ("tuned", best)):
        q, keep, dens, anms = cfg
        test_results: dict = {}
        per = []
        for s in TEST_SEEDS:
            shifted, attn_raw, inside, gt_pos = creature("te", s)
            r: dict = {}
            # reuse eval_creature with single-point grids
            save = (args.quantiles, args.keeps, args.densities, args.attn_nms)
            one = {}
            spread = attn_raw.max() - attn_raw.min()
            attn = ((attn_raw - attn_raw.min()) / spread
                    if spread > 1e-10 else attn_raw.astype(np.float64))
            sel = inside & (attn > keep)
            pts, a = shifted[sel], attn[sel]
            pts, a = symmetrize_reflect(pts.astype(np.float32), a)
            bw = float(estimate_bandwidth(jnp.asarray(pts), quantile=q))
            moved = np.asarray(meanshift_cluster(
                jnp.asarray(pts), jnp.asarray(bw), jnp.asarray(a), num_iter=30))
            modes = nms_modes(moved, a, bw, dens, anms)
            modes, _ = flip_joints(modes)
            m = joint_match_metrics(modes, gt_pos, _feature_sizes(gt_pos))
            per.append(dict(seed=s, n_pred=len(modes), n_gt=len(gt_pos), **m))
        a = agg([dict(p) for p in per])
        print(f"\n[sweep] held-out @ {name} "
              f"(q={q} keep={keep} dens={dens} anms={anms}):")
        for p in per:
            print(f"  creature{p['seed']}: J={p['n_pred']}/{p['n_gt']} "
                  f"IoU={p['joint_IoU']:.3f} P={p['joint_precision']:.3f} "
                  f"R={p['joint_recall']:.3f} CD={p['chamfer_j2j']:.4f}")
        print(f"  mean IoU={a['mean_iou']:.3f} min={a['min_iou']:.3f} "
              f"P={a['mean_precision']:.3f} R={a['mean_recall']:.3f} "
              f"CD={a['mean_cd']:.4f}")
        if name == "tuned":
            with open(os.path.join(args.dir, "joint_sweep_result.json"), "w") as f:
                json.dump(dict(best=dict(bandwidth_quantile=q,
                                         attn_threshold=keep,
                                         density_threshold=dens,
                                         attn_nms_threshold=anms),
                               heldout=per, heldout_agg=a), f, indent=1)
            print(f"[sweep] wrote {args.dir}/joint_sweep_result.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="campaign_v3")
    ap.add_argument("--dump", action="store_true")
    ap.add_argument("--platform", default="cpu",
                    help="platform for the dump inference ('' = default)")
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--target-verts", type=int, default=1900)
    ap.add_argument("--quantiles", default="0.03,0.04,0.05,0.06")
    ap.add_argument("--keeps", default="0.1,0.2,0.3")
    ap.add_argument("--densities", default="0.02,0.035,0.05")
    ap.add_argument("--attn-nms", default="0.7,0.85,1.01")
    args = ap.parse_args()
    if args.dump:
        dump(args)
    else:
        sweep(args)


if __name__ == "__main__":
    main()
