"""Render a campaign_summary.json as the docs/PARITY.md results table.

  python tools/record_campaign.py --dir campaign_v4

Prints the per-creature markdown table + mean row (eval_rigging.py:111-131
metric set) ready to paste into docs/PARITY.md "Measured results".
"""
from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="campaign_v4")
    args = ap.parse_args()

    with open(os.path.join(args.dir, "campaign_summary.json")) as f:
        s = json.load(f)

    cfg = s["config"]
    print(f"<!-- {args.dir}: {cfg['train']} train / {cfg['val']} val / "
          f"{cfg['test']} held-out creatures, epochs {cfg['epochs']}, "
          f"total {s.get('total_seconds', 0):.0f}s -->")
    print("| creature | J_pred | J_gt | joint IoU | P | R | J2J chamfer |")
    print("|---|---|---|---|---|---|---|")
    for m in s["per_model"]:
        print(f"| {m['seed']} | {m['num_pred_joints']} | {m['num_gt_joints']} "
              f"| {m['joint_IoU']:.3f} | {m['joint_precision']:.3f} "
              f"| {m['joint_recall']:.3f} | {m['chamfer_j2j']:.4f} |")
    mn = s["mean"]
    print(f"| **mean** | | | **{mn['joint_IoU']:.3f}** "
          f"| {mn['joint_precision']:.3f} | {mn['joint_recall']:.3f} "
          f"| **{mn['chamfer_j2j']:.4f}** |")
    print()
    print(f"skin L1 {mn['skin_l1']:.3f}; tracking full/vis flow error "
          f"{mn['tracking_full_flow_error']:.3f}/"
          f"{mn['tracking_vis_flow_error']:.3f}")

    tb = os.path.join(args.dir, "results", "tracking_batched.json")
    if os.path.exists(tb):
        with open(tb) as f:
            t = json.load(f)
        b = t["batched"]
        print(f"batched tracking ({b['num_meshes']} meshes x "
              f"{b['frames_per_mesh']} frames): "
              f"{b['aggregate_frames_per_sec']:.0f} frames/sec aggregate; "
              f"mean full/vis flow error {t['mean']['full_flow_error']:.3f}/"
              f"{t['mean']['vis_flow_error']:.3f}")


if __name__ == "__main__":
    main()
