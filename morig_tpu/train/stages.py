"""Training stages: model + loss + jitted train/eval steps per pipeline stage.

Each stage class bundles what one reference training script wires up ad-hoc
(SURVEY.md §2.11): the model, its loss composition, and the step functions.
Stages are consumed by train.trainer.run_epochs and by the CLI.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from morig_tpu.core.batch import PoseSample, RigSample
from morig_tpu.core.config import Config, DEFAULT_CONFIG
from morig_tpu.losses.basic import (
    batched_chamfer_with_average,
    bce_with_logits,
    chamfer_directional,
    cross_entropy_with_probs,
    masked_l1,
    masked_l1_weighted,
)
from morig_tpu.kernels.neighbors import pairwise_sqdist
from morig_tpu.losses.nce import info_nce, multi_pos_info_nce
from morig_tpu.nn.corrnet import CorrNet
from morig_tpu.nn.deformnet import DeformNet
from morig_tpu.nn.rignet import JointNetMotion, MaskNetMotion, SkinMotion
from morig_tpu.train import trainer


class CorrPoseStage:
    """CorrNet training on pose pairs: infoNCE + 5×BCE(vismask), with the
    visibility branch enabled from `vis_branch_start_epoch` on
    (train_corr_pose.py:61-69, 224-226)."""

    def __init__(self, cfg: Config = DEFAULT_CONFIG, axis_name: Optional[str] = None):
        self.cfg = cfg
        self.model = CorrNet(
            output_feature=cfg.model.corr_output_feature,
            tau_init=cfg.model.tau_nce,
            axis_name=axis_name,
        )
        self.train_vismask = False
        self.vis_branch_start_epoch = cfg.train.vis_branch_start_epoch
        self._steps: dict = {}

    def on_epoch(self, epoch: int):
        if epoch >= self.vis_branch_start_epoch:
            self.train_vismask = True

    def make_tx(self, steps_per_epoch: int = 1):
        t = self.cfg.train
        return trainer.multistep_adam(t.lr, t.schedule, t.gamma, t.weight_decay, steps_per_epoch)

    def init_state(self, rng: jax.Array, sample: PoseSample, tx=None) -> trainer.TrainState:
        tx = tx or self.make_tx()
        return trainer.create_state(
            self.model, rng, (sample.mesh, sample.points),
            tx, init_kwargs=dict(train=True, train_vismask=True),
        )

    def _losses(self, outputs, batch: PoseSample, train_vismask: bool):
        vtx_f, pts_f, vis_logits, tau = outputs
        loss_match = info_nce(
            vtx_f, pts_f,
            batch.corr.v2p, batch.corr.v2p_mask,
            batch.corr.p2v, batch.corr.p2v_mask,
            batch.mesh.vert_mask, batch.points.pts_mask, tau,
        )
        if train_vismask:
            loss_mask = bce_with_logits(
                vis_logits[..., 0], batch.vismask, batch.mesh.vert_mask
            )
        else:
            loss_mask = jnp.zeros(())
        total = loss_match + 5.0 * loss_mask
        return total, dict(corr_loss=loss_match, vis_loss=loss_mask, total_loss=total)

    def _get_step(self, kind: str, train_vismask: bool):
        key = (kind, train_vismask)
        if key in self._steps:
            return self._steps[key]

        if kind == "train":
            def step(state, batch, rng):
                def loss_fn(params):
                    outputs, upd = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch.mesh, batch.points, True, train_vismask, rng,
                        mutable=["batch_stats"],
                    )
                    total, metrics = self._losses(outputs, batch, train_vismask)
                    return total, (metrics, upd)

                (_, (metrics, upd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads, upd["batch_stats"])
                return state, metrics
            fn = jax.jit(step, donate_argnums=(0,))
        else:
            def step(state, batch):
                outputs = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    batch.mesh, batch.points, False, train_vismask, None,
                )
                _, metrics = self._losses(outputs, batch, train_vismask)
                return metrics
            fn = jax.jit(step)
        self._steps[key] = fn
        return fn

    def train_step(self, state, batch: PoseSample, rng):
        return self._get_step("train", self.train_vismask)(state, batch, rng)

    def eval_step(self, state, batch: PoseSample):
        return self._get_step("eval", self.train_vismask)(state, batch)

    def infer(self, state, batch: PoseSample, train_vismask: bool = True):
        """Forward pass for evaluation dumps (train_corr_pose.py:110-130).
        Jitted: an eager flax apply costs one tunnel round trip PER OP on a
        remote backend."""
        key = ("infer", train_vismask)
        if key not in self._steps:
            self._steps[key] = jax.jit(lambda s, b, tv=train_vismask: s.apply_fn(
                {"params": s.params, "batch_stats": s.batch_stats},
                b.mesh, b.points, False, tv, None))
        return self._steps[key](state, batch)


class DeformPoseStage:
    """DeformNet training: L1 flow loss with the CorrNet extractor frozen by
    default (train_deform_pose.py:62,150-153); `train_extractor=True` also
    optimizes the extractor with infoNCE + BCE terms (train_deform_pose.py:64-70)."""

    def __init__(self, cfg: Config = DEFAULT_CONFIG, train_extractor: bool = False,
                 axis_name: Optional[str] = None):
        self.cfg = cfg
        self.train_extractor = train_extractor
        self.model = DeformNet(
            num_interp=cfg.model.num_interp, tau_init=cfg.model.tau_nce,
            output_feature=cfg.model.corr_output_feature, axis_name=axis_name,
        )
        self._steps: dict = {}

    def on_epoch(self, epoch: int):
        pass

    def make_tx(self, steps_per_epoch: int = 1):
        t = self.cfg.train
        inner = trainer.multistep_adam(t.lr, t.schedule, t.gamma, t.weight_decay, steps_per_epoch)
        if self.train_extractor:
            return inner

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "freeze"
                if any(getattr(k, "key", None) == "corr_extractor" for k in path)
                else "train",
                params,
            )

        return optax.multi_transform({"train": inner, "freeze": optax.set_to_zero()}, label_fn)

    def init_state(self, rng: jax.Array, sample: PoseSample, tx=None) -> trainer.TrainState:
        tx = tx or self.make_tx()
        return trainer.create_state(
            self.model, rng, (sample.mesh, sample.points), tx, init_kwargs=dict(train=True)
        )

    def init_extractor_from(self, state: trainer.TrainState, corr_params, corr_batch_stats):
        """Load CorrNet weights into the internal extractor
        (--init_extractor, train_deform_pose.py:149)."""
        from morig_tpu.train.checkpoint import transfer_subtree

        params = transfer_subtree(state.params, corr_params, ("corr_extractor",))
        stats = transfer_subtree(state.batch_stats, corr_batch_stats, ("corr_extractor",))
        return state.replace(params=params, batch_stats=stats)

    def _losses(self, outputs, batch: PoseSample):
        pred_flow, vtx_f, pts_f, vis, tau = outputs
        loss_flow = masked_l1(pred_flow, batch.gt_flow, batch.mesh.vert_mask)
        metrics = dict(flow_loss=loss_flow)
        total = loss_flow
        if self.train_extractor:
            loss_match = info_nce(
                vtx_f, pts_f, batch.corr.v2p, batch.corr.v2p_mask,
                batch.corr.p2v, batch.corr.p2v_mask,
                batch.mesh.vert_mask, batch.points.pts_mask, tau,
            )
            # vis here is post-sigmoid; BCE on probabilities via log loss
            eps = 1e-6
            vis_c = jnp.clip(vis, eps, 1 - eps)
            per = -(batch.vismask * jnp.log(vis_c) + (1 - batch.vismask) * jnp.log(1 - vis_c))
            m = batch.mesh.vert_mask.astype(per.dtype)
            loss_vis = jnp.sum(per * m) / jnp.maximum(m.sum(), 1.0)
            total = loss_flow + loss_match + 5.0 * loss_vis
            metrics.update(corr_loss=loss_match, vis_loss=loss_vis)
        metrics["total_loss"] = total
        return total, metrics

    def _keep_frozen_stats(self, old_stats, new_stats):
        """With the extractor frozen, its BN running stats must not drift
        either — the reference loads a frozen checkpoint whose buffers never
        change (train_deform_pose.py:150-153).  Restore the corr_extractor
        subtree of batch_stats from the pre-step state."""
        if self.train_extractor:
            return new_stats
        if "corr_extractor" not in dict(new_stats):
            return new_stats  # e.g. LayerNorm config with no BN stats
        merged = dict(new_stats)
        merged["corr_extractor"] = old_stats["corr_extractor"]
        return merged

    def _get_step(self, kind: str):
        if kind in self._steps:
            return self._steps[kind]
        if kind == "train":
            def step(state, batch, rng):
                def loss_fn(params):
                    outputs, upd = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch.mesh, batch.points, True, rng,
                        mutable=["batch_stats"],
                    )
                    total, metrics = self._losses(outputs, batch)
                    return total, (metrics, upd)

                (_, (metrics, upd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                new_stats = self._keep_frozen_stats(state.batch_stats, upd["batch_stats"])
                state = state.apply_gradients(grads, new_stats)
                return state, metrics
            fn = jax.jit(step, donate_argnums=(0,))
        else:
            def step(state, batch):
                outputs = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    batch.mesh, batch.points, False, None,
                )
                _, metrics = self._losses(outputs, batch)
                return metrics
            fn = jax.jit(step)
        self._steps[kind] = fn
        return fn

    def train_step(self, state, batch: PoseSample, rng):
        return self._get_step("train")(state, batch, rng)

    def eval_step(self, state, batch: PoseSample):
        return self._get_step("eval")(state, batch)

    def infer(self, state, batch: PoseSample):
        """Flow inference (used by tracking and by pred_flow dumps for the
        rig stage, train_deform_pose.py:116-127).  Jitted (see CorrPoseStage)."""
        if "infer" not in self._steps:
            self._steps["infer"] = jax.jit(lambda s, b: s.apply_fn(
                {"params": s.params, "batch_stats": s.batch_stats},
                b.mesh, b.points, False, None))
        return self._steps["infer"](state, batch)


class RigStage:
    """Joint/mask prediction training (train_rig.py:135-197): per-keyframe
    motion embedding losses + either chamfer-to-joints + offset L1 (jointnet)
    or mask BCE (masknet); input flow is GT or deform-predicted 50/50 during
    training, predicted at eval (train_rig.py:147-151,210)."""

    def __init__(self, cfg: Config = DEFAULT_CONFIG, arch: str = "jointnet",
                 num_embed_sample: int = 512, width_scale: float = 1.0,
                 axis_name: Optional[str] = None,
                 dense_weight: float = 0.0, dense_sigma: float = 0.07,
                 recall_weight: float = 1.0,
                 sep_weight: float = 0.0, sep_alpha: float = 0.8):
        assert arch in ("jointnet", "masknet")
        self.cfg = cfg
        self.arch = arch
        self.num_embed_sample = num_embed_sample
        # Recall-oriented jointnet loss knobs (defaults = exact reference
        # semantics, train_rig.py:176-183).  dense_weight>0 upweights the
        # offset-L1 of vertices whose nearest GT joint sits in a crowded
        # region (another joint within ~dense_sigma), attacking the merged
        # shoulder-cluster failure where averaged shifts collapse two close
        # joints into one mean-shift mode.  recall_weight>1 upweights the
        # joints->shifted-points chamfer direction so an uncovered GT joint
        # costs more than an imprecisely-placed one.
        #
        # sep_weight>0 adds a SEPARATION MARGIN hinge (campaign v5): each
        # vertex's shifted point must sit at least sep_alpha of the way
        # toward its GT joint j1 relative to j1's nearest other joint j2 —
        # relu(sep_alpha*|j1-j2| - (|y-j2| - |y-j1|)).  Where v4's
        # loss REWEIGHTING failed to move recall (it changed which vertices
        # dominate the pull, not the mode structure), this term penalizes
        # the midline landings themselves: shifted points between two close
        # joints are what bridges their mean-shift modes into one.
        self.dense_weight = dense_weight
        self.dense_sigma = dense_sigma
        self.recall_weight = recall_weight
        self.sep_weight = sep_weight
        self.sep_alpha = sep_alpha
        cls = JointNetMotion if arch == "jointnet" else MaskNetMotion
        self.model = cls(
            num_keyframes=cfg.model.num_keyframes,
            aggr_method=cfg.model.aggr_method,
            motion_dim=cfg.model.motion_dim,
            width_scale=width_scale,
            axis_name=axis_name,
        )
        self._steps: dict = {}

    def on_epoch(self, epoch: int):
        pass

    def make_tx(self, steps_per_epoch: int = 1):
        # train_rig.py defaults: lr 5e-4, milestones [40, 80], gamma 0.2
        return trainer.multistep_adam(5e-4, (40, 80), 0.2,
                                      self.cfg.train.weight_decay, steps_per_epoch)

    def init_state(self, rng, sample: RigSample, tx=None):
        tx = tx or self.make_tx()
        return trainer.create_state(
            self.model, rng, (sample.gt_flow, sample.mesh), tx,
            init_kwargs=dict(train=True),
        )

    def _embed_loss(self, rng, motion_all, motion_aggr, batch: RigSample):
        T = motion_all.shape[2]
        keys = jax.random.split(rng, T + 1)
        loss = 0.0
        for t in range(T):
            loss += multi_pos_info_nce(
                keys[t], motion_all[:, :, t, :], batch.gt_skin,
                batch.mesh.vert_mask, num_sample=self.num_embed_sample,
            )
        loss += multi_pos_info_nce(
            keys[T], motion_aggr, batch.gt_skin, batch.mesh.vert_mask,
            num_sample=self.num_embed_sample,
        )
        return loss

    def _losses(self, rng, outputs, batch: RigSample):
        motion_all, motion_aggr, pred = outputs
        loss_embed = self._embed_loss(rng, motion_all, motion_aggr, batch)
        if self.arch == "jointnet":
            disp = jnp.tanh(pred)
            y_pred = disp + batch.mesh.verts
            if self.recall_weight != 1.0:
                m_prec, m_cov = jax.vmap(chamfer_directional)(
                    y_pred, batch.joints, batch.mesh.vert_mask, batch.joints_mask
                )
                # normalized so recall_weight=1 reproduces chamfer_with_average
                w = self.recall_weight
                loss_chamfer = jnp.mean((m_prec + w * m_cov) / (1.0 + w))
            else:
                loss_chamfer = batched_chamfer_with_average(
                    y_pred, batch.joints, batch.mesh.vert_mask, batch.joints_mask
                )
            if self.dense_weight > 0.0:
                # per-GT-joint isolation: distance to its nearest other joint
                def crowding(joints, jmask, offsets, verts):
                    d = jnp.sqrt(jnp.maximum(
                        pairwise_sqdist(joints, joints), 1e-12))
                    big = 1e6
                    d = jnp.where(jmask[None, :] & jmask[:, None], d, big)
                    d = jnp.where(jnp.eye(d.shape[0], dtype=bool), big, d)
                    iso = jnp.min(d, axis=1)                       # (J,)
                    tgt = verts + offsets                          # (V, 3) nearest joint
                    dvj = pairwise_sqdist(tgt, joints)
                    dvj = jnp.where(jmask[None, :], dvj, big)
                    nearest = jnp.argmin(dvj, axis=1)              # (V,)
                    return iso[nearest]                            # (V,)

                iso_v = jax.vmap(crowding)(
                    batch.joints, batch.joints_mask, batch.offsets,
                    batch.mesh.verts)
                wts = 1.0 + self.dense_weight * jnp.exp(
                    -iso_v / self.dense_sigma)
                loss_l1 = masked_l1_weighted(
                    disp, batch.offsets, batch.mesh.vert_mask, wts)
            else:
                loss_l1 = masked_l1(disp, batch.offsets, batch.mesh.vert_mask)
            total = 0.1 * loss_embed + loss_chamfer + loss_l1
            metrics = dict(loss_chamfer=loss_chamfer, loss_l1=loss_l1,
                           loss_motion=0.1 * loss_embed)
            if self.sep_weight > 0.0:
                alpha = self.sep_alpha

                def sep_one(y, vmask, joints, jmask, offsets, verts):
                    j1 = verts + offsets                       # (V,3) GT joint
                    big = 1e6
                    d = jnp.sqrt(jnp.maximum(
                        pairwise_sqdist(j1, joints), 1e-12))   # (V,J)
                    d = jnp.where(jmask[None, :], d, big)
                    # smallest is j1 itself (~0); the partner is the nearest
                    # OTHER joint: mask a tight ball around j1 and re-min
                    spacing = jnp.min(jnp.where(d < 1e-4, big, d), axis=1)
                    j2_idx = jnp.argmin(jnp.where(d < 1e-4, big, d), axis=1)
                    j2 = joints[j2_idx]                        # (V,3)
                    d1 = jnp.linalg.norm(y - j1, axis=-1)
                    d2 = jnp.linalg.norm(y - j2, axis=-1)
                    # hinge only binds where a real partner exists
                    ok = vmask & (spacing < big / 2)
                    h = jnp.maximum(alpha * spacing - (d2 - d1), 0.0)
                    return jnp.sum(h * ok) / jnp.maximum(jnp.sum(ok), 1.0)

                loss_sep = jnp.mean(jax.vmap(sep_one)(
                    y_pred, batch.mesh.vert_mask, batch.joints,
                    batch.joints_mask, batch.offsets, batch.mesh.verts))
                total = total + self.sep_weight * loss_sep
                metrics["loss_sep"] = self.sep_weight * loss_sep
            metrics["total_loss"] = total
            return total, metrics
        loss_bce = bce_with_logits(pred[..., 0], batch.attn_mask, batch.mesh.vert_mask)
        total = 0.1 * loss_embed + loss_bce
        return total, dict(loss_bce=loss_bce, loss_motion=0.1 * loss_embed,
                           total_loss=total)

    def _get_step(self, kind: str):
        if kind in self._steps:
            return self._steps[kind]
        if kind == "train":
            def step(state, batch, rng):
                k_flow, k_embed = jax.random.split(rng)
                use_gt = jax.random.uniform(k_flow) > 0.5
                input_flow = jnp.where(use_gt, batch.gt_flow, batch.pred_flow)

                def loss_fn(params):
                    outputs, upd = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        input_flow, batch.mesh, True, mutable=["batch_stats"],
                    )
                    total, metrics = self._losses(k_embed, outputs, batch)
                    return total, (metrics, upd)

                (_, (metrics, upd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads, upd["batch_stats"])
                return state, metrics
            fn = jax.jit(step, donate_argnums=(0,))
        else:
            def step(state, batch, rng):
                outputs = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    batch.pred_flow, batch.mesh, False,
                )
                _, metrics = self._losses(rng, outputs, batch)
                return metrics
            fn = jax.jit(step)
        self._steps[kind] = fn
        return fn

    def train_step(self, state, batch: RigSample, rng):
        return self._get_step("train")(state, batch, rng)

    def eval_step(self, state, batch: RigSample, rng=None):
        rng = rng if rng is not None else jax.random.key(0)
        return self._get_step("eval")(state, batch, rng)

    def infer(self, state, input_flow, mesh):
        """Returns (motion_all, motion_aggr, prediction).  For jointnet the
        shifted points are verts + tanh(pred) (train_rig.py:224-225); for
        masknet apply sigmoid to get attention.  Jitted (see CorrPoseStage)."""
        if "infer" not in self._steps:
            self._steps["infer"] = jax.jit(lambda s, f, m: s.apply_fn(
                {"params": s.params, "batch_stats": s.batch_stats}, f, m, False))
        return self._steps["infer"](state, input_flow, mesh)


class SkinStage:
    """Skinning training (train_skin.py:142-182): soft-CE over the K nearest
    bones with per-slot and per-vertex validity masking + motion embedding
    losses; GT/pred flow 50/50 in training."""

    def __init__(self, cfg: Config = DEFAULT_CONFIG, num_embed_sample: int = 512,
                 width_scale: float = 1.0, axis_name: Optional[str] = None):
        self.cfg = cfg
        self.num_embed_sample = num_embed_sample
        self.model = SkinMotion(
            nearest_bone=cfg.model.nearest_bone,
            use_Dg=cfg.model.use_Dg, use_Lf=cfg.model.use_Lf,
            num_keyframes=cfg.model.num_keyframes,
            motion_dim=cfg.model.motion_dim,
            width_scale=width_scale,
            axis_name=axis_name,
        )
        self._steps: dict = {}

    def on_epoch(self, epoch: int):
        pass

    def make_tx(self, steps_per_epoch: int = 1):
        return trainer.multistep_adam(5e-4, (40, 80), 0.2,
                                      self.cfg.train.weight_decay, steps_per_epoch)

    def init_state(self, rng, sample: RigSample, tx=None):
        tx = tx or self.make_tx()
        return trainer.create_state(
            self.model, rng, (sample.skin_input, sample.gt_flow, sample.mesh), tx,
            init_kwargs=dict(train=True),
        )

    def _losses(self, rng, outputs, batch: RigSample):
        motion_all, motion_aggr, logits = outputs
        T = motion_all.shape[2]
        keys = jax.random.split(rng, T + 1)
        loss_embed = 0.0
        for t in range(T):
            loss_embed += multi_pos_info_nce(
                keys[t], motion_all[:, :, t, :], batch.gt_skin,
                batch.mesh.vert_mask, num_sample=self.num_embed_sample,
            )
        loss_embed += multi_pos_info_nce(
            keys[T], motion_aggr, batch.gt_skin, batch.mesh.vert_mask,
            num_sample=self.num_embed_sample,
        )
        K = logits.shape[-1]
        skin_gt = batch.skin_label[..., :K] * batch.loss_mask[..., :K]
        skin_gt = skin_gt / (jnp.sum(jnp.abs(skin_gt), axis=-1, keepdims=True) + 1e-8)
        vert_ok = (jnp.abs(skin_gt.sum(-1) - 1.0) < 1e-6).astype(jnp.float32)
        vert_ok = vert_ok * batch.mesh.vert_mask
        per = cross_entropy_with_probs(logits, skin_gt)
        w = batch.loss_mask[..., :K] * vert_ok[..., None]
        loss_skin = jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
        total = loss_skin + 0.01 * loss_embed
        return total, dict(loss_skin=loss_skin, loss_motion=0.01 * loss_embed,
                           total_loss=total)

    def _get_step(self, kind: str):
        if kind in self._steps:
            return self._steps[kind]
        if kind == "train":
            def step(state, batch, rng):
                k_flow, k_embed = jax.random.split(rng)
                use_gt = jax.random.uniform(k_flow) > 0.5
                input_flow = jnp.where(use_gt, batch.gt_flow, batch.pred_flow)

                def loss_fn(params):
                    outputs, upd = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch.skin_input, input_flow, batch.mesh, True,
                        mutable=["batch_stats"],
                    )
                    total, metrics = self._losses(k_embed, outputs, batch)
                    return total, (metrics, upd)

                (_, (metrics, upd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads, upd["batch_stats"])
                return state, metrics
            fn = jax.jit(step, donate_argnums=(0,))
        else:
            def step(state, batch, rng):
                outputs = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    batch.skin_input, batch.pred_flow, batch.mesh, False,
                )
                _, metrics = self._losses(rng, outputs, batch)
                return metrics
            fn = jax.jit(step)
        self._steps[kind] = fn
        return fn

    def train_step(self, state, batch: RigSample, rng):
        return self._get_step("train")(state, batch, rng)

    def eval_step(self, state, batch: RigSample, rng=None):
        rng = rng if rng is not None else jax.random.key(0)
        return self._get_step("eval")(state, batch, rng)

    def infer(self, state, skin_input, input_flow, mesh):
        if "infer" not in self._steps:
            self._steps["infer"] = jax.jit(lambda s, si, f, m: s.apply_fn(
                {"params": s.params, "batch_stats": s.batch_stats},
                si, f, m, False))
        return self._steps["infer"](state, skin_input, input_flow, mesh)


class BoneStage:
    """BoneNet (pairwise connectivity) training — absent from the reference,
    reconstructed per the RigNet recipe (SURVEY.md §2.5): BCE over candidate
    pair logits with random pair-order permutation (bonenet.py:114-118)."""

    def __init__(self, cfg: Config = DEFAULT_CONFIG, axis_name: Optional[str] = None):
        from morig_tpu.nn.bonenet import BoneNet

        self.cfg = cfg
        self.model = BoneNet(axis_name=axis_name)
        self._steps: dict = {}

    def on_epoch(self, epoch: int):
        pass

    def make_tx(self, steps_per_epoch: int = 1):
        return trainer.multistep_adam(1e-3, (50,), 0.1, self.cfg.train.weight_decay,
                                      steps_per_epoch)

    def init_state(self, rng, sample, tx=None):
        tx = tx or self.make_tx()
        return trainer.create_state(
            self.model, rng,
            (sample.mesh, sample.joints, sample.joints_mask, sample.pairs, sample.pair_attr),
            tx, init_kwargs=dict(train=True, rng=rng),
        )

    def _get_step(self, kind: str):
        if kind in self._steps:
            return self._steps[kind]
        if kind == "train":
            def step(state, batch, rng):
                k_perm, k_drop = jax.random.split(rng)

                def loss_fn(params):
                    logits, upd = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch.mesh, batch.joints, batch.joints_mask,
                        batch.pairs, batch.pair_attr, True, True, k_perm,
                        mutable=["batch_stats"], rngs={"dropout": k_drop},
                    )
                    loss = bce_with_logits(logits[..., 0], batch.pair_label, batch.pair_mask)
                    return loss, (dict(total_loss=loss), upd)

                (_, (metrics, upd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads, upd["batch_stats"])
                return state, metrics
            fn = jax.jit(step, donate_argnums=(0,))
        else:
            def step(state, batch):
                logits = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    batch.mesh, batch.joints, batch.joints_mask,
                    batch.pairs, batch.pair_attr, False,
                )
                loss = bce_with_logits(logits[..., 0], batch.pair_label, batch.pair_mask)
                return dict(total_loss=loss)
            fn = jax.jit(step)
        self._steps[kind] = fn
        return fn

    def train_step(self, state, batch, rng):
        return self._get_step("train")(state, batch, rng)

    def eval_step(self, state, batch):
        return self._get_step("eval")(state, batch)

    def infer(self, state, batch):
        """Connectivity logits for skeleton assembly (joint2rig.py:210-216).
        Jitted (see CorrPoseStage)."""
        if "infer" not in self._steps:
            self._steps["infer"] = jax.jit(lambda s, b: s.apply_fn(
                {"params": s.params, "batch_stats": s.batch_stats},
                b.mesh, b.joints, b.joints_mask, b.pairs, b.pair_attr, False))
        return self._steps["infer"](state, batch)


class RootStage:
    """RootNet training — RigNet-style softmax CE over joints with the GT root
    as the class label (SURVEY.md §2.5; shuffling semantics of
    rootnet.py:74-84 are realized by CE over all candidates)."""

    def __init__(self, cfg: Config = DEFAULT_CONFIG, axis_name: Optional[str] = None):
        from morig_tpu.nn.bonenet import RootNet

        self.cfg = cfg
        self.model = RootNet(axis_name=axis_name)
        self._steps: dict = {}

    def on_epoch(self, epoch: int):
        pass

    def make_tx(self, steps_per_epoch: int = 1):
        return trainer.multistep_adam(1e-3, (50,), 0.1, self.cfg.train.weight_decay,
                                      steps_per_epoch)

    def init_state(self, rng, sample, tx=None):
        tx = tx or self.make_tx()
        return trainer.create_state(
            self.model, rng, (sample.mesh, sample.joints, sample.joints_mask),
            tx, init_kwargs=dict(train=True),
        )

    def _loss(self, logits, batch):
        z = jnp.where(batch.joints_mask, logits[..., 0], -1e30)
        logz = jax.nn.logsumexp(z, axis=-1)
        picked = jnp.take_along_axis(z, batch.root_idx[:, None], axis=1)[:, 0]
        loss = jnp.mean(logz - picked)
        acc = jnp.mean((jnp.argmax(z, axis=-1) == batch.root_idx).astype(jnp.float32))
        return loss, dict(total_loss=loss, root_acc=acc)

    def _get_step(self, kind: str):
        if kind in self._steps:
            return self._steps[kind]
        if kind == "train":
            def step(state, batch, rng):
                def loss_fn(params):
                    logits, upd = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch.mesh, batch.joints, batch.joints_mask, True,
                        mutable=["batch_stats"],
                    )
                    loss, metrics = self._loss(logits, batch)
                    return loss, (metrics, upd)

                (_, (metrics, upd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                state = state.apply_gradients(grads, upd["batch_stats"])
                return state, metrics
            fn = jax.jit(step, donate_argnums=(0,))
        else:
            def step(state, batch):
                logits = state.apply_fn(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    batch.mesh, batch.joints, batch.joints_mask, False,
                )
                _, metrics = self._loss(logits, batch)
                return metrics
            fn = jax.jit(step)
        self._steps[kind] = fn
        return fn

    def train_step(self, state, batch, rng):
        return self._get_step("train")(state, batch, rng)

    def eval_step(self, state, batch):
        return self._get_step("eval")(state, batch)

    def infer(self, state, batch):
        """Per-joint root logits (getInitId, joint2rig.py:27-38).  Jitted
        (see CorrPoseStage)."""
        if "infer" not in self._steps:
            self._steps["infer"] = jax.jit(lambda s, b: s.apply_fn(
                {"params": s.params, "batch_stats": s.batch_stats},
                b.mesh, b.joints, b.joints_mask, False))
        return self._steps["infer"](state, batch)
