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

from morig_tpu.core.batch import PoseSample
from morig_tpu.core.config import Config, DEFAULT_CONFIG
from morig_tpu.losses.basic import bce_with_logits, masked_l1
from morig_tpu.losses.nce import info_nce
from morig_tpu.nn.corrnet import CorrNet
from morig_tpu.nn.deformnet import DeformNet
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
        """Forward pass for evaluation dumps (train_corr_pose.py:110-130)."""
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.mesh, batch.points, False, train_vismask, None,
        )


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
                state = state.apply_gradients(grads, upd["batch_stats"])
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
        rig stage, train_deform_pose.py:116-127)."""
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.mesh, batch.points, False, None,
        )
