"""Generic training machinery: optimizer, state, loops, metric logging.

One trainer serves all six stages of the reference's CLI (SURVEY.md §2.11):
the per-script boilerplate (argparse -> model factory -> Adam + MultiStepLR ->
epoch loop -> best-on-val checkpoint, e.g. train_corr_pose.py:138-248) becomes
a Stage object plus this module.  Optimizer matches the reference recipe:
Adam with L2-coupled weight decay (torch Adam semantics, not AdamW) and a
piecewise-constant multi-step LR schedule.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import core as flax_core
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
        )


def multistep_adam(
    lr: float,
    milestones: Sequence[int],
    gamma: float,
    weight_decay: float,
    steps_per_epoch: int = 1,
    clip_norm: Optional[float] = 10.0,
) -> optax.GradientTransformation:
    """Adam + MultiStepLR + L2 decay (train_corr_pose.py:154,221).

    Global-norm clipping is an addition over the reference recipe: motion
    inputs with near-constant neighbor differences drive the first BN layers
    into tiny-variance regimes whose backward pass explodes (observed ~1e6
    grad norms at init on low-motion data); clipping at 10 leaves healthy
    steps untouched and keeps the first epochs stable.
    """
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    schedule = optax.piecewise_constant_schedule(lr, boundaries)
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts += [optax.add_decayed_weights(weight_decay), optax.adam(schedule)]
    return optax.chain(*parts)


def create_state(model, rng: jax.Array, example_inputs: tuple, tx, init_kwargs=None) -> TrainState:
    import functools

    # jit the init: eager flax init dispatches every op separately, which on
    # a remote device means hundreds of round trips (measured ~5 min for a
    # DeformNet init through a TPU tunnel vs seconds jitted)
    init_fn = jax.jit(functools.partial(model.init, **(init_kwargs or {})))
    variables = init_fn(rng, *example_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax_core.freeze({}))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


class Meter:
    """Streaming average (reference AverageMeter, utils/log_utils.py:1-22)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MetricLogger:
    """Structured JSONL metric log + stdout (replaces TensorBoard scalars,
    SURVEY.md §5.5).  One line per (epoch, split)."""

    def __init__(self, logdir: Optional[str]):
        self.logdir = logdir
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self.f = open(os.path.join(logdir, "metrics.jsonl"), "a")
        else:
            self.f = None

    def log(self, epoch: int, split: str, metrics: dict, time_s: float | None = None,
            **extra_fields):
        record = {"epoch": epoch, "split": split,
                  "time": time.time() if time_s is None else time_s,
                  **extra_fields, **metrics}
        line = " ".join(f"{split}_{k}: {v:.6f}." for k, v in metrics.items())
        print(f"Epoch{epoch}. {line}")
        if self.f:
            self.f.write(json.dumps(record) + "\n")
            self.f.flush()

    def close(self):
        if self.f:
            self.f.close()


def run_epochs(
    stage,
    state: TrainState,
    train_batches: Callable[[int], Iterable],
    val_batches: Callable[[], Iterable],
    test_batches: Optional[Callable[[], Iterable]],
    epochs: int,
    checkpoint_dir: Optional[str] = None,
    logger: Optional[MetricLogger] = None,
    start_epoch: int = 0,
    rng: Optional[jax.Array] = None,
    init_lowest: float = float("inf"),
    init_best_epoch: int = -1,
):
    """The shared epoch loop: train / val / test + best-on-val checkpointing
    (train_corr_pose.py:223-247 semantics, for every stage).  Pass
    ``start_epoch``/``init_lowest``/``init_best_epoch`` from a loaded
    checkpoint's metadata to resume a crashed run without resetting the
    best-on-val tracker (or mis-reporting best_epoch=-1 when the resumed
    segment never improves on the pre-crash best)."""
    from morig_tpu.train import checkpoint as ckpt

    logger = logger or MetricLogger(None)
    rng = rng if rng is not None else jax.random.key(0)
    lowest = init_lowest
    best_epoch = init_best_epoch
    for epoch in range(start_epoch, epochs):
        stage.on_epoch(epoch)
        meters: dict[str, Meter] = {}
        for batch in train_batches(epoch):
            rng, sub = jax.random.split(rng)
            state, metrics = stage.train_step(state, batch, sub)
            for k, v in metrics.items():
                meters.setdefault(k, Meter()).update(float(v))
        logger.log(epoch + 1, "train", {k: m.avg for k, m in meters.items()})

        val = evaluate(stage, state, val_batches())
        logger.log(epoch + 1, "val", val)
        if test_batches is not None:
            logger.log(epoch + 1, "test", evaluate(stage, state, test_batches()))

        is_best = val.get("total_loss", val.get("loss", 0.0)) < lowest
        if is_best:
            lowest = min(lowest, val.get("total_loss", val.get("loss", 0.0)))
            best_epoch = epoch
        if checkpoint_dir:
            ckpt.save_checkpoint(state, checkpoint_dir, is_best=is_best,
                                 extra={"epoch": epoch + 1, "lowest_loss": lowest})
    return state, best_epoch


def evaluate(stage, state: TrainState, batches: Iterable) -> dict:
    meters: dict[str, Meter] = {}
    for batch in batches:
        metrics = stage.eval_step(state, batch)
        for k, v in metrics.items():
            meters.setdefault(k, Meter()).update(float(v))
    return {k: m.avg for k, m in meters.items()}
