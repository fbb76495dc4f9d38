"""Resumed stages must report the *global* best epoch in done.json.

Regression for the campaign_v3 `mask/done.json best_epoch:-1` artifact: a
crash-resume whose resumed segment never improves on the pre-crash best used
to report best_epoch=-1 (the resume loop reset the tracker); the fix threads
`init_best_epoch` from the model_best sidecar through tools/campaign.py ->
run_epochs / run_epochs_scanned."""
import dataclasses as dc
import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from morig_tpu.core.config import Config
from morig_tpu.data.pose import capsule_pose_dataset
from morig_tpu.train.stages import CorrPoseStage

slow = pytest.mark.slow


def _stage(lr):
    cfg = Config()
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, lr=lr))
    return CorrPoseStage(cfg)


@slow
def test_resume_reports_global_best_epoch(tmp_path):
    from campaign import train_stage

    ds = capsule_pose_dataset(num_models=2, num_points=64, n_lat=7, n_lon=6)

    def batch_fn(rng, train=True):
        return ds.epoch_batches(rng, 2, "modelsresource", False, train=train)

    out = str(tmp_path)
    # phase 1: 2 epochs at a real lr -> checkpoint + model_best + done.json
    train_stage(_stage(1e-3), "stagex", out, batch_fn, epochs=2)
    d = os.path.join(out, "stagex")
    done1 = json.load(open(os.path.join(d, "done.json")))
    assert done1["best_epoch"] != -1
    # simulate crash-before-done: drop done.json, resume 2 more epochs at
    # lr=0 so val never beats the pre-crash best
    os.remove(os.path.join(d, "done.json"))
    train_stage(_stage(0.0), "stagex", out, batch_fn, epochs=4)
    done2 = json.load(open(os.path.join(d, "done.json")))
    assert done2["best_epoch"] == done1["best_epoch"]
