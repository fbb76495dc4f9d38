"""The corr -> deform cross-stage handoff through the REAL CLI surface:
train CorrPoseStage briefly, save, --init-extractor-load into DeformPoseStage,
train an epoch, and assert the extractor subtree transferred bit-exactly
(cli.py cmd_train deform branch; reference train_deform_pose.py:149-153).

With the default frozen extractor, the transferred params AND batch stats
must still equal the corr checkpoint AFTER deform training."""
import os

import numpy as np
import pytest
from flax import serialization

from morig_tpu.cli import main as cli_main

pytestmark = pytest.mark.slow

FIXTURE = ["--data", "capsule", "--num-models", "1",
           "--fixture-points", "64", "--fixture-lat", "7", "--fixture-lon", "6",
           "--batch-size", "1", "--platform", "cpu"]


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_leaves(v, f"{prefix}/{k}"))
        return out
    return {prefix: np.asarray(tree)}


def test_cli_corr_to_deform_handoff(tmp_path):
    corr_ck = os.path.join(str(tmp_path), "corr")
    deform_ck = os.path.join(str(tmp_path), "deform")
    logs = os.path.join(str(tmp_path), "logs")

    cli_main(["train", "corr_pose", *FIXTURE, "--epochs", "1",
              "--checkpoint", corr_ck, "--logdir", logs + "1"])
    corr_path = os.path.join(corr_ck, "checkpoint.msgpack")
    assert os.path.exists(corr_path)

    cli_main(["train", "deform_pose", *FIXTURE, "--epochs", "1",
              "--checkpoint", deform_ck, "--logdir", logs + "2",
              "--init-extractor", corr_path])
    deform_path = os.path.join(deform_ck, "checkpoint.msgpack")
    assert os.path.exists(deform_path)

    with open(corr_path, "rb") as f:
        corr = serialization.msgpack_restore(f.read())
    with open(deform_path, "rb") as f:
        deform = serialization.msgpack_restore(f.read())

    src = _leaves(corr["params"])
    dst = _leaves(deform["params"]["corr_extractor"])
    assert set(src) == set(dst), (
        f"extractor tree mismatch: only-src={set(src)-set(dst)} "
        f"only-dst={set(dst)-set(src)}")
    for k in src:
        np.testing.assert_array_equal(src[k], dst[k]), k

    # frozen extractor: even the normalization state must not have drifted
    src_s = _leaves(corr["batch_stats"])
    dst_s = _leaves(deform["batch_stats"].get("corr_extractor", {}))
    if src_s and dst_s:
        assert set(src_s) == set(dst_s)
        for k in src_s:
            np.testing.assert_array_equal(src_s[k], dst_s[k])

    # and the trainable refiner must actually have moved
    ref = _leaves({k: v for k, v in deform["params"].items() if k != "corr_extractor"})
    assert any(np.abs(v).sum() > 0 for v in ref.values())
