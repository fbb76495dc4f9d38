"""Checkpointing: save/restore train state + cross-stage parameter surgery.

Mirrors the reference's checkpoint semantics (utils/io_utils.py:62-68):
`checkpoint.msgpack` is written every epoch, `model_best.msgpack` is a copy
when validation improves; `--resume` restores model+optimizer(+epoch).  The
cross-stage init (`--init_extractor` loading CorrNet weights into DeformNet's
corr_extractor, train_deform_pose.py:149) becomes `transfer_subtree`.

Uses flax msgpack serialization — single-file, dependency-free, and friendly
to host-side param surgery.  (Orbax is available in the image and can be
swapped in for sharded multi-host checkpoints later.)
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
from flax import serialization


def _state_dict(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(state, checkpoint_dir: str, is_best: bool = False,
                    extra: Optional[dict] = None, filename: str = "checkpoint.msgpack"):
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, filename)
    # atomic write (tmp + rename): a crash mid-write must never leave a torn
    # checkpoint behind — crash-resume depends on the last checkpoint loading
    with open(path + ".tmp", "wb") as f:
        f.write(serialization.to_bytes(_state_dict(state)))
    os.replace(path + ".tmp", path)
    if extra is not None:
        with open(path + ".json.tmp", "w") as f:
            json.dump({k: float(v) for k, v in extra.items()}, f)
        os.replace(path + ".json.tmp", path + ".json")
    if is_best:
        best = os.path.join(checkpoint_dir, "model_best.msgpack")
        shutil.copyfile(path, best + ".tmp")
        os.replace(best + ".tmp", best)
        if extra is not None:
            shutil.copyfile(path + ".json", best + ".json.tmp")
            os.replace(best + ".json.tmp", best + ".json")
    return path


def load_checkpoint(state, path: str):
    """Restore a TrainState from disk (shapes must match)."""
    with open(path, "rb") as f:
        restored = serialization.from_bytes(_state_dict(state), f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    ), meta


def load_params(template_params: Any, path: str) -> Any:
    """Restore only the param tree (for inference / surgery)."""
    with open(path, "rb") as f:
        restored = serialization.from_bytes({"params": template_params}, f.read())
    return restored["params"]


def transfer_subtree(dst_tree: Any, src_tree: Any, dst_path: tuple[str, ...]) -> Any:
    """Graft `src_tree` into `dst_tree` at nested key path `dst_path`.

    E.g. transfer_subtree(deform_params, corr_params, ("corr_extractor",))
    implements the reference's --init_extractor (train_deform_pose.py:149).
    Works on nested dicts / FrozenDicts.
    """
    dst = serialization.to_state_dict(dst_tree)
    src = serialization.to_state_dict(src_tree)

    def set_in(d, path, value):
        if len(path) == 1:
            d[path[0]] = value
        else:
            set_in(d[path[0]], path[1:], value)

    set_in(dst, list(dst_path), src)
    return serialization.from_state_dict(dst_tree, dst)
