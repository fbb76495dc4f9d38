"""Skeleton prediction pipeline: joints -> BoneNet/RootNet -> Prim MST -> Rig.

Re-design of evaluate/joint2rig.py:197-304 (`predict_skeleton` /
`pred_skel_func`): the nets produce a pairwise connection probability matrix
and per-joint root logits on device; cost assembly (-log p + outside-bone
penalty) and the MST run on host over the tiny J×J problem.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from morig_tpu.core import batch as B
from morig_tpu.data.skeleton_data import build_skel_sample
from morig_tpu.geometry import skeleton as sk
from morig_tpu.geometry.voxel import Voxels, segment_inside_fraction, vox_to_device


def predict_skeleton(
    mesh_entry: dict,
    joints: np.ndarray,
    root_state,
    root_stage,
    bone_state,
    bone_stage,
    vox: Optional[Voxels] = None,
    symmetric: bool = False,
) -> sk.Rig:
    """Predict a skeleton over `joints` for one mesh.

    Mirrors joint2rig.py:197-229: root = argmax RootNet; probability matrix
    from sigmoid BoneNet logits; cost = -log(p + 1e-10) with outside-bone
    penalty; Prim MST (optionally the symmetry-aware variant)."""
    import jax
    import jax.numpy as jnp

    sample = build_skel_sample([mesh_entry], [joints],
                               voxes=[vox] if vox is not None else None,
                               max_joints=max(len(joints), 2))
    J = len(joints)

    root_logits = np.array(root_stage.infer(root_state, sample))[0, :, 0]
    root_logits[~np.asarray(sample.joints_mask[0])] = -np.inf
    root_id = int(np.argmax(root_logits))

    pair_logits = np.asarray(bone_stage.infer(bone_state, sample))[0, :, 0]
    pairs = np.asarray(sample.pairs[0])
    pmask = np.asarray(sample.pair_mask[0])
    prob = np.zeros((J, J))
    pr = pairs[pmask]
    prob[pr[:, 0], pr[:, 1]] = 1.0 / (1.0 + np.exp(-pair_logits[pmask]))
    prob = prob + prob.T
    cost = -np.log(prob + 1e-10)

    if vox is not None:
        grid, tr, sc = vox_to_device(vox)

        def frac_fn(starts, ends):
            return segment_inside_fraction(
                jnp.asarray(starts, jnp.float32), jnp.asarray(ends, jnp.float32),
                grid, tr, sc,
            )

        cost = sk.increase_cost_for_outside_bone(cost, joints, frac_fn)

    if symmetric:
        parents, root_id = sk.prim_mst_symmetry(cost, root_id, joints)
    else:
        parents = sk.prim_mst(cost, root_id)
    return sk.rig_from_parents(joints, parents)
