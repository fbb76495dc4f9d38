"""Skeleton-connectivity data: candidate pair assembly for BoneNet/RootNet.

Builds the padded SkelSample batches that joint2rig.py:232-264 assembles
ad-hoc per model: all joint pairs, their [distance, inside-proportion]
attributes (inside fraction from the voxel grid, computed in one device call
for the whole pair set), GT adjacency labels and GT root.
"""
from __future__ import annotations

import itertools
from typing import Optional, Sequence

import numpy as np

from morig_tpu.core import batch as B
from morig_tpu.geometry import skeleton as sk


def pair_attrs(joints: np.ndarray, vox=None,
               frac: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """All (i<j) pairs and their [dist, inside_proportion] attributes.
    `frac` may be precomputed (batched device call across many meshes —
    pipelines/rig_predict.py) to avoid a per-mesh device round trip."""
    J = len(joints)
    pairs = np.array(list(itertools.combinations(range(J), 2)), np.int32).reshape(-1, 2)
    dist = np.linalg.norm(joints[pairs[:, 0]] - joints[pairs[:, 1]], axis=1)
    if frac is not None:
        frac = np.asarray(frac)[: len(pairs)]
    elif vox is not None:
        import jax.numpy as jnp

        from morig_tpu.geometry.voxel import segment_inside_fraction, vox_to_device

        grid, tr, sc = vox_to_device(vox)
        frac = np.asarray(segment_inside_fraction(
            jnp.asarray(joints[pairs[:, 0]], jnp.float32),
            jnp.asarray(joints[pairs[:, 1]], jnp.float32),
            grid, tr, sc,
        ))
    else:
        frac = np.ones(len(pairs))
    return pairs, np.stack([dist, frac], axis=1).astype(np.float32)


def build_skel_sample(
    mesh_entries: Sequence[dict],
    joints_list: Sequence[np.ndarray],
    rigs: Optional[Sequence[sk.Rig]] = None,
    voxes: Optional[Sequence] = None,
    max_joints: int = 48,
    pair_fracs: Optional[Sequence] = None,
    mesh_batch: Optional[B.MeshBatch] = None,
) -> B.SkelSample:
    """Assemble a padded SkelSample.  With `rigs` given, labels come from GT
    adjacency and the GT root; otherwise labels are zero (inference)."""
    import jax.numpy as jnp

    max_pairs = max_joints * (max_joints - 1) // 2
    Bn = len(mesh_entries)
    joints_a = np.zeros((Bn, max_joints, 3), np.float32)
    joints_m = np.zeros((Bn, max_joints), bool)
    pairs_a = np.zeros((Bn, max_pairs, 2), np.int32)
    pairs_m = np.zeros((Bn, max_pairs), bool)
    attr_a = np.zeros((Bn, max_pairs, 2), np.float32)
    label_a = np.zeros((Bn, max_pairs), np.float32)
    root_a = np.zeros((Bn,), np.int32)
    for i in range(Bn):
        j = np.asarray(joints_list[i], np.float32)
        J = min(len(j), max_joints)
        joints_a[i, :J] = j[:J]
        joints_m[i, :J] = True
        vox = voxes[i] if voxes is not None else None
        fr = pair_fracs[i] if pair_fracs is not None else None
        pr, at = pair_attrs(j[:J], vox, frac=fr)
        n = min(len(pr), max_pairs)
        pairs_a[i, :n] = pr[:n]
        pairs_m[i, :n] = True
        attr_a[i, :n] = at[:n]
        if rigs is not None:
            adj = rigs[i].adjacency()
            label_a[i, :n] = adj[pr[:n, 0], pr[:n, 1]]
            root_a[i] = rigs[i].root_id
    return B.SkelSample(
        mesh=mesh_batch if mesh_batch is not None else B.stack_meshes(list(mesh_entries)),
        joints=jnp.asarray(joints_a), joints_mask=jnp.asarray(joints_m),
        pairs=jnp.asarray(pairs_a), pair_mask=jnp.asarray(pairs_m),
        pair_attr=jnp.asarray(attr_a), pair_label=jnp.asarray(label_a),
        root_idx=jnp.asarray(root_a),
    )


def capsule_skel_dataset(num_models: int = 2, max_joints: int = 16, **kw):
    """SkelSample batches over synthetic capsules (GT joints + labels)."""
    from morig_tpu.data.rig import capsule_rig_dataset

    ds = capsule_rig_dataset(num_models=num_models, **kw)
    entries = ds._mesh_cache
    joints = [m.rig.pos for m in ds.models]
    rigs = [m.rig for m in ds.models]
    return build_skel_sample(entries, joints, rigs, max_joints=max_joints)
