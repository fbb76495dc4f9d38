"""Rig dataset: padded RigSample batches for joint/mask/skin training.

Replaces datasets/dataset_rig.py:11-140.  Per model it assembles: rest-pose
mesh, GT joints, vertex→nearest-joint offsets, GT attention mask, padded skin
matrix, keyframe GT flows, deform-stage predicted flows, and the K-nearest-
bone skin descriptors/labels — all in dense padded form.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from morig_tpu.core import batch as B
from morig_tpu.geometry import skeleton as sk
from morig_tpu.geometry.bones import pack_skin_descriptors, point_to_segment_dist


@dataclasses.dataclass
class RigModel:
    name: str
    verts: np.ndarray           # (V, 3) rest pose
    tpl_edges: np.ndarray
    geo_edges: np.ndarray
    rig: sk.Rig                 # GT rig with skins (V, J)
    gt_flow: np.ndarray         # (V, 3*T)
    pred_flow: np.ndarray       # (V, 3*T)
    attn: np.ndarray            # (V,) GT attention mask
    skin_input: np.ndarray      # (V, K*8)
    skin_label: np.ndarray      # (V, K)
    skin_nn: np.ndarray         # (V, K)
    loss_mask: np.ndarray       # (V, K)


def bone_influences(rig: sk.Rig) -> np.ndarray:
    """Per-bone GT influence from joint skins: a bone inherits the skin
    weights of its parent joint; when several bones share a parent the first
    takes the weight (bind-to-parent convention of assemble_skel_skin,
    joint2rig.py:147-162)."""
    bones, names, _ = sk.get_bones(rig)
    V = rig.skins.shape[0]
    out = np.zeros((V, len(bones)))
    seen = set()
    idx = {n: i for i, n in enumerate(rig.names)}
    for b, (pname, _) in enumerate(names):
        if pname not in seen:
            out[:, b] = rig.skins[:, idx[pname]]
            seen.add(pname)
    return out


def build_rig_model(
    name: str,
    verts: np.ndarray,
    tpl_edges: np.ndarray,
    geo_edges: np.ndarray,
    rig: sk.Rig,
    vtx_traj: np.ndarray,            # (V, T_all, 3)
    keyframes: Sequence[int],
    pred_flow: Optional[np.ndarray] = None,
    num_nearest_bone: int = 20,
    geo_dist: Optional[np.ndarray] = None,
    attn_radius: float = 0.08,
) -> RigModel:
    """Assemble one rig-training model.  `geo_dist` is the (V, B) volumetric
    vertex→bone geodesic (geometry/geodesic.py); when None, euclidean
    point-to-segment distance is used (fast path for fixtures)."""
    import jax.numpy as jnp

    V = len(verts)
    flows = [vtx_traj[:, t, :] - vtx_traj[:, 0, :] for t in keyframes]
    gt_flow = np.concatenate(flows, axis=1).astype(np.float32)
    if pred_flow is None:
        pred_flow = gt_flow
    bones, bone_names, isleaf = sk.get_bones(rig)
    if geo_dist is None:
        geo_dist = np.asarray(point_to_segment_dist(
            jnp.asarray(verts, jnp.float32), jnp.asarray(bones, jnp.float32))[0])
    desc, nn, mask = pack_skin_descriptors(geo_dist, bones, isleaf, num_nearest_bone)
    infl = bone_influences(rig)
    skin_label = np.take_along_axis(infl, nn, axis=1).astype(np.float32)
    # GT attention: vertices close to a joint (stand-in for the reference's
    # precomputed *_attn.txt, dataset_rig.py:84)
    dj = np.linalg.norm(verts[:, None] - rig.pos[None], axis=-1).min(1)
    attn = (dj < attn_radius).astype(np.float32)
    return RigModel(
        name=name, verts=verts.astype(np.float32),
        tpl_edges=tpl_edges, geo_edges=geo_edges, rig=rig,
        gt_flow=gt_flow, pred_flow=pred_flow.astype(np.float32),
        attn=attn, skin_input=desc, skin_label=skin_label,
        skin_nn=nn, loss_mask=mask,
    )


class RigDataset:
    def __init__(
        self,
        models: Sequence[RigModel],
        pad_verts: Optional[int] = None,
        max_joints: int = 48,
        nearest_bone: int = 5,
        tpl_max_degree: int = 16,
        geo_max_degree: int = 16,
    ):
        self.models = list(models)
        if pad_verts is None:
            top = max(len(m.verts) for m in self.models)
            pad_verts = B.bucket_size(top, (256, 512, 1024, 2048, 4096, 8192))
        self.pad_verts = pad_verts
        self.max_joints = max_joints
        self.nearest_bone = nearest_bone
        self._mesh_cache = [
            B.build_mesh(m.verts, m.tpl_edges, m.geo_edges, pad_verts,
                         tpl_max_degree, geo_max_degree)
            for m in self.models
        ]

    def __len__(self):
        return len(self.models)

    def batch(self, indices: Sequence[int]) -> B.RigSample:
        import jax.numpy as jnp

        P = self.pad_verts
        K = self.nearest_bone
        cols = {k: [] for k in [
            "joints", "joints_mask", "offsets", "attn", "gt_skin", "gt_flow",
            "pred_flow", "skin_input", "skin_label", "skin_nn", "loss_mask"]}
        meshes = []
        for i in indices:
            m = self.models[i]
            meshes.append(self._mesh_cache[i])
            J = m.rig.num_joints
            joints = B.pad_to(m.rig.pos.astype(np.float32), self.max_joints)
            jm = np.zeros(self.max_joints, bool)
            jm[:J] = True
            nearest = np.argmin(
                np.linalg.norm(m.verts[:, None] - m.rig.pos[None], axis=-1), axis=1
            )
            offs = (m.rig.pos[nearest] - m.verts).astype(np.float32)
            skin = np.zeros((len(m.verts), self.max_joints), np.float32)
            skin[:, :J] = m.rig.skins
            cols["joints"].append(joints)
            cols["joints_mask"].append(jm)
            cols["offsets"].append(B.pad_to(offs, P))
            cols["attn"].append(B.pad_to(m.attn, P))
            cols["gt_skin"].append(B.pad_to(skin, P))
            cols["gt_flow"].append(B.pad_to(m.gt_flow, P))
            cols["pred_flow"].append(B.pad_to(m.pred_flow, P))
            cols["skin_input"].append(B.pad_to(m.skin_input[:, : 8 * K] if K * 8 <= m.skin_input.shape[1] else m.skin_input, P))
            cols["skin_label"].append(B.pad_to(m.skin_label[:, :K], P))
            cols["skin_nn"].append(B.pad_to(m.skin_nn[:, :K], P))
            cols["loss_mask"].append(B.pad_to(m.loss_mask[:, :K], P))
        arr = {k: jnp.asarray(np.stack(v)) for k, v in cols.items()}
        return B.RigSample(
            mesh=B.stack_meshes(meshes),
            joints=arr["joints"], joints_mask=arr["joints_mask"],
            offsets=arr["offsets"], attn_mask=arr["attn"],
            gt_skin=arr["gt_skin"], gt_flow=arr["gt_flow"], pred_flow=arr["pred_flow"],
            skin_input=arr["skin_input"], skin_label=arr["skin_label"],
            skin_nn=arr["skin_nn"], loss_mask=arr["loss_mask"],
        )

    def epoch_schedule(self, rng: np.random.Generator, batch_size: int,
                       train: bool = True) -> list[list[int]]:
        """Model-index schedule of one epoch (see PoseDataset.epoch_schedule)."""
        order = rng.permutation(len(self.models)) if train else np.arange(len(self.models))
        sched = []
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            if len(idx) < batch_size:
                idx = np.concatenate([idx, order[: batch_size - len(idx)]]) if train \
                    else np.concatenate([idx, np.repeat(idx[-1:], batch_size - len(idx))])
            sched.append([int(i) for i in idx])
        return sched

    def epoch_batches(self, rng: np.random.Generator, batch_size: int, train: bool = True):
        for idx in self.epoch_schedule(rng, batch_size, train):
            yield self.batch(idx)


def capsule_rig_dataset(num_models: int = 2, seed: int = 0, num_keyframes: int = 5,
                        noise: float = 0.01, **kw) -> RigDataset:
    """RigDataset over synthetic capsules; pred_flow = gt_flow + noise stands
    in for deform-stage dumps until a DeformNet checkpoint provides them."""
    from morig_tpu.data.synthetic import make_capsule_sequence

    rng = np.random.default_rng(seed)
    models = []
    for i in range(num_models):
        seq = make_capsule_sequence(num_frames=num_keyframes + 1, seed=seed + i, **kw)
        cap = seq["rig"]
        rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                     parents=cap.parents, skins=cap.skins)
        keyframes = list(range(1, num_keyframes + 1))
        gt_flow = np.concatenate(
            [seq["vtx_traj"][:, t, :] - seq["vtx_traj"][:, 0, :] for t in keyframes], 1
        )
        pred = gt_flow + noise * rng.normal(size=gt_flow.shape)
        models.append(build_rig_model(
            f"capsule{i}", seq["vtx_traj"][:, 0, :], seq["tpl_edges"], seq["geo_edges"],
            rig, seq["vtx_traj"], keyframes, pred_flow=pred.astype(np.float32),
        ))
    return RigDataset(models)
