"""Pose datasets: host-side preprocessing into padded PoseSample batches.

Replaces the reference's PyG InMemoryDatasets (datasets/dataset_pose.py) and
the per-batch frame-slicing done in the training loops
(train_corr_pose.py:27-57).  A PoseModel holds the processed arrays of one
animated model; PoseDataset groups models into vertex-size buckets and emits
dense padded PoseSample batches for a chosen (src, tar) frame pair.

Frame conventions (mirroring dataset_pose.py):
  * modelsresource  — keyframes 0,20,...,100 -> 6 discrete frames
  * deformingthings — keyframes 0,19,...,95  -> 6 discrete frames
  * *_seq           — frames 0..20 contiguous
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from morig_tpu.core import batch as B


@dataclasses.dataclass
class PoseModel:
    name: str
    vtx_traj: np.ndarray       # (V, T, 3)
    pts_traj: np.ndarray       # (P, T, 3)
    corr_v2p: np.ndarray       # (N, 3) [vertex, point, frame]
    corr_p2v: np.ndarray       # (N, 3) [point, vertex, frame]
    vismask: np.ndarray        # (V, T)
    tpl_edges: np.ndarray
    geo_edges: np.ndarray

    @property
    def num_verts(self):
        return self.vtx_traj.shape[0]

    @property
    def num_frames(self):
        return self.vtx_traj.shape[1]


def sample_frame_pair(rng: np.random.Generator, kind: str, sequential: bool,
                      num_frames: int) -> tuple[int, int]:
    """Training frame-pair sampling (train_corr_pose.py:27-46 semantics)."""
    if sequential:
        window = 2 if kind == "modelsresource" else 3
        src = int(rng.integers(0, num_frames - 2))
        cands = [t for t in range(max(0, src - window), min(num_frames, src + window)) if t != src]
    else:
        if kind == "modelsresource":
            src = 0
            cands = list(range(1, num_frames))
        else:
            src = int(rng.integers(0, num_frames))
            cands = [t for t in range(num_frames) if t != src]
    tar = int(rng.choice(cands))
    return src, tar


def eval_frame_pair(sequential: bool) -> tuple[int, int]:
    """Deterministic eval pair (train_corr_pose.py:85-88)."""
    return (10, 11) if sequential else (0, 3)


class PoseDataset:
    def __init__(
        self,
        models: Sequence[PoseModel],
        pad_verts: int | None = None,
        tpl_max_degree: int = 16,
        geo_max_degree: int = 16,
        max_corr: int = 1024,
    ):
        self.models = list(models)
        if pad_verts is None:
            top = max(m.num_verts for m in self.models)
            pad_verts = B.bucket_size(top, (256, 512, 1024, 2048, 4096, 8192))
        self.pad_verts = pad_verts
        self.max_corr = max_corr
        self._mesh_cache = [
            B.build_mesh(m.vtx_traj[:, 0, :], m.tpl_edges, m.geo_edges,
                         pad_verts, tpl_max_degree, geo_max_degree)
            for m in self.models
        ]

    def __len__(self):
        return len(self.models)

    def _corr_pad(self, corr: np.ndarray, frame: int):
        rows = corr[corr[:, 2] == frame][:, :2].astype(np.int32)
        n = min(len(rows), self.max_corr)
        out = np.zeros((self.max_corr, 2), np.int32)
        mask = np.zeros(self.max_corr, bool)
        out[:n] = rows[:n]
        mask[:n] = True
        return out, mask

    def batch(self, indices: Sequence[int], src: int, tar: int) -> "B.PoseSample":
        """Assemble a padded PoseSample for models `indices` at (src, tar)."""
        meshes, ptss, ptms, v2ps, v2pms, p2vs, p2vms, viss, flows = ([] for _ in range(9))
        for i in indices:
            m = self.models[i]
            entry = dict(self._mesh_cache[i])
            entry["verts"] = B.pad_to(m.vtx_traj[:, src, :].astype(np.float32), self.pad_verts)
            meshes.append(entry)
            ptss.append(m.pts_traj[:, tar, :].astype(np.float32))
            ptms.append(np.ones(len(m.pts_traj), bool))
            c, cm = self._corr_pad(m.corr_v2p, tar)
            v2ps.append(c); v2pms.append(cm)
            c, cm = self._corr_pad(m.corr_p2v, tar)
            p2vs.append(c); p2vms.append(cm)
            viss.append(B.pad_to(m.vismask[:, tar].astype(np.float32), self.pad_verts))
            flow = (m.vtx_traj[:, tar, :] - m.vtx_traj[:, src, :]).astype(np.float32)
            flows.append(B.pad_to(flow, self.pad_verts))
        import jax.numpy as jnp

        return B.PoseSample(
            mesh=B.stack_meshes(meshes),
            points=B.PointBatch(jnp.asarray(np.stack(ptss)), jnp.asarray(np.stack(ptms))),
            corr=B.CorrBatch(
                jnp.asarray(np.stack(v2ps)), jnp.asarray(np.stack(v2pms)),
                jnp.asarray(np.stack(p2vs)), jnp.asarray(np.stack(p2vms)),
            ),
            vismask=jnp.asarray(np.stack(viss)),
            gt_flow=jnp.asarray(np.stack(flows)),
        )

    def epoch_batches(self, rng: np.random.Generator, batch_size: int, kind: str,
                      sequential: bool, train: bool = True):
        """Yield PoseSample batches for one epoch (shuffled when training)."""
        order = rng.permutation(len(self.models)) if train else np.arange(len(self.models))
        nf = min(m.num_frames for m in self.models)
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            if len(idx) < batch_size:  # drop ragged tail to keep shapes static
                if train:
                    idx = np.concatenate([idx, order[: batch_size - len(idx)]])
                else:
                    idx = np.concatenate([idx, np.repeat(idx[-1:], batch_size - len(idx))])
            if train:
                src, tar = sample_frame_pair(rng, kind, sequential, nf)
            else:
                src, tar = eval_frame_pair(sequential)
                src, tar = min(src, nf - 2), min(tar, nf - 1)
            yield self.batch(idx.tolist(), src, tar)


def capsule_pose_dataset(num_models: int = 2, seed: int = 0, **kw) -> PoseDataset:
    """A PoseDataset of synthetic capsules (see data/synthetic.py)."""
    from morig_tpu.data.synthetic import make_capsule_sequence

    models = []
    for i in range(num_models):
        seq = make_capsule_sequence(seed=seed + i, **kw)
        models.append(
            PoseModel(
                name=f"capsule{i}",
                vtx_traj=seq["vtx_traj"],
                pts_traj=seq["pts_traj"],
                corr_v2p=seq["corr_v2p"],
                corr_p2v=seq["corr_p2v"],
                vismask=seq["vismask"],
                tpl_edges=seq["tpl_edges"],
                geo_edges=seq["geo_edges"],
            )
        )
    return PoseDataset(models)
