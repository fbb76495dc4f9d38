"""Tracking pipeline: per-frame DeformNet flow + two-stage IK against a
point-cloud stream.

Re-design of evaluate/eval_tracking.py:32-171.  The reference round-trips
GPU→numpy→CPU-torch every frame and walks the FK tree in Python inside 600
Adam iterations (SURVEY.md §3.4); here each frame is three jitted device
programs (flow forward, IK stage 1, IK stage 2) with no host transfers beyond
the Python loop bookkeeping.  Correspondence filtering is shape-static: each
point binds to its best-matching vertex with a 0/1 weight from the similarity
and distance gates (eval_tracking.py:84-111), replacing boolean indexing.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.core import batch as B
from morig_tpu.core.config import TrackingConfig
from morig_tpu.geometry import skeleton as sk
from morig_tpu.geometry.fk import FKTopology, fk, lbs_from_local, verts_to_local
from morig_tpu.geometry.ik import IKConfig, make_ik_solver
from morig_tpu.geometry.rotations import matrix_to_quaternion


@dataclasses.dataclass
class TrackState:
    verts: np.ndarray            # current vertex positions (V, 3)
    quats: Optional[np.ndarray]  # last frame's per-joint quaternions (J, 4)
    vismask: Optional[np.ndarray]


class Tracker:
    """Track one rigged mesh against a point-cloud sequence."""

    def __init__(
        self,
        deform_stage,
        deform_state,
        rig: sk.Rig,
        mesh_entry: dict,
        cfg: TrackingConfig = TrackingConfig(),
        num_points: int = 1024,
    ):
        assert rig.skins is not None
        self.stage = deform_stage
        self.state = deform_state
        self.rig = rig
        self.cfg = cfg
        self.mesh_entry = mesh_entry
        self.topo = FKTopology(rig.parents)
        self.offsets = jnp.asarray(rig.offsets(), jnp.float32)
        self.eye = jnp.asarray(
            np.repeat(np.eye(3, dtype=np.float32)[None], rig.num_joints, 0)
        )
        G0, q0 = fk(self.topo, self.eye, self.offsets)
        self.G0, self.q0 = G0, q0
        self.skins = jnp.asarray(rig.skins, jnp.float32)
        self.rest_verts = jnp.asarray(mesh_entry["verts"], jnp.float32)
        self.vert_mask = jnp.asarray(mesh_entry["vert_mask"])
        nv = int(self.vert_mask.sum())
        self.num_valid = nv
        # joint-local coordinates of the (valid slice of the) rest vertices
        self.vert_local0 = verts_to_local(G0, q0, self.rest_verts[:nv])

        self.solver1 = make_ik_solver(self.topo, IKConfig(
            iters=cfg.ik_iters_stage1, lr=cfg.ik_lr_stage1,
            weight_decay=cfg.ik_weight_decay, vismask_threshold=cfg.vismask_threshold,
            w_invis=0.0,
        ))
        self.solver2 = make_ik_solver(self.topo, IKConfig(
            iters=cfg.ik_iters_stage2, lr=cfg.ik_lr_stage2,
            weight_decay=cfg.ik_weight_decay, vismask_threshold=cfg.vismask_threshold,
            w_invis=0.0,
        ))
        self._corr_fn = jax.jit(self._corr_filter)

    # -- deform forward ------------------------------------------------------
    def _flow(self, verts: np.ndarray, pts: np.ndarray):
        entry = dict(self.mesh_entry)
        entry["verts"] = B.pad_to(np.asarray(verts, np.float32), self.mesh_entry["verts"].shape[0])
        mesh = B.stack_meshes([entry])
        points = B.PointBatch(jnp.asarray(pts[None], jnp.float32),
                              jnp.ones((1, len(pts)), bool))
        empty_idx = jnp.zeros((1, 1, 2), jnp.int32)
        empty_mask = jnp.zeros((1, 1), bool)
        sample = B.PoseSample(mesh=mesh, points=points,
                              corr=B.CorrBatch(empty_idx, empty_mask, empty_idx, empty_mask),
                              vismask=jnp.zeros(mesh.vert_mask.shape),
                              gt_flow=jnp.zeros(mesh.verts.shape))
        pred_flow, vtx_f, pts_f, vis, _ = self.stage.infer(self.state, sample)
        return pred_flow[0], vtx_f[0], pts_f[0], vis[0]

    # -- correspondence gate (eval_tracking.py:84-111) -----------------------
    def _corr_filter(self, vtx_f, pts_f, posed, pts, vismask):
        nv = self.num_valid
        sim = vtx_f[:nv] @ pts_f.T                       # (Vv, P)
        best_v = jnp.argmax(sim, axis=0)                 # (P,)
        best_sim = jnp.max(sim, axis=0)
        l2 = jnp.sum((posed[best_v] - pts) ** 2, axis=-1)
        keep = (best_sim > self.cfg.corr_sim_threshold) & (l2 < self.cfg.corr_l2_threshold)
        w = keep.astype(jnp.float32) * (vismask[best_v] > self.cfg.vismask_threshold)
        return best_v, w

    # -- one frame -----------------------------------------------------------
    def step(self, track: TrackState, pts: np.ndarray) -> TrackState:
        nv = self.num_valid
        pred_flow, vtx_f, pts_f, vis = self._flow(track.verts, pts)
        vert_shift = jnp.asarray(track.verts, jnp.float32) + pred_flow[:nv]
        vis_v = vis[:nv]

        # stage 1: drag rest-pose rig toward the flow-deformed vertices
        locals1, G1, q1 = self.solver1(
            self.eye, self.offsets, self.vert_local0, self.skins,
            jnp.arange(nv), vert_shift, vis_v,
        )
        posed1 = lbs_from_local(G1, q1, self.vert_local0, self.skins)

        # stage 2: refine against the raw points through gated correspondences
        pts_j = jnp.asarray(pts, jnp.float32)
        best_v, w = self._corr_fn(vtx_f, pts_f, posed1, pts_j, vis_v)
        vert_local1 = verts_to_local(G1, q1, posed1)
        locals2, G2, q2 = self.solver2(
            locals1, self.offsets, vert_local1, self.skins,
            best_v, pts_j, w,
        )
        posed2 = lbs_from_local(G2, q2, vert_local1, self.skins)
        quats = np.asarray(matrix_to_quaternion(locals2))
        return TrackState(
            verts=np.asarray(posed2), quats=quats,
            vismask=np.asarray(vis_v),
        )

    def run(self, vtx0: np.ndarray, pts_traj: np.ndarray):
        """Track over a full (P, T, 3) trajectory starting from frame 0.

        Returns (pred_vtx_traj (V, T-1, 3), vismasks (V, T-1), quats
        (J, T-1, 4)) — the outputs eval_tracking.py:157-170 assembles."""
        track = TrackState(verts=np.asarray(vtx0, np.float32), quats=None, vismask=None)
        verts_out, vis_out, quat_out = [], [], []
        for t in range(1, pts_traj.shape[1]):
            track = self.step(track, pts_traj[:, t, :])
            verts_out.append(track.verts)
            vis_out.append(track.vismask)
            quat_out.append(track.quats)
        return (np.stack(verts_out, 1), np.stack(vis_out, 1), np.stack(quat_out, 1))


def make_scanned_tracker(tracker: Tracker):
    """Whole-sequence tracking as one `lax.scan` program.

    The per-frame Python loop costs three device dispatches per frame; this
    compiles the full (DeformNet -> IK1 -> gate -> IK2) chain once and scans
    it over the frame axis — the SURVEY.md §7 design move 3 for tracking.
    Returns run(vtx0 (nv,3), pts_traj (P,T,3)) -> (traj (nv,T-1,3),
    vismasks (nv,T-1), quats (J,T-1,4)).
    """
    import jax

    nv = tracker.num_valid
    pad = tracker.mesh_entry["verts"].shape[0]
    mesh_proto = B.stack_meshes([tracker.mesh_entry])

    def flow_fn(verts, pts):
        verts_p = jnp.concatenate(
            [verts, jnp.zeros((pad - nv, 3), jnp.float32)], axis=0)
        mesh = dataclasses.replace(mesh_proto, verts=verts_p[None])
        points = B.PointBatch(pts[None], jnp.ones((1, pts.shape[0]), bool))
        empty_idx = jnp.zeros((1, 1, 2), jnp.int32)
        empty_mask = jnp.zeros((1, 1), bool)
        sample = B.PoseSample(
            mesh=mesh, points=points,
            corr=B.CorrBatch(empty_idx, empty_mask, empty_idx, empty_mask),
            vismask=jnp.zeros(mesh.vert_mask.shape), gt_flow=jnp.zeros(mesh.verts.shape),
        )
        pred_flow, vtx_f, pts_f, vis, _ = tracker.stage.infer(tracker.state, sample)
        return pred_flow[0, :nv], vtx_f[0], pts_f[0], vis[0, :nv]

    def step(verts, pts):
        pred_flow, vtx_f, pts_f, vis_v = flow_fn(verts, pts)
        vert_shift = verts + pred_flow
        locals1, G1, q1 = tracker.solver1(
            tracker.eye, tracker.offsets, tracker.vert_local0, tracker.skins,
            jnp.arange(nv), vert_shift, vis_v,
        )
        posed1 = lbs_from_local(G1, q1, tracker.vert_local0, tracker.skins)
        best_v, w = tracker._corr_filter(vtx_f, pts_f, posed1, pts, vis_v)
        vert_local1 = verts_to_local(G1, q1, posed1)
        locals2, G2, q2 = tracker.solver2(
            locals1, tracker.offsets, vert_local1, tracker.skins,
            best_v, pts, w,
        )
        posed2 = lbs_from_local(G2, q2, vert_local1, tracker.skins)
        quats = matrix_to_quaternion(locals2)
        return posed2, (posed2, vis_v, quats)

    @jax.jit
    def run(vtx0, pts_seq):
        # pts_seq: (T-1, P, 3) frames 1..T-1
        final, (traj, vis, quats) = jax.lax.scan(step, vtx0, pts_seq)
        return traj, vis, quats

    def run_host(vtx0, pts_traj):
        pts_seq = jnp.asarray(np.transpose(pts_traj[:, 1:, :], (1, 0, 2)), jnp.float32)
        v0 = jnp.asarray(vtx0, jnp.float32)
        run_host.last_args = (v0, pts_seq)   # for FLOPs lowering (bench.py)
        traj, vis, quats = run(v0, pts_seq)
        return (np.transpose(np.asarray(traj), (1, 0, 2)),
                np.transpose(np.asarray(vis), (1, 0)),
                np.transpose(np.asarray(quats), (1, 0, 2)))

    run_host.jitted = run
    return run_host
