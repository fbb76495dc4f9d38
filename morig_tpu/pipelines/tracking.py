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
from morig_tpu.geometry.fk import FKTopology, fk, lbs_blend
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
        # valid slice of the rest vertices — the stage-1 reference pose
        self.rest_v = self.rest_verts[:nv]

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
            self.eye, self.offsets, self.G0, self.q0, self.rest_v, self.skins,
            jnp.arange(nv), vert_shift, vis_v,
        )
        posed1 = lbs_blend(G1, q1, self.G0, self.q0, self.rest_v, self.skins)

        # stage 2: refine against the raw points through gated correspondences
        pts_j = jnp.asarray(pts, jnp.float32)
        best_v, w = self._corr_fn(vtx_f, pts_f, posed1, pts_j, vis_v)
        locals2, G2, q2 = self.solver2(
            locals1, self.offsets, G1, q1, posed1, self.skins,
            best_v, pts_j, w,
        )
        posed2 = lbs_blend(G2, q2, G1, q1, posed1, self.skins)
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
            tracker.eye, tracker.offsets, tracker.G0, tracker.q0,
            tracker.rest_v, tracker.skins,
            jnp.arange(nv), vert_shift, vis_v,
        )
        posed1 = lbs_blend(G1, q1, tracker.G0, tracker.q0, tracker.rest_v,
                           tracker.skins)
        best_v, w = tracker._corr_filter(vtx_f, pts_f, posed1, pts, vis_v)
        locals2, G2, q2 = tracker.solver2(
            locals1, tracker.offsets, G1, q1, posed1, tracker.skins,
            best_v, pts, w,
        )
        posed2 = lbs_blend(G2, q2, G1, q1, posed1, tracker.skins)
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


class BatchedTracker:
    """Whole-test-set tracking: N rigged meshes tracked simultaneously in one
    scanned device program (VERDICT r2 next #4; the reference loops the test
    set one mesh at a time, eval_tracking.py:207-235).

    All meshes share the padded vertex count, point count, and a padded joint
    axis `max_joints`; per-rig trees become array topologies (fk_masked), so
    the per-frame chain (one (B)-batch DeformNet forward -> vmapped IK stage
    1 -> vmapped correspondence gate -> vmapped IK stage 2) is a single
    compiled step scanned over the frame axis.  Aggregate tracked frames/sec
    scales with B until the chip saturates.
    """

    def __init__(self, deform_stage, deform_state, rigs, mesh_entries,
                 cfg: TrackingConfig = TrackingConfig(),
                 max_joints: int = 32):
        from morig_tpu.geometry.fk import fk_masked, topology_arrays
        from morig_tpu.geometry.ik import make_ik_solver_masked

        assert len(rigs) == len(mesh_entries)
        self.stage = deform_stage
        self.state = deform_state
        self.cfg = cfg
        Bn = len(rigs)
        V = mesh_entries[0]["verts"].shape[0]
        Jm = max_joints

        parents_l, levels_l, offsets_l, skins_l, depth = [], [], [], [], 0
        for rig, entry in zip(rigs, mesh_entries):
            assert entry["verts"].shape[0] == V, "shared vertex pad required"
            J = rig.num_joints
            assert J <= Jm, (J, Jm)
            p, lv, d = topology_arrays(rig.parents, Jm)
            depth = max(depth, d)
            parents_l.append(p)
            levels_l.append(lv)
            off = np.zeros((Jm, 3), np.float32)
            off[:J] = rig.offsets()
            offsets_l.append(off)
            sk_p = np.zeros((V, Jm), np.float32)
            nv = int(np.asarray(entry["vert_mask"]).sum())
            sk_p[:nv, :J] = rig.skins
            skins_l.append(sk_p)
        self.max_depth = depth
        self.parents = jnp.asarray(np.stack(parents_l))         # (B,Jm)
        self.levels = jnp.asarray(np.stack(levels_l))
        self.offsets = jnp.asarray(np.stack(offsets_l))         # (B,Jm,3)
        self.skins = jnp.asarray(np.stack(skins_l))             # (B,V,Jm)
        self.mesh_b = B.stack_meshes(list(mesh_entries))
        self.vert_mask = self.mesh_b.vert_mask                  # (B,V)
        eye = np.repeat(np.eye(3, dtype=np.float32)[None], Jm, 0)
        self.eye = jnp.asarray(np.repeat(eye[None], Bn, 0))     # (B,Jm,3,3)

        fk_b = jax.vmap(lambda p, l, r, o: fk_masked(p, l, r, o, depth))
        self.G0, self.q0 = fk_b(self.parents, self.levels, self.eye,
                                self.offsets)

        self.solver1 = make_ik_solver_masked(depth, IKConfig(
            iters=cfg.ik_iters_stage1, lr=cfg.ik_lr_stage1,
            weight_decay=cfg.ik_weight_decay,
            vismask_threshold=cfg.vismask_threshold, w_invis=0.0))
        self.solver2 = make_ik_solver_masked(depth, IKConfig(
            iters=cfg.ik_iters_stage2, lr=cfg.ik_lr_stage2,
            weight_decay=cfg.ik_weight_decay,
            vismask_threshold=cfg.vismask_threshold, w_invis=0.0))

    def _corr_filter(self, vtx_f, pts_f, posed, pts, vismask, vmask):
        """Per-mesh correspondence gate (eval_tracking.py:84-111) with the
        padded vertices excluded from the argmax."""
        sim = vtx_f @ pts_f.T                                   # (V,P)
        sim = jnp.where(vmask[:, None], sim, -1e30)
        best_v = jnp.argmax(sim, axis=0)
        best_sim = jnp.max(sim, axis=0)
        l2 = jnp.sum((posed[best_v] - pts) ** 2, axis=-1)
        keep = (best_sim > self.cfg.corr_sim_threshold) & \
               (l2 < self.cfg.corr_l2_threshold)
        w = keep.astype(jnp.float32) * (vismask[best_v] > self.cfg.vismask_threshold)
        return best_v, w

    def make_scanned(self):
        """run(vtx0 (B,V,3), pts_traj (B,P,T,3)) ->
        (traj (B,V,T-1,3), vis (B,V,T-1), quats (B,Jm,T-1,4))."""
        Bn, V = self.vert_mask.shape

        def flow_fn(verts_b, pts_b):
            mesh = dataclasses.replace(self.mesh_b, verts=verts_b)
            points = B.PointBatch(pts_b, jnp.ones(pts_b.shape[:2], bool))
            empty_idx = jnp.zeros((Bn, 1, 2), jnp.int32)
            empty_mask = jnp.zeros((Bn, 1), bool)
            sample = B.PoseSample(
                mesh=mesh, points=points,
                corr=B.CorrBatch(empty_idx, empty_mask, empty_idx, empty_mask),
                vismask=jnp.zeros(mesh.vert_mask.shape),
                gt_flow=jnp.zeros(mesh.verts.shape))
            pred_flow, vtx_f, pts_f, vis, _ = self.stage.infer(self.state, sample)
            return pred_flow, vtx_f, pts_f, vis

        arange_v = jnp.broadcast_to(jnp.arange(V)[None], (Bn, V))
        vmask_f = self.vert_mask.astype(jnp.float32)

        def step(verts_b, pts_b):
            pred_flow, vtx_f, pts_f, vis = flow_fn(verts_b, pts_b)
            vert_shift = verts_b + pred_flow
            locals1, G1, q1 = jax.vmap(self.solver1)(
                self.eye, self.offsets, self.parents, self.levels,
                self.G0, self.q0, self.mesh_b.verts, self.skins,
                arange_v, vert_shift, vis, vmask_f)
            posed1 = jax.vmap(lbs_blend)(G1, q1, self.G0, self.q0,
                                         self.mesh_b.verts, self.skins)
            best_v, w = jax.vmap(self._corr_filter)(
                vtx_f, pts_f, posed1, pts_b, vis, self.vert_mask)
            ones_p = jnp.ones(w.shape, jnp.float32)
            locals2, G2, q2 = jax.vmap(self.solver2)(
                locals1, self.offsets, self.parents, self.levels,
                G1, q1, posed1, self.skins, best_v, pts_b, w, ones_p)
            posed2 = jax.vmap(lbs_blend)(G2, q2, G1, q1, posed1, self.skins)
            quats = matrix_to_quaternion(locals2)
            return posed2, (posed2, vis, quats)

        @jax.jit
        def run(vtx0, pts_seq):
            # pts_seq (T-1, B, P, 3)
            _, (traj, vis, quats) = jax.lax.scan(step, vtx0, pts_seq)
            return traj, vis, quats

        def run_host(vtx0_b, pts_traj_b):
            """vtx0_b (B,V,3) padded rest verts; pts_traj_b (B,P,T,3)."""
            pts_seq = jnp.asarray(
                np.transpose(np.asarray(pts_traj_b, np.float32)[:, :, 1:, :],
                             (2, 0, 1, 3)))
            v0 = jnp.asarray(vtx0_b, jnp.float32)
            run_host.last_args = (v0, pts_seq)
            traj, vis, quats = run(v0, pts_seq)
            return (np.transpose(np.asarray(traj), (1, 2, 0, 3)),
                    np.transpose(np.asarray(vis), (1, 2, 0)),
                    np.transpose(np.asarray(quats), (1, 2, 0, 3)))

        run_host.jitted = run
        return run_host
