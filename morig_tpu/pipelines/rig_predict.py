"""End-to-end rig prediction: point-cloud sequence -> fully skinned rig.

The reference's 6-stage filesystem-handoff DAG (SURVEY.md §3.5: deform dumps
-> train_rig -e dumps -> eval_rigging -> joint2rig pred_skel -> pred_rig)
collapses here into one resumable pipeline object.  Per mesh:

  1. DeformNet flow at T keyframes          (device)
  2. JointNet shift + MaskNet attention     (device)
  3. mean-shift + NMS + flip -> joints      (device + host modes)
  4. RootNet/BoneNet -> cost -> Prim MST    (device nets, host MST)
  5. bone descriptors -> SkinMotion -> post_filter -> assembled Rig
                                            (device nets+smoothing, host assembly)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np

from morig_tpu.core import batch as B
from morig_tpu.core.config import Config, DEFAULT_CONFIG
from morig_tpu.geometry import skeleton as sk
from morig_tpu.geometry.bones import pack_skin_descriptors, point_to_segment_dist
from morig_tpu.geometry.clustering import extract_joints
from morig_tpu.geometry.skinning import post_filter_skin, prune_and_normalize
from morig_tpu.geometry.voxel import Voxels, inside_check_np
from morig_tpu.pipelines.skeleton import predict_skeleton


def batch_fingerprint(Bn: int, T: int, mesh_entries: Sequence[dict]) -> tuple:
    """Content fingerprint of a mesh batch for device-cache validation.

    Built from shapes + cheap array checksums rather than object ids:
    CPython id reuse after GC could validate a STALE cache (the exact bug
    the check exists to prevent), while byte-identical rebuilt entries are
    legitimately reusable and must not be rejected."""
    def _entry_fp(e):
        v = e["verts"]
        return (v.shape, float(v.sum()), float(np.abs(v).sum()),
                int(e["vert_mask"].sum()), int(e["tpl_nbr"].sum()),
                int(e["geo_nbr"].sum()))

    return (Bn, T, tuple(_entry_fp(e) for e in mesh_entries))


@dataclasses.dataclass
class RigPredictor:
    """Bundles the trained stages + states of the full pipeline."""

    deform_stage: object
    deform_state: object
    joint_stage: object
    joint_state: object
    mask_stage: object
    mask_state: object
    root_stage: object
    root_state: object
    bone_stage: object
    bone_state: object
    skin_stage: object
    skin_state: object
    cfg: Config = dataclasses.field(default_factory=lambda: DEFAULT_CONFIG)

    # -- stage 1: multi-keyframe flow -------------------------------------
    def predict_flow(self, mesh_entry: dict, pts_frames: np.ndarray):
        """pts_frames (T, P, 3) -> flow (V, 3*T) from the rest mesh to each
        keyframe (the deform dumps of train_deform_pose.py:116-127)."""
        import jax.numpy as jnp

        T = pts_frames.shape[0]
        mesh = B.stack_meshes([mesh_entry] * T)
        points = B.PointBatch(
            jnp.asarray(pts_frames, jnp.float32),
            jnp.ones(pts_frames.shape[:2], bool),
        )
        empty_idx = jnp.zeros((T, 1, 2), jnp.int32)
        empty_mask = jnp.zeros((T, 1), bool)
        sample = B.PoseSample(
            mesh=mesh, points=points,
            corr=B.CorrBatch(empty_idx, empty_mask, empty_idx, empty_mask),
            vismask=jnp.zeros(mesh.vert_mask.shape), gt_flow=jnp.zeros(mesh.verts.shape),
        )
        pred_flow, *_ = self.deform_stage.infer(self.deform_state, sample)
        flow = np.asarray(pred_flow)                  # (T, V, 3)
        return np.concatenate([flow[t] for t in range(T)], axis=-1)

    # -- stages 2-3: joints -------------------------------------------------
    def predict_shift_attn(self, mesh_entry: dict, flow: np.ndarray):
        """Shifted points + attention for the valid vertices — the artifact
        pair train_rig.py:257,264 dumps for eval_rigging.py."""
        import jax.numpy as jnp

        mesh = B.stack_meshes([mesh_entry])
        flow_j = jnp.asarray(flow[None], jnp.float32)
        _, _, shift = self.joint_stage.infer(self.joint_state, flow_j, mesh)
        _, _, attn_logits = self.mask_stage.infer(self.mask_state, flow_j, mesh)
        vmask = np.asarray(mesh.vert_mask[0])
        shifted = np.asarray(mesh.verts[0] + jnp.tanh(shift[0]))[vmask]
        attn = (1.0 / (1.0 + np.exp(-np.asarray(attn_logits[0]))))[vmask]
        return shifted, attn.reshape(-1)

    def predict_joints(self, mesh_entry: dict, flow: np.ndarray,
                       vox: Optional[Voxels] = None,
                       shift_attn: Optional[tuple] = None) -> np.ndarray:
        shifted, attn = (shift_attn if shift_attn is not None
                         else self.predict_shift_attn(mesh_entry, flow))
        inside = (lambda p: inside_check_np(p, vox)) if vox is not None else None
        jc = self.cfg.joints
        return extract_joints(
            shifted, attn, inside_fn=inside,
            bandwidth_quantile=jc.bandwidth_quantile,
            attn_keep_threshold=jc.attn_threshold,
            density_threshold=jc.density_threshold,
            attn_nms_threshold=jc.attn_nms_threshold,
            meanshift_iters=jc.meanshift_max_iter,
            bandwidth_sample_rows=jc.bandwidth_sample_rows,
        )

    # -- stage 4: skeleton ---------------------------------------------------
    def predict_skel(self, mesh_entry: dict, joints: np.ndarray,
                     vox: Optional[Voxels] = None) -> sk.Rig:
        return predict_skeleton(
            mesh_entry, joints, self.root_state, self.root_stage,
            self.bone_state, self.bone_stage, vox=vox,
        )

    # -- stage 5: skinning ---------------------------------------------------
    def predict_skin(self, mesh_entry: dict, skel: sk.Rig, flow: np.ndarray,
                     geo_dist: Optional[np.ndarray] = None) -> sk.Rig:
        """SkinMotion over K-nearest-bone descriptors, smoothed, pruned,
        assembled into a skinned rig (joint2rig.py:397-464).  `geo_dist` is
        the (V, B) volumetric geodesic (geometry/geodesic.py); euclidean
        point-to-segment distance is the fast fallback."""
        import jax.numpy as jnp

        mesh = B.stack_meshes([mesh_entry])
        vmask = np.asarray(mesh.vert_mask[0])
        verts = np.asarray(mesh.verts[0])
        bones, bone_names, isleaf = sk.get_bones(skel)
        if geo_dist is None:
            d, _ = point_to_segment_dist(
                jnp.asarray(verts, jnp.float32), jnp.asarray(bones, jnp.float32))
            geo_dist = np.asarray(d)
        K = self.cfg.model.nearest_bone
        desc, skin_nn, loss_mask = pack_skin_descriptors(geo_dist, bones, isleaf, K)

        flow_j = jnp.asarray(flow[None], jnp.float32)
        _, _, logits = self.skin_stage.infer(
            self.skin_state, jnp.asarray(desc[None]), flow_j, mesh)
        probs = np.asarray(jax.nn.softmax(logits[0], axis=-1)) * loss_mask
        V = verts.shape[0]
        full = np.zeros((V, len(bones)))
        rows = np.repeat(np.arange(V), K)
        np.add.at(full, (rows, skin_nn.reshape(-1)), probs.reshape(-1))

        smoothed = np.asarray(post_filter_skin(
            jnp.asarray(full, jnp.float32), mesh.tpl_nbr[0], mesh.tpl_mask[0],
            num_ring=self.cfg.skin_post.post_filter_rings,
        ))
        pruned = np.asarray(prune_and_normalize(
            jnp.asarray(smoothed), self.cfg.skin_post.prune_ratio_rig))
        rig = sk.assemble_skel_skin(skel, pruned[vmask])
        return sk.remove_duplicate_joints(rig)

    # -- everything ----------------------------------------------------------
    def predict_rig(self, mesh_entry: dict, pts_frames: np.ndarray,
                    vox: Optional[Voxels] = None,
                    geo_dist: Optional[np.ndarray] = None,
                    intermediates: Optional[dict] = None) -> sk.Rig:
        """Full per-mesh DAG.  Pass `intermediates={}` to also receive the
        flow and the shifted-points/attention artifact pair (computed once,
        not re-run — they are stage byproducts)."""
        flow = self.predict_flow(mesh_entry, pts_frames)
        shifted, attn = self.predict_shift_attn(mesh_entry, flow)
        if intermediates is not None:
            intermediates.update(flow=flow, shifted=shifted, attn=attn)
        joints = self.predict_joints(mesh_entry, flow, vox,
                                     shift_attn=(shifted, attn))
        if len(joints) == 0:  # degenerate fallback: one joint at the centroid
            vmask = np.asarray(mesh_entry["vert_mask"])
            joints = mesh_entry["verts"][vmask].mean(0, keepdims=True)
        skel = self.predict_skel(mesh_entry, joints, vox)
        return self.predict_skin(mesh_entry, skel, flow, geo_dist)

    # -- batched full DAG (throughput path) -----------------------------------
    def _jit(self, name, fn):
        """Cache a jitted program.  With `self.record_args = True` (set by
        bench.py) each call's args are also recorded so the benchmark can
        lower the exact executed computation for XLA FLOPs accounting —
        off by default, since holding the previous batch's device buffers
        would pin them in HBM for the predictor's lifetime (ADVICE r2 #4)."""
        cache = self.__dict__.setdefault("_jit_cache", {})
        last_args = self.__dict__.setdefault("_last_args", {})
        if name not in cache:
            import jax

            jf = jax.jit(fn)

            def wrapper(*args, _name=name, _jf=jf):
                if self.__dict__.get("record_args", False):
                    last_args[_name] = args
                return _jf(*args)

            wrapper.jitted = jf
            cache[name] = wrapper
        return cache[name]

    def _smooth_program(self):
        """Batched skin smoothing + pruning at a fixed padded bone count."""
        import jax

        from morig_tpu.geometry.skinning import post_filter_skin, prune_and_normalize

        def fn(full, tpl_nbr, tpl_mask):
            def one(f, nbr, msk):
                s = post_filter_skin(
                    f, nbr, msk, num_ring=self.cfg.skin_post.post_filter_rings)
                return prune_and_normalize(s, self.cfg.skin_post.prune_ratio_rig)

            return jax.vmap(one)(full, tpl_nbr, tpl_mask)

        return self._jit("smooth", fn)

    def _flow_joints_program(self, has_vox: bool, Bn: int, T: int):
        """Stage 1-3 in ONE dispatch: the (B*T) DeformNet forward, the
        joint/mask nets, and the whole device end of joint extraction.
        Returns (flow (B,V,3T) — stays device-resident for the skin stage —
        plus the packed cluster outputs and bandwidths)."""
        import jax
        import jax.numpy as jnp

        from morig_tpu.geometry.clustering import select_and_cluster

        jc = self.cfg.joints

        def fn(dparams, dstats, jparams, jstats, mparams, mstats,
               mesh_bt, points, mesh, grid, tr, sc):
            dvars = {"params": dparams, "batch_stats": dstats}
            # mesh embedding once per DISTINCT mesh (B), broadcast over the
            # T keyframes — mesh_bt repeats each entry T times consecutively,
            # and the CorrNet mesh branch is point-cloud-independent
            vtx_f_b = self.deform_stage.model.apply(
                dvars, mesh, None, False, None, mesh_only=True)   # (B, V, C)
            vtx_f_bt = jnp.repeat(vtx_f_b, T, axis=0)             # (B*T, V, C)
            flow_bt = self.deform_stage.model.apply(
                dvars, mesh_bt, points, False, None,
                vtx_f=vtx_f_bt)[0]                             # (B*T, V, 3)
            V = flow_bt.shape[1]
            flow = jnp.transpose(
                jnp.reshape(flow_bt, (Bn, T, V, 3)), (0, 2, 1, 3)
            ).reshape(Bn, V, T * 3)
            _, _, shift = self.joint_stage.model.apply(
                {"params": jparams, "batch_stats": jstats}, flow, mesh, False)
            _, _, attn = self.mask_stage.model.apply(
                {"params": mparams, "batch_stats": mstats}, flow, mesh, False)
            shifted = mesh.verts + jnp.tanh(shift)
            attn_p = jax.nn.sigmoid(attn[..., 0])
            moved, bw, counts, attn2, sel2 = select_and_cluster(
                shifted, attn_p, mesh.vert_mask, grid, tr, sc,
                quantile=jc.bandwidth_quantile, num_iter=jc.meanshift_max_iter,
                attn_threshold=jc.attn_threshold, symmetrize=True,
                has_vox=has_vox, sample_rows=jc.bandwidth_sample_rows)
            # The (B, 2V, 6) cluster table dominates the fetch over the slow
            # tunnel; f16 halves it (positions exact to ~5e-4; counts exact
            # through 2048).  Row truncation is EXACT by default
            # (cluster_fetch_cap=0): a densest-first cap silently drops whole
            # low-density modes — extremity joints on multi-limb bodies —
            # which collapsed recall to 0.37 on the creature campaign.
            N2 = moved.shape[1]
            D = min(jc.cluster_fetch_cap, N2) if jc.cluster_fetch_cap else N2
            if D == N2:            # exact: all rows, no sort needed
                packed = jnp.concatenate([
                    moved, counts.astype(jnp.float32)[..., None],
                    attn2.astype(jnp.float32)[..., None],
                    sel2.astype(jnp.float32)[..., None],
                ], axis=-1).astype(jnp.float16)
                return flow, packed, bw
            key = jnp.where(sel2, counts.astype(jnp.float32)
                            + jnp.clip(attn2, 0.0, 1.0), -1.0)
            _, didx = jax.lax.top_k(key, D)                       # (B, D)
            packed = jnp.concatenate([
                jnp.take_along_axis(moved, didx[..., None], axis=1),
                jnp.take_along_axis(counts.astype(jnp.float32),
                                    didx, axis=1)[..., None],
                jnp.take_along_axis(attn2.astype(jnp.float32),
                                    didx, axis=1)[..., None],
                jnp.take_along_axis(sel2.astype(jnp.float32),
                                    didx, axis=1)[..., None],
            ], axis=-1).astype(jnp.float16)
            return flow, packed, bw

        return self._jit(f"flow_joints_vox{int(has_vox)}_{Bn}_{T}", fn)

    def _skelnets_program(self, has_vox: bool, max_joints: int):
        """Pair building, pair attributes (dist + voxel inside-fraction), and
        the RootNet/BoneNet forwards in one dispatch over padded joints.

        The candidate pair table for `max_joints` slots is a compile-time
        constant; pairs touching padded joint slots produce garbage logits
        that the host masks by the true per-mesh joint count.  Output is one
        (B, J + P) array: [root logits | pair logits]."""
        import itertools

        import jax
        import jax.numpy as jnp

        from morig_tpu.geometry.voxel import segment_inside_fraction

        pairs_const = np.array(
            list(itertools.combinations(range(max_joints), 2)), np.int32)

        def fn(rparams, rstats, bparams, bstats, joints, jmask, mesh,
               grid, tr, sc):
            Bn = joints.shape[0]
            pt = jnp.asarray(pairs_const)
            a = joints[:, pt[:, 0]]                      # (B, P, 3)
            b = joints[:, pt[:, 1]]
            dist = jnp.linalg.norm(a - b, axis=-1)
            if has_vox:
                frac = jax.vmap(segment_inside_fraction)(a, b, grid, tr, sc)
            else:
                frac = jnp.ones_like(dist)
            attr = jnp.stack([dist, frac], axis=-1)
            pairs_b = jnp.broadcast_to(pt[None], (Bn,) + pt.shape)
            root_logits = self.root_stage.model.apply(
                {"params": rparams, "batch_stats": rstats},
                mesh, joints, jmask, False)
            pair_logits = self.bone_stage.model.apply(
                {"params": bparams, "batch_stats": bstats},
                mesh, joints, jmask, pairs_b, attr, False)
            # [root | pair logits | pair inside-fractions] in one fetch;
            # f16 halves the (B, J + 2P) transfer over the ~8 MB/s tunnel
            # (logit resolution ~3e-2 at |x|=50: immaterial to argmax-root,
            # sigmoid->-log MST costs, and the 0.5 frac threshold)
            return jnp.concatenate([root_logits[..., 0], pair_logits[..., 0],
                                    frac], axis=1).astype(jnp.float16)

        return self._jit(f"skelnets_vox{int(has_vox)}_{max_joints}", fn)

    def _skin_full_program(self, geodesic: bool = False):
        """The whole device end of the skin stage in ONE program: vertex-to-
        bone distances over a padded bone axis, K-nearest descriptor packing
        (pack_skin_descriptors semantics, on device), SkinMotion forward,
        scatter to the padded bone axis, smoothing, pruning.

        With `geodesic` the vertex→bone distance is the reference-faithful
        VOLUMETRIC geodesic (voxel-LOS visibility + surface-geodesic fallback
        for occluded pairs, joint2rig.py:307-360) computed on device from the
        cached per-mesh surface-geodesic matrix; otherwise the euclidean
        point-to-segment fast path."""
        import jax

        from morig_tpu.geometry.skinning import post_filter_skin, prune_and_normalize

        K = self.cfg.model.nearest_bone

        def fn(params, stats, bones_packed, flow, mesh, surf_geo, grid, tr, sc):
            import jax.numpy as jnp

            # one packed upload: [6 endpoint coords | isleaf | valid]
            bones_p = bones_packed[..., :6]
            isleaf_p = bones_packed[..., 6]
            bone_mask = bones_packed[..., 7] > 0.5
            Bmax = bones_p.shape[1]

            def desc_one(verts, bones, isleaf, bmask, sg, g, t, s):
                Vn = verts.shape[0]
                if geodesic:
                    from morig_tpu.geometry.geodesic import (
                        vertex_bone_geodesic_device,
                    )

                    sp = self.cfg.skin_post
                    d = vertex_bone_geodesic_device(
                        verts, bones, bmask, sg, g, t, s,
                        num_anchors=sp.geo_anchors,
                        los_samples=sp.geo_los_samples,
                        num_candidates=sp.geo_candidates)           # (V, Bmax)
                else:
                    d, _ = point_to_segment_dist(verts, bones)      # (V, Bmax)
                    d = jnp.where(bmask[None, :], d, 1e30)
                neg, nn = jax.lax.top_k(-d, K)                      # (V, K)
                dk = -neg
                ok = jnp.take_along_axis(
                    jnp.broadcast_to(bmask[None, :], d.shape), nn, axis=1)
                nn = jnp.where(ok, nn, nn[:, :1])                   # repeat nearest
                dk = jnp.where(ok, dk, dk[:, :1])
                desc = jnp.concatenate([
                    bones[nn],                                       # (V, K, 6)
                    (1.0 / (dk + 1e-10))[..., None],
                    isleaf[nn].astype(jnp.float32)[..., None],
                ], axis=-1).reshape(Vn, K * 8)
                return desc, nn, ok.astype(jnp.float32)

            if geodesic:
                desc, nn, lmask = jax.vmap(desc_one)(
                    mesh.verts, bones_p, isleaf_p, bone_mask, surf_geo,
                    grid, tr, sc)
            else:
                desc, nn, lmask = jax.vmap(
                    lambda v, b, i, m: desc_one(v, b, i, m, None, None, None, None)
                )(mesh.verts, bones_p, isleaf_p, bone_mask)
            _, _, logits = self.skin_stage.model.apply(
                {"params": params, "batch_stats": stats}, desc, flow, mesh, False)
            probs = jax.nn.softmax(logits, axis=-1) * lmask          # (B, V, K)

            def scatter_one(p, n):
                Vn = p.shape[0]
                return jnp.zeros((Vn, Bmax), jnp.float32).at[
                    jnp.arange(Vn)[:, None], n].add(p)

            full = jax.vmap(scatter_one)(probs, nn)

            def smooth_one(f, nbr, msk):
                s = post_filter_skin(
                    f, nbr, msk, num_ring=self.cfg.skin_post.post_filter_rings)
                return prune_and_normalize(s, self.cfg.skin_post.prune_ratio_rig)

            pruned = jax.vmap(smooth_one)(full, mesh.tpl_nbr, mesh.tpl_mask)
            # bf16 halves the one sizeable fetch of the pipeline; rows are
            # renormalized in fp32 on the host after the cast
            return pruned.astype(jnp.bfloat16)

        return self._jit(f"skin_full_geo{int(geodesic)}", fn)

    def predict_rig_batch(
        self,
        mesh_entries: Sequence[dict],
        pts_frames_list: Sequence[np.ndarray],   # per mesh (T, P, 3)
        voxes: Optional[Sequence] = None,
        surf_geos: Optional[Sequence[np.ndarray]] = None,
        max_joints: int = 48,
        timings: Optional[dict] = None,
        device_cache: Optional[dict] = None,
    ) -> list:
        """Full rig prediction for a batch of meshes — the throughput path.

        Same DAG as predict_rig (T DeformNet forwards per mesh, joint+mask,
        device mean-shift, host NMS/flip, BoneNet/RootNet + host Prim MST,
        SkinMotion + smoothing + host assembly), with every device program
        batched across the B meshes and compiled once per shape:

          * flow: one (B*T)-batch DeformNet forward
          * joints: one (B)-batch JointNet+MaskNet forward + one vmapped
            static-shape bandwidth/mean-shift program (clustering.py)
          * skeleton: one (B)-batch RootNet/BoneNet forward, host MSTs
          * skin: one (B)-batch SkinMotion forward + vmapped smoothing

        Returns a list of assembled Rigs (joint2rig.py:397-510 per mesh).
        """
        import time as _time

        import jax
        import jax.numpy as jnp

        t_last = [_time.perf_counter()]

        def mark(name, *sync):
            if timings is None:
                return
            for x in sync:
                jax.block_until_ready(x)
            now = _time.perf_counter()
            timings[name] = timings.get(name, 0.0) + now - t_last[0]
            t_last[0] = now

        from morig_tpu.geometry.clustering import nms_flip_host

        Bn = len(mesh_entries)
        T = pts_frames_list[0].shape[0]
        cache = device_cache if device_cache is not None else {}

        # Static per-mesh device residents (mesh tables, voxel grids) are
        # uploaded once per distinct batch when the caller passes a
        # device_cache — production streams each mesh to the chip once, not
        # once per pipeline stage.  The cache is fingerprinted by the mesh
        # batch CONTENT (see batch_fingerprint): reusing it with different
        # meshes would silently run the whole DAG on stale tensors
        # (ADVICE r2 #3).
        fp = batch_fingerprint(Bn, T, mesh_entries)
        if cache.get("_fingerprint", fp) != fp:
            raise ValueError(
                "device_cache was built from a different mesh batch; pass a "
                "fresh cache (or none) when the meshes change")
        cache["_fingerprint"] = fp
        mesh_bt = cache.get("mesh_bt")
        if mesh_bt is None:
            mesh_bt = B.stack_meshes([e for e in mesh_entries for _ in range(T)])
            cache["mesh_bt"] = mesh_bt
        mesh_b = cache.get("mesh_b")
        if mesh_b is None:
            mesh_b = B.stack_meshes(list(mesh_entries))
            cache["mesh_b"] = mesh_b
        vox_dev = cache.get("vox")
        if vox_dev is None and voxes is not None and all(
            v is not None for v in voxes
        ) and len({v.dims for v in voxes}) == 1:
            from morig_tpu.geometry.voxel import vox_to_device

            triples = [vox_to_device(v) for v in voxes]
            vox_dev = (jnp.stack([t[0] for t in triples]),
                       jnp.stack([t[1] for t in triples]),
                       jnp.stack([t[2] for t in triples]))
            cache["vox"] = vox_dev
        # Per-mesh surface-geodesic matrices (mesh-dependent, prediction-
        # independent — the reference caches them to .npy the same way,
        # joint2rig.py:502-506) enable the volumetric skin-descriptor path.
        # Padded rows/cols are +inf so the occluded-pair fallback can never
        # route through a padding vertex; bf16 halves the HBM residency.
        sg_dev = cache.get("surf_geo")
        if sg_dev is None and surf_geos is not None and vox_dev is not None:
            V_pad = mesh_entries[0]["verts"].shape[0]
            mats = []
            for sg in surf_geos:
                a = np.full((V_pad, V_pad), 1e30, np.float32)
                n = sg.shape[0]
                a[:n, :n] = np.minimum(sg, 1e30)
                mats.append(a)
            sg_dev = jnp.asarray(np.stack(mats), jnp.bfloat16)
            cache["surf_geo"] = sg_dev

        # ---- stages 1-3 in ONE dispatch: (B*T) flow forward + joint/mask
        # nets + device joint extraction; packed outputs -> ONE fetch; the
        # flow stays device-resident for the skin stage ----
        pts_bt = np.concatenate([np.asarray(p, np.float32) for p in pts_frames_list], 0)
        points = B.PointBatch(jnp.asarray(pts_bt),
                              jnp.ones(pts_bt.shape[:2], bool))
        jc = self.cfg.joints
        grid, tr, sc = vox_dev if vox_dev is not None else (None, None, None)
        flow, packed, bw_dev = self._flow_joints_program(
            vox_dev is not None, Bn, T)(
            self.deform_state.params, self.deform_state.batch_stats,
            self.joint_state.params, self.joint_state.batch_stats,
            self.mask_state.params, self.mask_state.batch_stats,
            mesh_bt, points, mesh_b, grid, tr, sc)
        V = flow.shape[1]
        mark("flow", flow)
        arr, bws = jax.device_get((packed, bw_dev))
        arr = np.asarray(arr, np.float32)  # fetched f16; host math in f32
        moved, counts = arr[..., 0:3], arr[..., 3]
        attn2, sel2 = arr[..., 4], arr[..., 5] > 0.5
        mark("jointcluster_device")
        nms_out = nms_flip_host(
            moved, bws, counts, attn2, sel2,
            density_threshold=jc.density_threshold,
            attn_nms_threshold=jc.attn_nms_threshold, symmetrize=True,
            return_density=True)
        joints_list = []
        for i, (j, dens) in enumerate(nms_out):
            if len(j) == 0:
                vmask = np.asarray(mesh_entries[i]["vert_mask"])
                j = mesh_entries[i]["verts"][vmask].mean(0, keepdims=True)
            elif len(j) > max_joints:
                # keep the densest modes, not an arbitrary index-order subset
                j = j[np.argsort(-np.asarray(dens), kind="stable")[:max_joints]]
            joints_list.append(j)
        mark("nms_host")

        # ---- stage 4: skeletons.  Pair table is a compile-time constant;
        # attrs + RootNet/BoneNet in one dispatch, one packed fetch, MST in
        # numpy ----
        import itertools as _it

        joints_p = np.zeros((Bn, max_joints, 3), np.float32)
        jmask = np.zeros((Bn, max_joints), bool)
        for i, j in enumerate(joints_list):
            joints_p[i, :len(j)] = j
            jmask[i, :len(j)] = True
        logits = np.asarray(self._skelnets_program(
            vox_dev is not None, max_joints)(
            self.root_state.params, self.root_state.batch_stats,
            self.bone_state.params, self.bone_state.batch_stats,
            jnp.asarray(joints_p), jnp.asarray(jmask), mesh_b, grid, tr, sc),
            np.float32)  # fetched f16; host math in f32
        max_pairs = max_joints * (max_joints - 1) // 2
        root_logits = logits[:, :max_joints]
        pair_logits = logits[:, max_joints:max_joints + max_pairs]
        pair_frac = logits[:, max_joints + max_pairs:]
        pairs_const = np.array(
            list(_it.combinations(range(max_joints), 2)), np.int32)
        mark("rootbone")
        skels = []
        for i in range(Bn):
            joints = joints_list[i]
            J = len(joints)
            rl = root_logits[i][:J]
            root_id = int(np.argmax(rl))
            ok = (pairs_const[:, 0] < J) & (pairs_const[:, 1] < J)
            pr = pairs_const[ok]
            prob = np.zeros((J, J))
            prob[pr[:, 0], pr[:, 1]] = 1.0 / (1.0 + np.exp(-pair_logits[i][ok]))
            prob = prob + prob.T
            cost = -np.log(prob + 1e-10)
            if vox_dev is not None:
                cost = sk.increase_cost_for_outside_bone(
                    cost, joints, frac=pair_frac[i][ok])
            parents = sk.prim_mst(cost, root_id)
            skels.append(sk.rig_from_parents(joints, parents))
        mark("mst")

        # ---- stage 5: skinning.  One packed bones upload; distances,
        # descriptor packing, SkinMotion, scatter, smoothing and pruning all
        # in ONE device program; one download; numpy assembly ----
        # The bone axis is padded to the BATCH max rounded up to a power of
        # two (floor 8, cap 2*max_joints = the get_bones <= 2*(J-1) bound):
        # padding it statically to 2*max_joints would run the volumetric
        # geodesic (LOS rays + min-plus fallback) over ~10x more bone slots
        # than real bones on typical meshes.  Power-of-two buckets keep the
        # number of distinct compiled shapes logarithmic.
        hard_cap = 2 * max_joints
        raw = [sk.get_bones(s) for s in skels]
        nb_batch = max(min(len(r[0]), hard_cap) for r in raw)
        Bmax = 8
        while Bmax < nb_batch:
            Bmax *= 2
        Bmax = min(Bmax, hard_cap)
        bones_packed = np.zeros((Bn, Bmax, 8), np.float32)
        bones_list = []
        for i in range(Bn):
            bones, _, isleaf = raw[i]
            nb = min(len(bones), Bmax)
            bones_packed[i, :nb, :6] = bones[:nb]
            bones_packed[i, :nb, 6] = np.asarray(isleaf[:nb], np.float32)
            bones_packed[i, :nb, 7] = 1.0
            bones_list.append(bones[:nb])
        use_geo = sg_dev is not None and vox_dev is not None
        pruned = np.asarray(self._skin_full_program(geodesic=use_geo)(
            self.skin_state.params, self.skin_state.batch_stats,
            jnp.asarray(bones_packed), flow, mesh_b,
            sg_dev, grid, tr, sc)).astype(np.float32)
        rs = pruned.sum(-1, keepdims=True)                  # renorm post-bf16
        pruned = np.where(rs > 0, pruned / np.maximum(rs, 1e-9), 0.0)
        mark("skin_device")

        rigs = []
        for i in range(Bn):
            vmask = np.asarray(mesh_entries[i]["vert_mask"])
            nb = len(bones_list[i])
            rig = sk.assemble_skel_skin(skels[i], pruned[i][vmask][:, :nb])
            rigs.append(sk.remove_duplicate_joints(rig))
        mark("assemble")
        return rigs


def capsule_predictor(train_steps: int = 12, num_embed_sample: int = 64,
                      seed: int = 0, **fixture_kw):
    """Assemble a RigPredictor over the synthetic capsule fixture with briefly
    trained stages (demo/testing helper).  Returns
    (predictor, pose_dataset, rig_dataset)."""
    import jax

    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.data.rig import capsule_rig_dataset
    from morig_tpu.data.skeleton_data import capsule_skel_dataset
    from morig_tpu.train.stages import (
        BoneStage, DeformPoseStage, RigStage, RootStage, SkinStage,
    )

    kw = dict(num_points=64, n_lat=9, n_lon=8)
    kw.update(fixture_kw)
    pose_ds = capsule_pose_dataset(num_models=2, num_frames=6, **kw)
    rig_ds = capsule_rig_dataset(num_models=2, **kw)
    skel_s = capsule_skel_dataset(num_models=2, max_joints=8, **kw)
    pose_b = pose_ds.batch([0, 1], 0, 2)
    rig_b = rig_ds.batch([0, 1])

    rng = jax.random.key(seed)
    deform = DeformPoseStage()
    deform_state = deform.init_state(rng, pose_b)
    joint = RigStage(arch="jointnet", num_embed_sample=num_embed_sample)
    joint_state = joint.init_state(rng, rig_b)
    mask = RigStage(arch="masknet", num_embed_sample=num_embed_sample)
    mask_state = mask.init_state(rng, rig_b)
    skin = SkinStage(num_embed_sample=num_embed_sample)
    skin_state = skin.init_state(rng, rig_b)
    bone = BoneStage()
    bone_state = bone.init_state(rng, skel_s)
    root = RootStage()
    root_state = root.init_state(rng, skel_s)

    r = jax.random.key(seed + 1)
    for _ in range(train_steps):
        r, s = jax.random.split(r)
        joint_state, _ = joint.train_step(joint_state, rig_b, s)
        mask_state, _ = mask.train_step(mask_state, rig_b, s)
        bone_state, _ = bone.train_step(bone_state, skel_s, s)
        root_state, _ = root.train_step(root_state, skel_s, s)

    predictor = RigPredictor(
        deform, deform_state, joint, joint_state, mask, mask_state,
        root, root_state, bone, bone_state, skin, skin_state,
    )
    return predictor, pose_ds, rig_ds
