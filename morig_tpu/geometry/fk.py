"""On-device forward kinematics and linear blend skinning.

The reference walks the joint hierarchy in Python per IK iteration
(utils/deform_ik.py:45-60, utils/rig_parser.py:63-79) — 600 tree walks per
tracked frame.  Here the topology is compiled away: the host extracts static
topological levels once (geometry/skeleton.py Rig.levels), and FK becomes an
unrolled loop of ≤depth batched (3,3) matmuls with scatter updates, fully
inside jit.  LBS is one einsum.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class FKTopology:
    """Static FK schedule for one rig: per-level child/parent index arrays."""

    def __init__(self, parents: np.ndarray):
        parents = np.asarray(parents, int)
        self.parents = parents
        self.root = int(np.argwhere(parents < 0)[0, 0])
        self.num_joints = len(parents)
        levels: List[tuple] = []
        frontier = [self.root]
        while True:
            nxt = [j for j in range(self.num_joints) if parents[j] in frontier]
            if not nxt:
                break
            levels.append((np.asarray(nxt, np.int32), parents[nxt].astype(np.int32)))
            frontier = nxt
        self.levels = levels


def fk(topology: FKTopology, local_rots: jax.Array, offsets: jax.Array,
       root_trans: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics.

    local_rots (J,3,3), offsets (J,3) — rest offsets with the root's offset
    being its rest position (rig_parser.py:52-60).  Returns (G (J,3,3) global
    rotations, q (J,3) joint positions)."""
    J = topology.num_joints
    G = jnp.zeros((J, 3, 3), local_rots.dtype)
    q = jnp.zeros((J, 3), local_rots.dtype)
    G = G.at[topology.root].set(local_rots[topology.root])
    root_q = offsets[topology.root]
    if root_trans is not None:
        root_q = root_q + root_trans
    q = q.at[topology.root].set(root_q)
    for child_idx, parent_idx in topology.levels:
        Gp = G[parent_idx]                               # (L,3,3)
        Gc = Gp @ local_rots[child_idx]
        qc = q[parent_idx] + jnp.einsum("lab,lb->la", Gp, offsets[child_idx])
        G = G.at[child_idx].set(Gc)
        q = q.at[child_idx].set(qc)
    return G, q


def topology_arrays(parents: np.ndarray, max_joints: int):
    """Padded array form of an FK topology for batched/vmapped FK:
    (parents_p (Jmax,) with the root pointing at itself and padded joints at
    themselves, level_of (Jmax,) with root=0 and padded joints=-1, depth)."""
    parents = np.asarray(parents, int)
    J = len(parents)
    root = int(np.argwhere(parents < 0)[0, 0])
    level_of = np.full(max_joints, -1, np.int32)
    level_of[root] = 0
    frontier = [root]
    depth = 0
    while frontier:
        nxt = [j for j in range(J) if parents[j] in frontier]
        depth += 1
        for j in nxt:
            level_of[j] = depth
        frontier = nxt
    parents_p = np.arange(max_joints, dtype=np.int32)
    nonroot = np.argwhere(parents >= 0).reshape(-1)
    parents_p[nonroot] = parents[nonroot]
    return parents_p, level_of, depth


def fk_masked(parents: jax.Array, level_of: jax.Array, local_rots: jax.Array,
              offsets: jax.Array, max_depth: int,
              root_trans: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """FK over an ARRAY topology (vmap-able across rigs with different trees).

    parents (J,) int — root and padded joints point at themselves;
    level_of (J,) int — root 0, padded -1; max_depth static (a shared upper
    bound across the batch).  Same semantics as `fk` for the real joints;
    padded joints keep G = local_rots, q = offsets and are masked downstream
    by zero skin columns."""
    G = local_rots
    q = offsets
    if root_trans is not None:
        q = q + jnp.where((level_of == 0)[:, None], root_trans[None, :], 0.0)
    for lvl in range(1, max_depth + 1):
        sel = level_of == lvl
        Gp = G[parents]                                   # (J,3,3)
        Gc = Gp @ local_rots
        qc = q[parents] + jnp.einsum("jab,jb->ja", Gp, offsets)
        G = jnp.where(sel[:, None, None], Gc, G)
        q = jnp.where(sel[:, None], qc, q)
    return G, q


def fk_masked_doubling(parents: jax.Array, level_of: jax.Array,
                       local_rots: jax.Array, offsets: jax.Array,
                       max_depth: int,
                       root_trans: jax.Array | None = None
                       ) -> tuple[jax.Array, jax.Array]:
    """`fk_masked` via pointer doubling: ceil(log2(depth)) composition steps
    instead of `depth` sequential levels.

    FK is a product of per-joint affines along the root path; affine
    composition is associative, so the product parallelises as the classic
    path-doubling scan: each step composes every joint's accumulated affine
    with its current pointer-ancestor's and squares the pointer.  Per-joint
    ops are identical in size to one `fk_masked` level, so the sequential op
    count — the whole cost of FK inside the 600-iteration IK loop, where
    every op is tiny and latency-bound — drops from `depth` to log2(depth).
    The root's affine is stripped to identity during the scan (so pointers
    parked at the root compose harmlessly) and re-applied once at the end.

    Numerics differ from `fk_masked` only by float re-association (~1e-6).
    Same contract: padded joints (level -1, parent self) return
    G = local_rots, q = offsets."""
    J = local_rots.shape[0]
    is_root = level_of == 0
    is_pad = level_of < 0
    dt = local_rots.dtype

    # child-relative affines; the scan runs with root/pad set to identity
    strip = is_root | is_pad
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), (J, 3, 3))
    R = jnp.where(strip[:, None, None], eye, local_rots)
    t = jnp.where(strip[:, None], 0.0, offsets)

    steps = 0 if max_depth <= 1 else int(np.ceil(np.log2(max_depth)))
    P = parents
    for _ in range(steps):
        Rp, tp = R[P], t[P]
        R = Rp @ R
        t = tp + jnp.einsum("jab,jb->ja", Rp, t)
        P = P[P]

    # apply the single level-0 root's global affine on top of every path
    root_q = offsets
    if root_trans is not None:
        root_q = root_q + root_trans[None, :]
    root_R = jnp.sum(jnp.where(is_root[:, None, None], local_rots, 0.0), 0)
    root_t = jnp.sum(jnp.where(is_root[:, None], root_q, 0.0), 0)
    G = root_R[None] @ R
    q = root_t[None] + jnp.einsum("ab,jb->ja", root_R, t)

    G = jnp.where(is_pad[:, None, None], local_rots, G)
    q = jnp.where(is_pad[:, None], offsets, q)
    return G, q


def lbs_from_local(G: jax.Array, q: jax.Array, vert_local: jax.Array,
                   skins: jax.Array) -> jax.Array:
    """Blend per-joint local vertex coordinates into world positions
    (deform_ik.py:110-111 math): out_v = Σ_j w_vj (G_j x_jv + q_j).

    vert_local (J,V,3), skins (V,J) -> (V,3)."""
    moved = jnp.einsum("jab,jvb->jva", G, vert_local) + q[:, None, :]
    return jnp.einsum("vj,jva->va", skins, moved)


def blend_palette(G: jax.Array, q: jax.Array,
                  ref_G: jax.Array, ref_q: jax.Array) -> jax.Array:
    """Per-joint affine maps from reference-pose world coords to the new
    pose, packed as (J, 12) rows [A row-major | b] with A_j = G_j ref_G_j^T
    and b_j = q_j - A_j ref_q_j (ref_G orthogonal, so A is the exact
    relative transform)."""
    A = jnp.einsum("jab,jcb->jac", G, ref_G)
    b = q - jnp.einsum("jab,jb->ja", A, ref_q)
    return jnp.concatenate([A.reshape(A.shape[0], 9), b], axis=-1)


def lbs_blend(G: jax.Array, q: jax.Array, ref_G: jax.Array, ref_q: jax.Array,
              ref_verts: jax.Array, skins: jax.Array) -> jax.Array:
    """LBS in matrix-palette form: blend the per-joint affines with one
    (V, J) @ (J, 12) matmul, then apply one affine per vertex.  Numerically
    equivalent to ``lbs_from_local(G, q, verts_to_local(ref_G, ref_q,
    ref_verts), skins)`` but with no (J, V, 3) intermediates — this is the
    MXU-friendly form for the 600-iteration IK hot loop
    (eval_tracking.py:56-171 runs the same math vertex-major on CUDA)."""
    P = skins @ blend_palette(G, q, ref_G, ref_q)        # (V, 12)
    M = P[:, :9].reshape(-1, 3, 3)
    return jnp.einsum("vab,vb->va", M, ref_verts) + P[:, 9:]


def verts_to_local(G: jax.Array, q: jax.Array, verts: jax.Array) -> jax.Array:
    """Express world vertices in every joint's local frame (the inverse
    homogeneous transform of eval_tracking.py:60-61): x_jv = G_j^T (v - q_j)."""
    rel = verts[None, :, :] - q[:, None, :]              # (J,V,3)
    return jnp.einsum("jba,jvb->jva", G, rel)            # G^T applied


def lbs_rest(verts: jax.Array, joints: jax.Array, skins: jax.Array,
             G: jax.Array, q: jax.Array) -> jax.Array:
    """LBS directly from rest pose: v' = Σ_j w_vj (G_j (v - p_j) + q_j)."""
    rel = verts[:, None, :] - joints[None, :, :]
    moved = jnp.einsum("jab,vjb->vja", G, rel) + q[None]
    return jnp.einsum("vj,vja->va", skins, moved)
