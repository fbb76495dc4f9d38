"""Skeleton/rig structures and classic skeleton algorithms (host side).

Covers the reference's rig_parser (utils/rig_parser.py: Rig/Info/Skel), the
Prim-MST family and bone helpers (utils/mst_utils.py), and the dup-joint
bookkeeping used in rig assembly (evaluate/joint2rig.py:97-162,363-394).
These operate on tiny J≤~50 graphs and stay on host (SURVEY.md §7 design
move 4); the TPU side only produces the cost matrices and consumes the
resulting static topology.

File format (interoperable with the reference's *_rig.txt / *_skel.txt
outputs, utils/rig_parser.py:22-113):
    joints <name> <x> <y> <z>
    root <name>
    skin <vid> (<joint_name> <w>)*
    hier <parent_name> <child_name>
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class Rig:
    names: List[str]
    pos: np.ndarray                       # (J, 3)
    parents: np.ndarray                   # (J,) int, -1 for root
    skins: Optional[np.ndarray] = None    # (V, J) or None

    # -- basic structure ---------------------------------------------------
    @property
    def num_joints(self) -> int:
        return len(self.names)

    @property
    def root_id(self) -> int:
        return int(np.argwhere(self.parents < 0)[0, 0])

    def children(self, j: int) -> np.ndarray:
        return np.argwhere(self.parents == j).reshape(-1)

    def levels(self) -> List[np.ndarray]:
        """Topological levels (root first) — the static schedule for FK."""
        out = [np.array([self.root_id])]
        while True:
            nxt = np.concatenate([self.children(int(j)) for j in out[-1]]) if len(out[-1]) else np.array([], int)
            if len(nxt) == 0:
                return out
            out.append(nxt)

    def offsets(self) -> np.ndarray:
        off = self.pos.copy()
        nonroot = self.parents >= 0
        off[nonroot] = self.pos[nonroot] - self.pos[self.parents[nonroot]]
        return off

    def adjacency(self) -> np.ndarray:
        A = np.zeros((self.num_joints, self.num_joints))
        nonroot = np.argwhere(self.parents >= 0).reshape(-1)
        A[nonroot, self.parents[nonroot]] = 1.0
        return np.maximum(A, A.T)

    # -- forward kinematics (numpy; device version in geometry/fk.py) ------
    def fk(self, local_rots: np.ndarray, root_trans: Optional[np.ndarray] = None):
        """Global rotations and joint positions from per-joint local rotations
        (rest frames are identity, matching utils/rig_parser.py:52-60)."""
        J = self.num_joints
        G = np.zeros((J, 3, 3), local_rots.dtype)
        q = np.zeros((J, 3), np.float64)
        off = self.offsets()
        for level in self.levels():
            for j in level:
                p = self.parents[j]
                if p < 0:
                    G[j] = local_rots[j]
                    q[j] = self.pos[j] + (root_trans if root_trans is not None else 0.0)
                else:
                    G[j] = G[p] @ local_rots[j]
                    q[j] = q[p] + G[p] @ off[j]
        return G, q

    def global_transforms_homogeneous(self, local_rots=None, root_trans=None) -> np.ndarray:
        if local_rots is None:
            local_rots = np.repeat(np.eye(3)[None], self.num_joints, 0)
        G, q = self.fk(local_rots, root_trans)
        out = np.repeat(np.eye(4)[None], self.num_joints, 0)
        out[:, :3, :3] = G
        out[:, :3, 3] = q
        return out

    # -- IO ----------------------------------------------------------------
    def save(self, path: str) -> None:
        root = self.root_id
        with open(path, "w") as f:
            for name, p in zip(self.names, self.pos):
                f.write(f"joints {name} {p[0]:.8f} {p[1]:.8f} {p[2]:.8f}\n")
            f.write(f"root {self.names[root]}\n")
            if self.skins is not None:
                for vid, row in enumerate(self.skins):
                    active = np.argwhere(row > 0).reshape(-1)
                    entries = " ".join(f"{self.names[j]} {row[j]:.4f}" for j in active)
                    f.write(f"skin {vid} {entries}\n".rstrip() + "\n")
            for level in self.levels():
                for j in level:
                    for c in self.children(int(j)):
                        f.write(f"hier {self.names[j]} {self.names[c]}\n")

    @classmethod
    def load(cls, path: str) -> "Rig":
        names: List[str] = []
        pos: List[np.ndarray] = []
        skin_rows: List[tuple] = []
        hier: List[tuple] = []
        root_name = None
        with open(path) as f:
            for line in f:
                w = line.split()
                if not w:
                    continue
                if w[0] == "joints":
                    names.append(w[1])
                    pos.append(np.array([float(w[2]), float(w[3]), float(w[4])]))
                elif w[0] == "root":
                    root_name = w[1]
                elif w[0] == "skin":
                    skin_rows.append((int(w[1]), w[2:]))
                elif w[0] == "hier":
                    hier.append((w[1], w[2]))
        idx = {n: i for i, n in enumerate(names)}
        parents = np.full(len(names), -1, int)
        for p, c in hier:
            parents[idx[c]] = idx[p]
        skins = None
        if skin_rows:
            nv = max(v for v, _ in skin_rows) + 1
            skins = np.zeros((nv, len(names)))
            for vid, items in skin_rows:
                for i in range(0, len(items), 2):
                    skins[vid, idx[items[i]]] = float(items[i + 1])
        return cls(names=names, pos=np.stack(pos), parents=parents, skins=skins)


# ---------------------------------------------------------------------------
# bones
# ---------------------------------------------------------------------------

def get_bones(rig: Rig):
    """Bone list in BFS order with virtual zero-length leaf bones appended at
    each childless joint (data_proc/gen_skin_data.py:14-37 semantics).
    Returns (bones (B,6), names [(parent,child)], isleaf (B,))."""
    bones, names, isleaf = [], [], []
    for level in rig.levels():
        for j in level:
            for c in rig.children(int(j)):
                bones.append(np.concatenate([rig.pos[j], rig.pos[c]]))
                names.append((rig.names[j], rig.names[c]))
                isleaf.append(False)
                if len(rig.children(int(c))) == 0:
                    bones.append(np.concatenate([rig.pos[c], rig.pos[c]]))
                    names.append((rig.names[c], rig.names[c] + "_leaf"))
                    isleaf.append(True)
    if not bones:  # degenerate single-joint skeleton: one virtual leaf bone
        r = rig.root_id
        bones.append(np.concatenate([rig.pos[r], rig.pos[r]]))
        names.append((rig.names[r], rig.names[r] + "_leaf"))
        isleaf.append(True)
    return np.stack(bones), names, np.asarray(isleaf)


def add_duplicate_joints(rig: Rig) -> Rig:
    """Split branch points: each child of a multi-child joint gets its own
    duplicated parent slightly offset along the bone, so every joint chain is
    unary (joint2rig.py:97-134).  Skins are not carried."""
    names = [rig.names[rig.root_id]]
    pos = [rig.pos[rig.root_id]]
    parents = [-1]
    index = {rig.names[rig.root_id]: 0}
    for level in rig.levels():
        for j in level:
            ch = rig.children(int(j))
            if len(ch) > 1:
                for d, c in enumerate(ch):
                    dup = f"{rig.names[j]}_dup_{d}"
                    pos.append(rig.pos[j] + 0.01 * (rig.pos[c] - rig.pos[j]))
                    names.append(dup)
                    parents.append(index[rig.names[j]])
                    index[dup] = len(names) - 1
                    pos.append(rig.pos[c])
                    names.append(rig.names[c])
                    parents.append(index[dup])
                    index[rig.names[c]] = len(names) - 1
            elif len(ch) == 1:
                c = ch[0]
                pos.append(rig.pos[c])
                names.append(rig.names[c])
                parents.append(index[rig.names[j]])
                index[rig.names[c]] = len(names) - 1
    return Rig(names=names, pos=np.stack(pos), parents=np.asarray(parents, int))


def remove_duplicate_joints(rig: Rig) -> Rig:
    """Inverse of add_duplicate_joints: collapse "_dup" joints, folding their
    skin columns into the parent (joint2rig.py:363-394)."""
    assert rig.skins is not None
    keep_names = [rig.names[rig.root_id]]
    keep_pos = [rig.pos[rig.root_id]]
    keep_parents = [-1]
    keep_skin = [rig.skins[:, rig.root_id].copy()]
    index = {rig.names[rig.root_id]: 0}
    stack = [rig.root_id]
    while stack:
        j = stack.pop(0)
        for c in rig.children(int(j)):
            if "_dup" in rig.names[c]:
                # fold dup's skin into its (kept) parent, promote its child
                keep_skin[index[rig.names[j]]] += rig.skins[:, c]
                for gc in rig.children(int(c)):
                    keep_names.append(rig.names[gc])
                    keep_pos.append(rig.pos[gc])
                    keep_parents.append(index[rig.names[j]])
                    keep_skin.append(rig.skins[:, gc].copy())
                    index[rig.names[gc]] = len(keep_names) - 1
                    stack.append(int(gc))
            else:
                keep_names.append(rig.names[c])
                keep_pos.append(rig.pos[c])
                keep_parents.append(index[rig.names[j]])
                keep_skin.append(rig.skins[:, c].copy())
                index[rig.names[c]] = len(keep_names) - 1
                stack.append(int(c))
    return Rig(
        names=keep_names, pos=np.stack(keep_pos),
        parents=np.asarray(keep_parents, int),
        skins=np.stack(keep_skin, axis=1),
    )


def map_bones(bones_old: np.ndarray, bones_new: np.ndarray) -> np.ndarray:
    """Nearest-bone index map between two bone sets (joint2rig.py:137-144)."""
    d = np.linalg.norm(bones_new[None] - bones_old[:, None], axis=-1)
    return d.argmin(1)


def assemble_skel_skin(skel: Rig, attachment: np.ndarray) -> Rig:
    """Attach per-bone skin weights to a duplicated-joint rig: each bone's
    weight binds to its parent joint name (joint2rig.py:147-162)."""
    bones_old, names_old, _ = get_bones(skel)
    rig_new = add_duplicate_joints(skel)
    bones_new, names_new, _ = get_bones(rig_new)
    mapping = map_bones(bones_old, bones_new)
    idx = {n: i for i, n in enumerate(rig_new.names)}
    V = attachment.shape[0]
    skins = np.zeros((V, rig_new.num_joints))
    for b in range(attachment.shape[1]):
        bind = idx[names_new[mapping[b]][0]]
        skins[:, bind] += np.where(attachment[:, b] > 1e-5, attachment[:, b], 0.0)
    rig_new.skins = skins
    return rig_new


# ---------------------------------------------------------------------------
# Prim MST family
# ---------------------------------------------------------------------------

def prim_mst(cost: np.ndarray, root: int) -> np.ndarray:
    """Dense-graph Prim MST; returns parent array with -1 at root
    (mst_utils.py:73-108 behavior, vectorized)."""
    n = cost.shape[0]
    key = np.full(n, np.inf)
    parent = np.full(n, -1, int)
    in_tree = np.zeros(n, bool)
    key[root] = 0.0
    for _ in range(n):
        u = int(np.argmin(np.where(in_tree, np.inf, key)))
        in_tree[u] = True
        upd = (~in_tree) & (cost[u] > 0) & (cost[u] < key)
        key[upd] = cost[u][upd]
        parent[upd] = u
    parent[root] = -1
    return parent


def side_of(joints: np.ndarray, tol: float = 2e-2) -> np.ndarray:
    """-1 left / 0 middle / +1 right of the x=0 symmetry plane."""
    s = np.zeros(len(joints), int)
    s[joints[:, 0] < -tol] = -1
    s[joints[:, 0] > tol] = 1
    return s


def mirror_map(joints: np.ndarray, tol: float = 2e-2, match_tol: float = 1e-3) -> dict:
    """Map left↔right joints whose mirror images coincide (mst_utils.py:120-136)."""
    s = side_of(joints, tol)
    mapping = {}
    mirrored = joints * np.array([[-1.0, 1.0, 1.0]])
    for i in np.argwhere(s != 0).reshape(-1):
        opp = np.argwhere(s == -s[i]).reshape(-1)
        if len(opp) == 0:
            continue
        d = np.linalg.norm(joints[opp] - mirrored[i], axis=1)
        k = int(np.argmin(d))
        if d[k] < match_tol:
            mapping[int(i)] = int(opp[k])
    return mapping


def prim_mst_symmetry(cost: np.ndarray, root: int, joints: np.ndarray,
                      tol: float = 2e-2) -> tuple[np.ndarray, int]:
    """Symmetry-aware Prim: when a side joint with a mirror twin is attached,
    attach the twin with the mirrored parent in the same step; the root is
    snapped to the nearest middle joint (mst_utils.py:111-219 heuristics)."""
    n = cost.shape[0]
    s = side_of(joints, tol)
    twins = mirror_map(joints, tol)
    mids = np.argwhere(s == 0).reshape(-1)
    if s[root] != 0 and len(mids) > 0:
        root = int(mids[np.argmin(np.linalg.norm(joints[mids] - joints[root], axis=1))])

    key = np.full(n, np.inf)
    parent = np.full(n, -1, int)
    in_tree = np.zeros(n, bool)
    key[root] = 0.0

    def relax(u):
        upd = (~in_tree) & (cost[u] > 0) & (cost[u] < key)
        key[upd] = cost[u][upd]
        parent[upd] = u

    while not in_tree.all():
        u = int(np.argmin(np.where(in_tree, np.inf, key)))
        in_tree[u] = True
        relax(u)
        if s[u] != 0 and u in twins:
            u2 = twins[u]
            p = parent[u]
            if not in_tree[u2] and p >= 0:
                # mirrored parent: twin of p if sided, p itself if middle
                p2 = twins.get(int(p), int(p)) if s[p] != 0 else int(p)
                in_tree[u2] = True
                parent[u2] = p2
                key[u2] = cost[u2, p2]
                relax(u2)
    parent[root] = -1
    return parent, root


def increase_cost_for_outside_bone(cost: np.ndarray, joints: np.ndarray,
                                   inside_frac_fn=None, tol: float = 2e-2,
                                   frac: np.ndarray | None = None) -> np.ndarray:
    """Penalize candidate bones leaving the volume; halve cost between
    middle-plane joints (mst_utils.py:269-291).  `inside_frac_fn(starts, ends)`
    returns the in-volume sample fraction per segment (e.g. the vmapped voxel
    line test, geometry/voxel.py), so the whole J² pair set is one device call;
    alternatively pass precomputed `frac` per upper-triangle pair (row-major,
    the combinations/triu order)."""
    J = len(joints)
    ii, jj = np.triu_indices(J, k=1)
    starts, ends = joints[ii], joints[jj]
    if frac is None:
        frac = np.asarray(inside_frac_fn(starts, ends))
    else:
        frac = np.asarray(frac)[: len(ii)]
    seg_len = np.linalg.norm(ends - starts, axis=1)
    num_samples = np.maximum(np.round(seg_len / 0.01), 1)
    outside = (1.0 - frac) * num_samples
    cost = cost.copy()
    bad = outside > 1
    cost[ii[bad], jj[bad]] = 2.0 * outside[bad]
    cost[jj[bad], ii[bad]] = 2.0 * outside[bad]
    mid = np.abs(joints[:, 0]) < tol
    both_mid = mid[ii] & mid[jj]
    cost[ii[both_mid], jj[both_mid]] *= 0.5
    cost[jj[both_mid], ii[both_mid]] *= 0.5
    return cost


def rig_from_parents(joints: np.ndarray, parents: np.ndarray,
                     names: Optional[Sequence[str]] = None) -> Rig:
    names = list(names) if names is not None else [f"joint_{i}" for i in range(len(joints))]
    return Rig(names=names, pos=np.asarray(joints, float), parents=np.asarray(parents, int))


def prim_mst_middle_first(cost: np.ndarray, root: int, joints: np.ndarray,
                          tol: float = 2e-2) -> tuple[np.ndarray, int]:
    """Prim variant that spans all middle-plane joints before attaching side
    joints (mst_utils.py:222-266); root snapped to the nearest middle joint."""
    n = cost.shape[0]
    s = side_of(joints, tol)
    mids = np.argwhere(s == 0).reshape(-1)
    if s[root] != 0 and len(mids) > 0:
        root = int(mids[np.argmin(np.linalg.norm(joints[mids] - joints[root], axis=1))])
    key = np.full(n, np.inf)
    parent = np.full(n, -1, int)
    in_tree = np.zeros(n, bool)
    key[root] = 0.0

    def pick(cands):
        masked = np.where(in_tree[cands], np.inf, key[cands])
        return int(cands[np.argmin(masked)])

    def relax(u):
        upd = (~in_tree) & (cost[u] > 0) & (cost[u] < key)
        key[upd] = cost[u][upd]
        parent[upd] = u

    while not in_tree[mids].all() if len(mids) else False:
        u = pick(mids)
        in_tree[u] = True
        relax(u)
    while not in_tree.all():
        u = int(np.argmin(np.where(in_tree, np.inf, key)))
        in_tree[u] = True
        relax(u)
    parent[root] = -1
    return parent, root


# ---------------------------------------------------------------------------
# *_skel.txt level format IO (utils/rig_parser.py Skel: "level name x y z parent")
# ---------------------------------------------------------------------------

def save_skel_format(rig: Rig, path: str) -> None:
    with open(path, "w") as f:
        level_of = {int(rig.root_id): 1}
        for depth, level in enumerate(rig.levels(), start=1):
            for j in level:
                parent = rig.parents[j]
                pname = rig.names[parent] if parent >= 0 else "None"
                p = rig.pos[j]
                f.write(f"{depth} {rig.names[j]} {p[0]:8f} {p[1]:8f} {p[2]:8f} {pname}\n")


def load_skel_format(path: str) -> Rig:
    names, pos, parent_names = [], [], []
    with open(path) as f:
        for line in f:
            w = line.split()
            if len(w) < 6:
                continue
            names.append(w[1])
            pos.append([float(w[2]), float(w[3]), float(w[4])])
            parent_names.append(w[5])
    idx = {n: i for i, n in enumerate(names)}
    parents = np.array([idx.get(p, -1) if p != "None" else -1 for p in parent_names], int)
    return Rig(names=names, pos=np.asarray(pos, float), parents=parents)
