"""Joint-extraction clustering: bandwidth estimation, weighted mean-shift,
density NMS, and mirror symmetrization.

Replaces utils/cluster_utils.py:14-63, the torch duplicate in
training/train_rig.py:43-60, sklearn's estimate_bandwidth call
(eval_rigging.py:89), and flip (utils/mst_utils.py:294-313).

TPU design: mean-shift is the O(N²)-per-iteration hot loop — it runs on device
as a fixed-iteration `fori_loop` of (N,N) matmuls with attention weights and a
validity mask (invalid points neither attract nor count).  Bandwidth
estimation is one top-k reduction.  NMS mode extraction is a tiny greedy
sequential pass and stays on host.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.kernels.neighbors import pairwise_sqdist


@partial(jax.jit, static_argnames=("quantile", "sample_rows"))
def estimate_bandwidth(pts: jax.Array, mask: jax.Array | None = None,
                       quantile: float = 0.04,
                       sample_rows: int = 0) -> jax.Array:
    """sklearn-compatible quantile bandwidth: mean over points of the distance
    to their ceil(N*q)-th nearest neighbor (self included), computed over
    valid points only.

    `sample_rows > 0` estimates the mean from a strided row subset — the
    statistic is a MEAN over points of each point's kth-NN distance, so
    row-sampling is an unbiased estimator of the same quantity (the neighbor
    candidate set stays the FULL point set, so the order statistic itself is
    exact per sampled row).  The pipeline uses this (the full (N,N) top-k is
    ~78 ms/iter at B=32, N=3072 on v5e); sklearn-exact tests keep 0."""
    n = pts.shape[0]
    if mask is None:
        mask = jnp.ones(n, bool)
    n_valid = jnp.sum(mask)
    knn = jnp.maximum(1, (n_valid * quantile).astype(jnp.int32))
    if sample_rows and sample_rows < n:
        stride = max(n // sample_rows, 1)
        rows = jax.lax.slice(pts, (0, 0), (n, 3), (stride, 1))
        rmask = jax.lax.slice(mask, (0,), (n,), (stride,))
    else:
        rows, rmask = pts, mask
    nr = rows.shape[0]
    d2 = pairwise_sqdist(rows, pts)
    valid = mask[None, :] & jnp.ones((nr, 1), bool)
    d2 = jnp.where(valid, d2, 1e30)
    from morig_tpu.kernels.neighbors import get_topk_mode

    if get_topk_mode() == "auto":
        # Geometric bisection for the knn-th smallest distance per row: 14
        # counting passes over the (nr, N) matrix instead of approx_top_k's
        # full per-row SORT (23.8 ms -> ~7 ms at bench shapes, and exact to
        # ~0.1% RELATIVE — better than approx_max_k's recall-0.95 upward
        # bias on the order statistic).  Count(d2 <= t) is monotone in t, so
        # bisection on t converges to the knn-th value; the geometric (log-
        # space) midpoint gives relative rather than absolute precision,
        # which matters because the 0.04-quantile NN distance is ~1e-4 while
        # the d2 range is ~4.
        hi = jnp.maximum(jnp.max(jnp.where(valid, d2, 0.0), axis=1), 1e-12)
        lo = hi * 1e-9

        def body(_, lohi):
            lo, hi = lohi
            mid = jnp.sqrt(lo * hi)
            cnt = jnp.sum((d2 <= mid[:, None]).astype(jnp.int32), axis=1)
            ge = cnt >= knn
            return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

        lo, hi = jax.lax.fori_loop(0, 16, body, (lo, hi))
        kth = jnp.sqrt(jnp.sqrt(lo * hi))
    else:
        # exact path: distance to the knn-th neighbor via static top-k of the
        # k_max smallest per row (knn <= k_max, the all-valid count) —
        # sklearn-exact parity (ADVICE r2 #2).
        k_max = max(1, int(n * quantile))
        neg_topk, _ = jax.lax.top_k(-d2, k_max)          # (nr, k_max)
        d_small = -neg_topk
        kth = jnp.sqrt(jnp.maximum(jnp.take_along_axis(
            d_small, jnp.full((nr, 1), knn - 1), axis=1)[:, 0], 0.0))
    m = rmask.astype(kth.dtype)
    return jnp.sum(kth * m) / jnp.maximum(m.sum(), 1.0)


@partial(jax.jit, static_argnames=("num_iter",))
def meanshift_cluster(
    pts: jax.Array,                  # (N, 3)
    bandwidth: jax.Array,
    weights: jax.Array | None = None,  # (N,) importance (attention)
    mask: jax.Array | None = None,     # (N,) validity
    num_iter: int = 30,
    step: float = 0.3,
) -> jax.Array:
    """Weighted flat-kernel mean-shift with the reference's convergence rule.

    Per iteration: kernel K_ij = relu(b² − ||x_i − x_j||²) * w_i (attractor
    weight), columns normalized, each point moves `step` of the way toward its
    kernel-weighted mean; the loop stops when the total displacement norm
    drops under 1e-3 or after `num_iter` passes — exactly
    cluster_utils.py:22-36 (diff > 1e-3 and num_iter < max_iter), which in
    practice converges well before the cap."""
    n = pts.shape[0]
    w = jnp.ones(n, pts.dtype) if weights is None else weights.reshape(n)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)

    def cond(state):
        it, diff, _ = state
        return (diff > 1e-3) & (it < num_iter)

    def body(state):
        it, _, x = state
        d2 = pairwise_sqdist(x, x)
        K = jnp.maximum(bandwidth * bandwidth - d2, 0.0) * w[:, None]
        col = jnp.sum(K, axis=0, keepdims=True)
        P = (K / (col + 1e-10)).T
        x_new = x + step * (P @ x - x)
        diff = jnp.sqrt(jnp.sum((x_new - x) ** 2))
        return it + 1, diff, x_new

    _, _, out = jax.lax.while_loop(cond, body, (jnp.asarray(1), jnp.asarray(1e10), pts))
    return out


def nms_modes(
    pts: np.ndarray,
    attn: np.ndarray,
    bandwidth: float,
    density_threshold: float = 0.02,
    attn_threshold: float = 0.7,
    mask: np.ndarray | None = None,
    counts: np.ndarray | None = None,
    return_density: bool = False,
) -> np.ndarray:
    """Greedy density-sorted mode extraction after mean-shift
    (cluster_utils.py:39-63): visit points by descending neighbor count,
    suppress everything within the bandwidth, keep the visited point as a mode
    if its neighborhood's max attention or density clears the thresholds.

    Distances are computed lazily per visited (alive) point — O(modes * N)
    host work instead of a dense O(N^2) matrix.  `counts` (the visiting
    order) may be precomputed on device (_cluster_static); without it the
    one O(N^2) reduction happens here."""
    pts = np.asarray(pts)
    attn = np.asarray(attn).reshape(-1)
    if mask is not None:
        pts = pts[mask]
        attn = attn[np.asarray(mask)]
        if counts is not None:
            counts = np.asarray(counts)[np.asarray(mask)]
    n = len(pts)
    if n == 0:
        empty = np.zeros((0, 3), np.float32)
        return (empty, np.zeros(0)) if return_density else empty
    if counts is None:
        d2 = ((pts[None] - pts[:, None]) ** 2).sum(-1)
        counts = (d2 <= bandwidth * bandwidth).sum(0)
    order = np.argsort(np.asarray(counts))[::-1]
    bw2 = bandwidth * bandwidth
    alive = np.ones(n, bool)
    keep = np.zeros(n, bool)
    for i in order:
        if not alive[i]:
            continue
        nbrs = ((pts - pts[i]) ** 2).sum(-1) <= bw2
        alive[nbrs] = False
        if attn[nbrs].max() > attn_threshold or nbrs.sum() / n > density_threshold:
            keep[i] = True
    if return_density:
        return pts[keep], np.asarray(counts)[keep]
    return pts[keep]


def symmetrize_reflect(pts: np.ndarray, attn: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Double the point set with its x-mirror before clustering
    (eval_rigging.py:86-88)."""
    mirrored = pts * np.array([[-1.0, 1.0, 1.0]], dtype=pts.dtype)
    return np.concatenate([pts, mirrored], 0), np.concatenate([attn, attn], 0)


def flip_joints(joints: np.ndarray, tol: float = 2e-2,
                extra: np.ndarray | None = None):
    """Mirror left-half joints to the right, snap middle joints to the plane
    (mst_utils.py:294-313).  Returns (joints, side) with side in {-1,0,1};
    with `extra` (per-joint payload, e.g. NMS densities) also returns it
    rearranged alongside — mirrored copies inherit their source's payload."""
    joints = np.asarray(joints, dtype=np.float32)
    is_left = joints[:, 0] < -tol
    is_mid = np.abs(joints[:, 0]) <= tol
    left = joints[is_left]
    middle = joints[is_mid].copy()
    middle[:, 0] = 0.0
    right = left.copy()
    right[:, 0] = -right[:, 0]
    out = np.concatenate([left, middle, right], axis=0)
    side = np.concatenate([
        -np.ones(len(left)), np.zeros(len(middle)), np.ones(len(right))
    ])
    if extra is not None:
        extra = np.asarray(extra)
        extra_out = np.concatenate([extra[is_left], extra[is_mid], extra[is_left]])
        return out, side, extra_out
    return out, side


@partial(jax.jit, static_argnames=("quantile", "num_iter", "sample_rows"))
def _cluster_static(pts: jax.Array, attn: jax.Array, mask: jax.Array,
                    quantile: float, num_iter: int, sample_rows: int = 0):
    """Masked bandwidth + mean-shift + density counts at a static shape.

    The counts (#valid neighbors within the bandwidth after convergence) are
    the NMS visiting order — computing them here keeps the host NMS free of
    any O(N^2) work (it only touches O(N) per surviving mode)."""
    bw = estimate_bandwidth(pts, mask, quantile=quantile,
                            sample_rows=sample_rows)
    moved = meanshift_cluster(pts, bw, attn, mask, num_iter=num_iter)
    d2 = pairwise_sqdist(moved, moved)
    within = (d2 <= bw * bw) & mask[None, :]
    counts = jnp.sum(within, axis=1) * mask
    return moved, bw, counts


@partial(jax.jit, static_argnames=("quantile", "num_iter", "sample_rows"))
def _cluster_static_batch(pts, attn, mask, quantile, num_iter, sample_rows=0):
    return jax.vmap(lambda p, a, m: _cluster_static(p, a, m, quantile, num_iter,
                                                    sample_rows))(
        pts, attn, mask)


@partial(jax.jit, static_argnames=("quantile", "num_iter", "attn_threshold",
                                   "symmetrize", "has_vox", "sample_rows"))
def select_and_cluster(
    shifted: jax.Array,            # (B, V, 3)
    attn: jax.Array,               # (B, V)
    vert_mask: jax.Array,          # (B, V)
    vox_grid: jax.Array | None,    # (B, D, D, D) bool or None
    vox_translate: jax.Array | None,
    vox_scale: jax.Array | None,
    quantile: float = 0.04,
    num_iter: int = 30,
    attn_threshold: float = 0.1,
    symmetrize: bool = True,
    has_vox: bool = False,
    sample_rows: int = 0,
) -> tuple:
    """The entire device end of joint extraction in ONE program: per-sample
    attention min-max (over valid vertices), voxel containment, selection
    mask, reflect symmetrization, masked bandwidth + mean-shift + density
    counts.  Keeping this fused means the only host<->device traffic of the
    joint stage is one download of the five outputs — the Python NMS/flip
    tail works on those.  Returns (moved (B,N,3), bw (B,), counts (B,N),
    attn2 (B,N), sel2 (B,N)) with N = 2V (symmetrized) or V."""
    from morig_tpu.geometry.voxel import inside_check_jax

    def one(s, a, vm, g, tr, sc):
        hi = jnp.max(jnp.where(vm, a, -jnp.inf))
        lo = jnp.min(jnp.where(vm, a, jnp.inf))
        spread = hi - lo
        a_n = jnp.where(spread > 1e-10, (a - lo) / jnp.where(spread > 1e-10, spread, 1.0), a)
        sel = vm & (a_n > attn_threshold)
        if has_vox:
            sel = sel & inside_check_jax(s, g, tr, sc)
        if symmetrize:
            pts2 = jnp.concatenate([s, s * jnp.array([-1.0, 1.0, 1.0], s.dtype)], 0)
            a2 = jnp.concatenate([a_n, a_n])
            sel2 = jnp.concatenate([sel, sel])
        else:
            pts2, a2, sel2 = s, a_n, sel
        moved, bw, counts = _cluster_static(pts2, a2.astype(jnp.float32), sel2,
                                            quantile, num_iter, sample_rows)
        return moved, bw, counts, a2, sel2

    if has_vox:
        return jax.vmap(one)(shifted, attn, vert_mask, vox_grid,
                             vox_translate, vox_scale)
    return jax.vmap(lambda s, a, vm: one(s, a, vm, None, None, None))(
        shifted, attn, vert_mask)


def nms_flip_host(moved, bws, counts, attn2, sel2,
                  density_threshold: float = 0.02,
                  attn_nms_threshold: float = 0.7,
                  symmetrize: bool = True,
                  return_density: bool = False) -> list:
    """Host tail of joint extraction over the fetched select_and_cluster
    outputs: per-mesh NMS + flip.  With return_density, each entry is
    (modes, densities) so callers that must cap the joint count can drop the
    lowest-density modes rather than an arbitrary subset (ADVICE r2 #5)."""
    out = []
    for i in range(len(moved)):
        m = np.asarray(sel2[i])
        if not m.any():
            empty = np.zeros((0, 3), np.float32)
            out.append((empty, np.zeros(0)) if return_density else empty)
            continue
        modes, dens = nms_modes(np.asarray(moved[i])[m], np.asarray(attn2[i])[m],
                                float(bws[i]), density_threshold, attn_nms_threshold,
                                counts=np.asarray(counts[i])[m],
                                return_density=True)
        if symmetrize:
            modes, _, dens = flip_joints(modes, extra=dens)
        out.append((modes, dens) if return_density else modes)
    return out


def extract_joints_batch(
    shifted: np.ndarray,          # (B, V, 3)
    attn: np.ndarray,             # (B, V)
    valid_mask: np.ndarray,       # (B, V)
    inside_fns=None,              # optional per-mesh point-containment fns
    bandwidth_quantile: float = 0.04,
    attn_keep_threshold: float = 0.1,
    density_threshold: float = 0.02,
    attn_nms_threshold: float = 0.7,
    meanshift_iters: int = 30,
    symmetrize: bool = True,
    bandwidth_sample_rows: int = 0,
) -> list:
    """Batched static-shape variant of extract_joints: the padded batch goes
    through ONE jitted bandwidth+mean-shift program (selection as masks, no
    boolean indexing — every mesh costs the same (2V)² program), then host
    NMS/flip per mesh.  Semantics match extract_joints: masked-out points
    neither attract nor count."""
    Bn, V = attn.shape[0], attn.shape[1]
    shifted = np.asarray(shifted, np.float32)
    attn = np.asarray(attn, np.float64)
    sel = np.asarray(valid_mask, bool).copy()
    attn_n = np.zeros_like(attn)
    for i in range(Bn):
        a = attn[i]
        v = sel[i]
        if v.any():
            lo, hi = a[v].min(), a[v].max()
            attn_n[i] = (a - lo) / (hi - lo) if hi - lo > 1e-10 else a
        if inside_fns is not None and inside_fns[i] is not None:
            sel[i] &= np.asarray(inside_fns[i](shifted[i]), bool)
        sel[i] &= attn_n[i] > attn_keep_threshold

    if symmetrize:
        mirror = shifted * np.array([[[-1.0, 1.0, 1.0]]], np.float32)
        pts2 = np.concatenate([shifted, mirror], axis=1)          # (B, 2V, 3)
        attn2 = np.concatenate([attn_n, attn_n], axis=1)
        sel2 = np.concatenate([sel, sel], axis=1)
    else:
        pts2, attn2, sel2 = shifted, attn_n, sel

    moved, bws, counts = _cluster_static_batch(
        jnp.asarray(pts2), jnp.asarray(attn2, jnp.float32), jnp.asarray(sel2),
        bandwidth_quantile, meanshift_iters, bandwidth_sample_rows)
    moved = np.asarray(moved)
    bws = np.asarray(bws)
    counts = np.asarray(counts)

    out = []
    for i in range(Bn):
        m = sel2[i]
        if not m.any():
            out.append(np.zeros((0, 3), np.float32))
            continue
        modes = nms_modes(moved[i][m], attn2[i][m], float(bws[i]),
                          density_threshold, attn_nms_threshold,
                          counts=counts[i][m])
        if symmetrize:
            modes, _ = flip_joints(modes)
        out.append(modes)
    return out


def extract_joints(
    shifted_pts: np.ndarray,
    attn: np.ndarray,
    inside_fn=None,
    bandwidth_quantile: float = 0.04,
    attn_keep_threshold: float = 0.1,
    density_threshold: float = 0.02,
    attn_nms_threshold: float = 0.7,
    meanshift_iters: int = 30,
    symmetrize: bool = True,
    bandwidth_sample_rows: int = 0,
) -> np.ndarray:
    """The full shifted-points→joints procedure of eval_rigging.py:80-95:
    inside-voxel filter → attention min-max + threshold → reflect-symmetrize →
    bandwidth estimate → device mean-shift → host NMS → flip."""
    attn = np.asarray(attn).reshape(-1).astype(np.float64)
    spread = attn.max() - attn.min()
    if spread > 1e-10:  # min-max normalize (eval_rigging.py:72); constant attn kept as-is
        attn = (attn - attn.min()) / spread
    pts = np.asarray(shifted_pts, np.float32)
    if inside_fn is not None:
        ok = inside_fn(pts)
        pts, attn = pts[ok], attn[ok]
    sel = attn > attn_keep_threshold
    pts, attn = pts[sel], attn[sel]
    if len(pts) == 0:
        return np.zeros((0, 3), np.float32)
    if symmetrize:
        pts, attn = symmetrize_reflect(pts, attn)
    bw = float(estimate_bandwidth(jnp.asarray(pts), quantile=bandwidth_quantile,
                                  sample_rows=bandwidth_sample_rows))
    moved = np.asarray(meanshift_cluster(
        jnp.asarray(pts), jnp.asarray(bw), jnp.asarray(attn), num_iter=meanshift_iters
    ))
    modes = nms_modes(moved, attn, bw, density_threshold, attn_nms_threshold)
    if symmetrize:
        modes, _ = flip_joints(modes)
    return modes
