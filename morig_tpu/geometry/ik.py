"""Gradient-descent inverse kinematics, fully on device.

Re-design of utils/deform_ik.py:7-117: optimize per-joint euler rotations and
a root translation with Adam so that LBS-posed vertices meet per-vertex
constraints.  The reference runs 200/400 torch-CPU Adam iterations with a
Python FK tree walk per step (eval_tracking.py:62-125); here the whole solve
is one jitted `lax.fori_loop` of fixed length — FK is the path-doubling
composition of geometry/fk.py, the optimizer is a hand-fused Adam with the
reference's grouped learning rates (rotations lr·π, translation lr, weight
decay 1e-4, deform_ik.py:98-101 semantics).

The optimizer is fused on purpose: every IK iteration is a chain of TINY ops
(the largest is the (N, J) @ (J, 12) LBS matmul), so the loop is latency- not
FLOP-bound, and the optax multi_transform/chain tree machinery added ~30
small ops per iteration on top of the gradient.  Packing [rot | trans] into
one (J+1, 3) array with a per-row learning rate reproduces the grouped-lr
update exactly (Adam is elementwise; the lr only scales the final step) in
~12 ops.  `unroll` lets XLA fuse across iterations, amortizing loop
bookkeeping.

Constraints are shape-static: `constraint_idx` selects which vertex each
constraint binds to (identity for stage 1; per-point best-matching vertex for
stage 2) and `weights` carries visibility/validity — masked rows contribute
nothing, replacing the reference's boolean filtering with static shapes
(SURVEY.md §7 hard part #4).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from morig_tpu.geometry.fk import FKTopology, fk, lbs_blend
from morig_tpu.geometry.rotations import euler_to_matrix

_B1, _B2, _EPS = 0.9, 0.999, 1e-8       # optax.adam defaults


@dataclasses.dataclass
class IKConfig:
    iters: int = 200
    lr: float = 5e-2
    weight_decay: float = 1e-4
    vismask_threshold: float = 0.35     # deform_ik.py:8
    w_invis: float = 0.0
    init_angle: float = 0.01            # deform_ik.py:73,97
    unroll: int = 8                     # fori_loop unroll factor


def _run_adam(objective, J: int, cfg: IKConfig):
    """Minimize `objective(theta)` over theta (J+1, 3) = [rot rows | trans
    row] with the grouped-lr Adam of deform_ik.py:98-101.  Numerically
    equivalent to optax.multi_transform({rot: chain(add_decayed_weights(wd),
    adam(lr*pi)), trans: chain(add_decayed_weights(wd), adam(lr))}) on the
    split params — Adam is elementwise, so a per-row lr is the same update —
    but in one fused elementwise block per iteration."""
    lr_row = jnp.concatenate([
        jnp.full((J, 1), cfg.lr * jnp.pi, jnp.float32),
        jnp.full((1, 1), cfg.lr, jnp.float32),
    ])
    theta0 = jnp.full((J + 1, 3), cfg.init_angle, jnp.float32)
    grad_fn = jax.grad(objective)

    def body(i, carry):
        theta, m, v = carry
        g = grad_fn(theta) + cfg.weight_decay * theta
        m = _B1 * m + (1.0 - _B1) * g
        v = _B2 * v + (1.0 - _B2) * g * g
        t = (i + 1).astype(jnp.float32)
        mhat = m / (1.0 - _B1 ** t)
        vhat = v / (1.0 - _B2 ** t)
        theta = theta - lr_row * (mhat / (jnp.sqrt(vhat) + _EPS))
        return theta, m, v

    z = jnp.zeros_like(theta0)
    theta, _, _ = jax.lax.fori_loop(0, cfg.iters, body, (theta0, z, z),
                                    unroll=max(1, cfg.unroll))
    return theta


def make_ik_solver(topology: FKTopology, cfg: IKConfig):
    """Build a jitted IK solve for one rig topology.

    solve(locals_in (J,3,3), offsets (J,3), ref_G (J,3,3), ref_q (J,3),
          ref_verts (V,3), skins (V,J), constraint_idx (N,) int,
          targets (N,3), vismask (N,))
      -> (locals_out (J,3,3), G (J,3,3), q (J,3))

    `ref_G/ref_q/ref_verts` define the reference pose the vertices are bound
    in (what the CUDA path precomputes as per-joint local coords,
    eval_tracking.py:60-61).  The hot loop blends per-joint affines with one
    (N, J) @ (J, 12) matmul over the CONSTRAINED rows only — both the
    constraint gather and the skin-row gather are loop-invariant and hoisted.
    """
    J = topology.num_joints

    @jax.jit
    def solve(locals_in, offsets, ref_G, ref_q, ref_verts, skins,
              constraint_idx, targets, vismask):
        w = jnp.where(vismask > cfg.vismask_threshold, 1.0, cfg.w_invis)
        v_c = ref_verts[constraint_idx]                          # (N,3)
        sk_c = skins[constraint_idx]                             # (N,J)

        def objective(theta):
            R = euler_to_matrix(theta[:J])
            locals_ = R @ locals_in
            G, q = fk(topology, locals_, offsets, theta[J])
            sel = lbs_blend(G, q, ref_G, ref_q, v_c, sk_c)       # (N,3)
            err = jnp.sum((sel - targets) ** 2, axis=-1)
            # mean over N constraints x 3 coords (deform_ik.py:112-113)
            return jnp.mean(err * w) / 3.0

        theta = _run_adam(objective, J, cfg)
        R = euler_to_matrix(theta[:J])
        locals_out = R @ locals_in
        G, q = fk(topology, locals_out, offsets, theta[J])
        return locals_out, G, q

    return solve


def make_ik_solver_masked(max_depth: int, cfg: IKConfig):
    """IK solve over an ARRAY topology (geometry/fk.py fk_masked) — the
    vmap-able form for batched multi-rig tracking.  Same numerics as
    make_ik_solver when `valid` is all-ones and the topology matches.

    solve(locals_in (J,3,3), offsets (J,3), parents (J,), level_of (J,),
          ref_G (J,3,3), ref_q (J,3), ref_verts (V,3), skins (V,J),
          constraint_idx (N,), targets (N,3), vismask (N,), valid (N,))
      -> (locals_out, G, q)
    """
    from morig_tpu.geometry.fk import fk_masked_doubling as fk_masked

    def solve(locals_in, offsets, parents, level_of, ref_G, ref_q, ref_verts,
              skins, constraint_idx, targets, vismask, valid):
        J = locals_in.shape[0]
        w = jnp.where(vismask > cfg.vismask_threshold, 1.0, cfg.w_invis)
        w = w * valid
        denom = 3.0 * jnp.maximum(jnp.sum(valid), 1.0)
        v_c = ref_verts[constraint_idx]                          # (N,3)
        sk_c = skins[constraint_idx]                             # (N,J)

        def objective(theta):
            R = euler_to_matrix(theta[:J])
            locals_ = R @ locals_in
            G, q = fk_masked(parents, level_of, locals_, offsets, max_depth,
                             theta[J])
            sel = lbs_blend(G, q, ref_G, ref_q, v_c, sk_c)       # (N,3)
            err = jnp.sum((sel - targets) ** 2, axis=-1)
            return jnp.sum(err * w) / denom

        theta = _run_adam(objective, J, cfg)
        R = euler_to_matrix(theta[:J])
        locals_out = R @ locals_in
        G, q = fk_masked(parents, level_of, locals_out, offsets, max_depth,
                         theta[J])
        return locals_out, G, q

    return solve


def ik_objective_weights(vismask: jax.Array, threshold: float, w_invis: float) -> jax.Array:
    """Visibility weighting of deform_ik.py:70-71."""
    return jnp.where(vismask > threshold, 1.0, w_invis)
