"""Gradient-descent inverse kinematics, fully on device.

Re-design of utils/deform_ik.py:7-117: optimize per-joint euler rotations and
a root translation with Adam so that LBS-posed vertices meet per-vertex
constraints.  The reference runs 200/400 torch-CPU Adam iterations with a
Python FK tree walk per step (eval_tracking.py:62-125); here the whole solve
is one jitted `lax.fori_loop` of fixed length — FK is the unrolled level
schedule of geometry/fk.py, the optimizer is optax Adam with the reference's
grouped learning rates (rotations lr·π, translation lr, weight decay 1e-4).

Constraints are shape-static: `constraint_idx` selects which vertex each
constraint binds to (identity for stage 1; per-point best-matching vertex for
stage 2) and `weights` carries visibility/validity — masked rows contribute
nothing, replacing the reference's boolean filtering with static shapes
(SURVEY.md §7 hard part #4).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from morig_tpu.geometry.fk import FKTopology, fk, lbs_blend
from morig_tpu.geometry.rotations import euler_to_matrix


@dataclasses.dataclass
class IKConfig:
    iters: int = 200
    lr: float = 5e-2
    weight_decay: float = 1e-4
    vismask_threshold: float = 0.35     # deform_ik.py:8
    w_invis: float = 0.0
    init_angle: float = 0.01            # deform_ik.py:73,97


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

    rot_tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                         optax.adam(cfg.lr * jnp.pi))
    trans_tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                           optax.adam(cfg.lr))
    tx = optax.multi_transform(
        {"rot": rot_tx, "trans": trans_tx},
        {"rot": "rot", "trans": "trans"},
    )

    @jax.jit
    def solve(locals_in, offsets, ref_G, ref_q, ref_verts, skins,
              constraint_idx, targets, vismask):
        w = jnp.where(vismask > cfg.vismask_threshold, 1.0, cfg.w_invis)
        v_c = ref_verts[constraint_idx]                          # (N,3)
        sk_c = skins[constraint_idx]                             # (N,J)

        def objective(params):
            R = euler_to_matrix(params["rot"])
            locals_ = R @ locals_in
            G, q = fk(topology, locals_, offsets, params["trans"])
            sel = lbs_blend(G, q, ref_G, ref_q, v_c, sk_c)       # (N,3)
            err = jnp.sum((sel - targets) ** 2, axis=-1)
            # mean over N constraints x 3 coords (deform_ik.py:112-113)
            return jnp.mean(err * w) / 3.0

        params = {
            "rot": jnp.full((J, 3), cfg.init_angle, jnp.float32),
            "trans": jnp.full((3,), cfg.init_angle, jnp.float32),
        }
        opt_state = tx.init(params)
        grad_fn = jax.grad(objective)

        def body(_, carry):
            params, opt_state = carry
            g = grad_fn(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, cfg.iters, body, (params, opt_state))
        R = euler_to_matrix(params["rot"])
        locals_out = R @ locals_in
        G, q = fk(topology, locals_out, offsets, params["trans"])
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

    rot_tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                         optax.adam(cfg.lr * jnp.pi))
    trans_tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                           optax.adam(cfg.lr))
    tx = optax.multi_transform(
        {"rot": rot_tx, "trans": trans_tx},
        {"rot": "rot", "trans": "trans"},
    )

    def solve(locals_in, offsets, parents, level_of, ref_G, ref_q, ref_verts,
              skins, constraint_idx, targets, vismask, valid):
        J = locals_in.shape[0]
        w = jnp.where(vismask > cfg.vismask_threshold, 1.0, cfg.w_invis)
        w = w * valid
        denom = 3.0 * jnp.maximum(jnp.sum(valid), 1.0)
        v_c = ref_verts[constraint_idx]                          # (N,3)
        sk_c = skins[constraint_idx]                             # (N,J)

        def objective(params):
            R = euler_to_matrix(params["rot"])
            locals_ = R @ locals_in
            G, q = fk_masked(parents, level_of, locals_, offsets, max_depth,
                             params["trans"])
            sel = lbs_blend(G, q, ref_G, ref_q, v_c, sk_c)       # (N,3)
            err = jnp.sum((sel - targets) ** 2, axis=-1)
            return jnp.sum(err * w) / denom

        params = {
            "rot": jnp.full((J, 3), cfg.init_angle, jnp.float32),
            "trans": jnp.full((3,), cfg.init_angle, jnp.float32),
        }
        opt_state = tx.init(params)
        grad_fn = jax.grad(objective)

        def body(_, carry):
            params, opt_state = carry
            g = grad_fn(params)
            updates, opt_state = tx.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, cfg.iters, body, (params, opt_state))
        R = euler_to_matrix(params["rot"])
        locals_out = R @ locals_in
        G, q = fk_masked(parents, level_of, locals_out, offsets, max_depth,
                         params["trans"])
        return locals_out, G, q

    return solve


def ik_objective_weights(vismask: jax.Array, threshold: float, w_invis: float) -> jax.Array:
    """Visibility weighting of deform_ik.py:70-71."""
    return jnp.where(vismask > threshold, 1.0, w_invis)
