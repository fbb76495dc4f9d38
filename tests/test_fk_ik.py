"""Rotation conversions, device FK/LBS vs numpy oracle, IK convergence."""
import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.data.synthetic import fk_numpy, lbs_numpy, make_capsule_rig, rotz
from morig_tpu.geometry.fk import (FKTopology, fk, lbs_blend, lbs_from_local,
                                   lbs_rest, verts_to_local)
from morig_tpu.geometry.ik import IKConfig, make_ik_solver
from morig_tpu.geometry.rotations import (
    euler_to_matrix, matrix_to_6d, matrix_to_euler, matrix_to_quaternion,
    quaternion_to_matrix, sixd_to_matrix,
)


def test_rotation_roundtrips(rng):
    angles = jnp.asarray(rng.uniform(-1.2, 1.2, size=(10, 3)).astype(np.float32))
    R = euler_to_matrix(angles)
    # orthonormality
    eye = jnp.einsum("nab,ncb->nac", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.eye(3)[None].repeat(10, 0), atol=1e-5)
    # euler roundtrip
    back = matrix_to_euler(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(angles), atol=1e-4)
    # 6d roundtrip
    R2 = sixd_to_matrix(matrix_to_6d(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # quaternion roundtrip
    R3 = quaternion_to_matrix(matrix_to_quaternion(R))
    np.testing.assert_allclose(np.asarray(R3), np.asarray(R), atol=1e-4)


def test_quaternion_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    angles = rng.uniform(-2, 2, size=(8, 3)).astype(np.float32)
    R = np.asarray(euler_to_matrix(jnp.asarray(angles)))
    q = np.asarray(matrix_to_quaternion(jnp.asarray(R)))
    q_ref = Rotation.from_matrix(R).as_quat()
    # quaternions are sign-ambiguous
    sign = np.sign((q * q_ref).sum(-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q_ref, atol=1e-4)


def test_device_fk_matches_oracle():
    cap = make_capsule_rig(9, 8)
    topo = FKTopology(cap.parents)
    locals_ = np.stack([rotz(0.2), rotz(0.6), rotz(-0.4)]).astype(np.float32)
    offsets = cap.joints.copy()
    offsets[1:] = cap.joints[1:] - cap.joints[cap.parents[1:]]
    G, q = fk(topo, jnp.asarray(locals_), jnp.asarray(offsets))
    G2, q2 = fk_numpy(cap.joints, cap.parents, locals_)
    np.testing.assert_allclose(np.asarray(G), G2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q), q2, atol=1e-5)

    # LBS from rest matches oracle
    posed = lbs_rest(jnp.asarray(cap.verts), jnp.asarray(cap.joints),
                     jnp.asarray(cap.skins), G, q)
    posed2 = lbs_numpy(cap.verts, cap.joints, cap.parents, cap.skins, locals_)
    np.testing.assert_allclose(np.asarray(posed), posed2, atol=1e-4)


def test_local_roundtrip():
    """verts -> joint-local coords -> LBS with identity pose reproduces verts."""
    cap = make_capsule_rig(9, 8)
    topo = FKTopology(cap.parents)
    eye = jnp.asarray(np.repeat(np.eye(3, dtype=np.float32)[None], 3, 0))
    offsets = cap.joints.copy()
    offsets[1:] = cap.joints[1:] - cap.joints[cap.parents[1:]]
    G, q = fk(topo, eye, jnp.asarray(offsets))
    local = verts_to_local(G, q, jnp.asarray(cap.verts))
    back = lbs_from_local(G, q, local, jnp.asarray(cap.skins))
    np.testing.assert_allclose(np.asarray(back), cap.verts, atol=1e-5)


def test_lbs_blend_matches_from_local():
    """Matrix-palette LBS must equal the (J,V,3) joint-local formulation for
    an arbitrary pose, binding in an arbitrary (non-identity) reference."""
    cap = make_capsule_rig(9, 8)
    topo = FKTopology(cap.parents)
    offsets = cap.joints.copy()
    offsets[1:] = cap.joints[1:] - cap.joints[cap.parents[1:]]
    ref_locals = np.stack([rotz(0.2), rotz(-0.4), rotz(0.1)])
    refG, refq = fk(topo, jnp.asarray(ref_locals), jnp.asarray(offsets))
    ref_verts = lbs_numpy(cap.verts, cap.joints, cap.parents, cap.skins,
                          ref_locals).astype(np.float32)
    new_locals = np.stack([rotz(-0.3), rotz(0.5), rotz(0.25)])
    G, q = fk(topo, jnp.asarray(new_locals), jnp.asarray(offsets))
    skins = jnp.asarray(cap.skins)
    vl = verts_to_local(refG, refq, jnp.asarray(ref_verts))
    want = np.asarray(lbs_from_local(G, q, vl, skins))
    got = np.asarray(lbs_blend(G, q, refG, refq, jnp.asarray(ref_verts), skins))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ik_recovers_bend():
    """IK must recover vertex positions of a known bend of the capsule."""
    cap = make_capsule_rig(9, 8)
    topo = FKTopology(cap.parents)
    eye = np.repeat(np.eye(3, dtype=np.float32)[None], 3, 0)
    offsets = cap.joints.copy()
    offsets[1:] = cap.joints[1:] - cap.joints[cap.parents[1:]]
    target_locals = np.stack([np.eye(3, dtype=np.float32), rotz(0.5), rotz(0.3)])
    targets = lbs_numpy(cap.verts, cap.joints, cap.parents, cap.skins, target_locals)

    G0, q0 = fk(topo, jnp.asarray(eye), jnp.asarray(offsets))
    rest_v = jnp.asarray(cap.verts)
    solver = make_ik_solver(topo, IKConfig(iters=300, lr=5e-2))
    V = len(cap.verts)
    locals_out, G, q = solver(
        jnp.asarray(eye), jnp.asarray(offsets), G0, q0, rest_v,
        jnp.asarray(cap.skins),
        jnp.arange(V), jnp.asarray(targets.astype(np.float32)), jnp.ones(V),
    )
    posed = np.asarray(lbs_blend(G, q, G0, q0, rest_v, jnp.asarray(cap.skins)))
    err = np.linalg.norm(posed - targets, axis=1).mean()
    init_err = np.linalg.norm(cap.verts - targets, axis=1).mean()
    assert err < 0.1 * init_err, (err, init_err)


def test_ik_ignores_invisible():
    """Constraints with vismask below threshold must not affect the solve."""
    cap = make_capsule_rig(9, 8)
    topo = FKTopology(cap.parents)
    eye = np.repeat(np.eye(3, dtype=np.float32)[None], 3, 0)
    offsets = cap.joints.copy()
    offsets[1:] = cap.joints[1:] - cap.joints[cap.parents[1:]]
    G0, q0 = fk(topo, jnp.asarray(eye), jnp.asarray(offsets))
    rest_v = jnp.asarray(cap.verts)
    solver = make_ik_solver(topo, IKConfig(iters=50, lr=5e-2, w_invis=0.0))
    V = len(cap.verts)
    targets = cap.verts.copy()
    garbage = targets.copy()
    garbage[: V // 2] = 99.0  # invisible garbage targets
    vis = np.ones(V)
    vis[: V // 2] = 0.0
    _, G1, q1 = solver(jnp.asarray(eye), jnp.asarray(offsets), G0, q0, rest_v,
                       jnp.asarray(cap.skins), jnp.arange(V),
                       jnp.asarray(garbage.astype(np.float32)), jnp.asarray(vis))
    _, G2, q2 = solver(jnp.asarray(eye), jnp.asarray(offsets), G0, q0, rest_v,
                       jnp.asarray(cap.skins), jnp.arange(V),
                       jnp.asarray(targets.astype(np.float32)), jnp.asarray(vis))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)


def test_fk_doubling_matches_masked():
    """Path-doubling FK == level-unrolled masked FK on random trees with
    padding, including root translation (the IK hot-loop replacement)."""
    import jax
    import jax.numpy as jnp

    from morig_tpu.geometry.fk import (
        fk_masked, fk_masked_doubling, topology_arrays,
    )

    rng = np.random.default_rng(7)
    for J, Jm in [(1, 4), (2, 4), (7, 8), (22, 48), (31, 32)]:
        parents = np.full(J, -1, int)
        for j in range(1, J):
            parents[j] = rng.integers(0, j)      # random tree, root at 0
        p, lv, depth = topology_arrays(parents, Jm)
        rots = np.linalg.qr(rng.normal(size=(Jm, 3, 3)))[0].astype(np.float32)
        offs = rng.normal(size=(Jm, 3)).astype(np.float32)
        tr = rng.normal(size=(3,)).astype(np.float32)
        for root_trans in (None, jnp.asarray(tr)):
            Ga, qa = fk_masked(jnp.asarray(p), jnp.asarray(lv),
                               jnp.asarray(rots), jnp.asarray(offs),
                               depth, root_trans)
            Gb, qb = fk_masked_doubling(jnp.asarray(p), jnp.asarray(lv),
                                        jnp.asarray(rots), jnp.asarray(offs),
                                        depth, root_trans)
            np.testing.assert_allclose(np.asarray(Ga), np.asarray(Gb),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                                       atol=2e-4)


def test_fk_doubling_grad_matches():
    """Autodiff through the doubling scan matches the level-unrolled path."""
    import jax
    import jax.numpy as jnp

    from morig_tpu.geometry.fk import (
        fk_masked, fk_masked_doubling, topology_arrays,
    )

    rng = np.random.default_rng(3)
    J, Jm = 9, 16
    parents = np.full(J, -1, int)
    for j in range(1, J):
        parents[j] = rng.integers(0, j)
    p, lv, depth = topology_arrays(parents, Jm)
    rots = np.linalg.qr(rng.normal(size=(Jm, 3, 3)))[0].astype(np.float32)
    offs = rng.normal(size=(Jm, 3)).astype(np.float32)

    def loss(fn, r, o):
        G, q = fn(jnp.asarray(p), jnp.asarray(lv), r, o, depth)
        return jnp.sum(G ** 2) + jnp.sum(jnp.sin(q))

    ga = jax.grad(lambda r, o: loss(fk_masked, r, o), argnums=(0, 1))(
        jnp.asarray(rots), jnp.asarray(offs))
    gb = jax.grad(lambda r, o: loss(fk_masked_doubling, r, o), argnums=(0, 1))(
        jnp.asarray(rots), jnp.asarray(offs))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_adam_matches_optax():
    """The hand-fused grouped-lr Adam in geometry/ik.py must reproduce the
    optax construction it replaced (multi_transform over {rot: chain(
    add_decayed_weights(wd), adam(lr*pi)), trans: chain(add_decayed_weights(
    wd), adam(lr))}) — Adam is elementwise, so the packed (J+1, 3) form with
    a per-row lr is the same update."""
    import optax

    from morig_tpu.geometry.ik import _run_adam

    J = 4
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(size=(J + 1, 3, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(J + 1, 3)).astype(np.float32))

    def objective(theta):
        return jnp.sum((jnp.einsum("jab,jb->ja", A, theta) - b) ** 2)

    cfg = IKConfig(iters=60, lr=5e-2, weight_decay=1e-4, unroll=4)
    theta_fused = _run_adam(objective, J, cfg)

    # optax replica of the pre-fusion construction
    rot_tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                         optax.adam(cfg.lr * jnp.pi))
    trans_tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                           optax.adam(cfg.lr))
    tx = optax.multi_transform({"rot": rot_tx, "trans": trans_tx},
                               {"rot": "rot", "trans": "trans"})
    params = {"rot": jnp.full((J, 3), cfg.init_angle, jnp.float32),
              "trans": jnp.full((3,), cfg.init_angle, jnp.float32)}
    opt_state = tx.init(params)
    grad_fn = jax.grad(
        lambda p: objective(jnp.concatenate([p["rot"], p["trans"][None]], 0)))
    for _ in range(cfg.iters):
        g = grad_fn(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
    theta_ref = jnp.concatenate([params["rot"], params["trans"][None]], 0)
    np.testing.assert_allclose(np.asarray(theta_fused), np.asarray(theta_ref),
                               rtol=2e-5, atol=2e-6)
