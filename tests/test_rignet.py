"""Rig net module tests: TemporalAttn, JointNet/MaskNet/SkinMotion forwards."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morig_tpu.core.batch import build_mesh, stack_meshes
from morig_tpu.nn.rignet import (
    JointNetMotion, MaskNetMotion, SkinMotion, TemporalAttn, slice_skin_descriptor,
)

pytestmark = pytest.mark.slow


def make_mesh(rng, nv=20, pad=32, B=2):
    entries = []
    for _ in range(B):
        v = rng.normal(size=(nv, 3)).astype(np.float32)
        edges = np.stack([np.arange(nv), (np.arange(nv) + 1) % nv], axis=1)
        entries.append(build_mesh(v, edges, edges[::2], pad, 8, 8))
    return stack_meshes(entries)


def test_temporal_attn_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 5, 32)).astype(np.float32))
    mask = jnp.ones((2, 16), bool)
    m = TemporalAttn(output_size=64)
    v = m.init(jax.random.key(0), x, mask, False)
    out = m.apply(v, x, mask, False)
    assert out.shape == (2, 16, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_jointnet_and_masknet(rng):
    mesh = make_mesh(rng)
    flow = jnp.asarray(rng.normal(size=(2, 32, 15)).astype(np.float32))
    jn = JointNetMotion(num_keyframes=5)
    v = jn.init(jax.random.key(0), flow, mesh, False)
    motion_all, motion_aggr, shift = jn.apply(v, flow, mesh, False)
    assert motion_all.shape == (2, 32, 5, 32)
    assert motion_aggr.shape == (2, 32, 64)
    assert shift.shape == (2, 32, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(motion_aggr), axis=-1), 1.0, atol=1e-4)

    mn = MaskNetMotion(num_keyframes=5)
    vm = mn.init(jax.random.key(1), flow, mesh, False)
    _, _, logits = mn.apply(vm, flow, mesh, False)
    assert logits.shape == (2, 32, 1)


def test_skin_descriptor_slicing(rng):
    x = rng.normal(size=(4, 5 * 8)).astype(np.float32)
    full = np.asarray(slice_skin_descriptor(jnp.asarray(x), 5, True, True))
    assert full.shape == (4, 40)
    np.testing.assert_allclose(full, x)
    no_flags = np.asarray(slice_skin_descriptor(jnp.asarray(x), 5, False, False))
    assert no_flags.shape == (4, 30)
    # columns 0..5 of each bone survive
    np.testing.assert_allclose(no_flags[:, :6], x[:, :6])
    dg = np.asarray(slice_skin_descriptor(jnp.asarray(x), 5, True, False))
    assert dg.shape == (4, 35)
    np.testing.assert_allclose(dg[:, 6], x[:, 6])


def test_skin_motion_forward(rng):
    mesh = make_mesh(rng)
    flow = jnp.asarray(rng.normal(size=(2, 32, 15)).astype(np.float32))
    skin_input = jnp.asarray(rng.normal(size=(2, 32, 40)).astype(np.float32))
    sm = SkinMotion(nearest_bone=5, num_keyframes=5)
    v = sm.init(jax.random.key(0), skin_input, flow, mesh, False)
    motion_all, motion_aggr, logits = sm.apply(v, skin_input, flow, mesh, False)
    assert logits.shape == (2, 32, 5)
    assert motion_aggr.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(logits)).all()


def test_motion_aggregator_fold_matches_loop():
    """Folding the keyframe axis into the batch (one trunk launch) must equal
    the per-frame loop exactly under LayerNorm — per-row statistics make the
    two orderings the same computation."""
    import jax
    import jax.numpy as jnp

    from morig_tpu.core import batch as B
    from morig_tpu.data.rig import capsule_rig_dataset
    from morig_tpu.nn.rignet import MotionAggregator

    ds = capsule_rig_dataset(num_models=2, num_points=48, n_lat=7, n_lon=6)
    rb = ds.batch([0, 1])
    T = 3
    V = rb.mesh.verts.shape[1]
    flow = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, V, 3 * T)), jnp.float32)

    folded = MotionAggregator(num_keyframes=T, fold_time=True)
    looped = MotionAggregator(num_keyframes=T, fold_time=False)
    vs = folded.init(jax.random.key(0), flow, rb.mesh, False)

    @jax.jit
    def run(vs, flow, mesh):
        a_all, a_aggr = folded.apply(vs, flow, mesh, False)
        b_all, b_aggr = looped.apply(vs, flow, mesh, False)
        return a_all, a_aggr, b_all, b_aggr

    a_all, a_aggr, b_all, b_aggr = run(vs, flow, rb.mesh)
    np.testing.assert_allclose(np.asarray(a_all), np.asarray(b_all),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_aggr), np.asarray(b_aggr),
                               rtol=1e-5, atol=1e-5)
