"""Tests for masked NN building blocks: BN, MLP, EdgeConv/GCU, PointNet++."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morig_tpu.core.batch import MeshBatch, build_mesh, stack_meshes
from morig_tpu.nn.gcu import GCU, GCUMotion, EdgeConv
from morig_tpu.nn.mlp import MLP
from morig_tpu.nn.norm import MaskedBatchNorm
from morig_tpu.nn.pointnet import FPModule, GlobalSAModule, SAModule


def make_mesh(rng, nv=20, pad=32, B=2):
    entries = []
    for _ in range(B):
        v = rng.normal(size=(nv, 3)).astype(np.float32)
        # ring topology edges
        edges = np.stack([np.arange(nv), (np.arange(nv) + 1) % nv], axis=1)
        entries.append(build_mesh(v, edges, edges[::2], pad, 8, 8))
    return stack_meshes(entries)


def test_masked_batchnorm_stats(rng):
    x = rng.normal(size=(2, 10, 4)).astype(np.float32) * 3 + 1
    mask = np.ones((2, 10), dtype=bool)
    mask[1, 5:] = False
    bn = MaskedBatchNorm()
    vars_ = bn.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(mask), True)
    out, new_vars = bn.apply(
        vars_, jnp.asarray(x), jnp.asarray(mask), True, mutable=["batch_stats"]
    )
    out = np.asarray(out)
    valid = x[mask]
    # normalized output over valid elements should be ~zero-mean unit-var
    got = out[mask]
    assert abs(got.mean()) < 1e-4
    assert abs(got.std() - 1.0) < 1e-2
    # running stats moved toward batch stats
    rm = np.asarray(new_vars["batch_stats"]["mean"])
    np.testing.assert_allclose(rm, 0.1 * valid.mean(0), atol=1e-4)


def test_masked_batchnorm_ignores_padding(rng):
    """Changing padded values must not change valid outputs."""
    x = rng.normal(size=(1, 8, 4)).astype(np.float32)
    mask = np.ones((1, 8), dtype=bool)
    mask[0, 6:] = False
    bn = MaskedBatchNorm()
    v = bn.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(mask), True)
    out1, _ = bn.apply(v, jnp.asarray(x), jnp.asarray(mask), True, mutable=["batch_stats"])
    x2 = x.copy()
    x2[0, 6:] = 100.0
    out2, _ = bn.apply(v, jnp.asarray(x2), jnp.asarray(mask), True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1)[0, :6], np.asarray(out2)[0, :6], atol=1e-5)


def test_edgeconv_matches_oracle(rng):
    """EdgeConv (eval mode, identity BN stats) vs explicit numpy aggregation."""
    from morig_tpu.nn import mlp as mlp_mod

    mesh = make_mesh(rng)
    x = jnp.asarray(rng.normal(size=(2, 32, 6)).astype(np.float32))
    conv = EdgeConv([8, 8])
    mlp_mod.set_default_norm("batch")
    try:
        v = conv.init(jax.random.key(1), x, mesh.tpl_nbr, mesh.tpl_mask, False)
        out = conv.apply(v, x, mesh.tpl_nbr, mesh.tpl_mask, False)
    finally:
        mlp_mod.set_default_norm("layer")
    assert out.shape == (2, 32, 8)
    # oracle for vertex 3 of sample 0: reconstruct the *reference* concat-MLP
    # weights from the decomposed parameterization W1 = U + W2, W2 = lin_nbr
    p = v["params"]["nn_pos"]
    U = np.asarray(p["lin_self"]["kernel"])       # W1 - W2
    b0 = np.asarray(p["lin_self"]["bias"])
    W2 = np.asarray(p["lin_nbr"]["kernel"])
    W1 = U + W2

    def bn_np(h, i):
        bs = v["batch_stats"]["nn_pos"][f"norm_{i}"]["bn"]
        pp = v["params"]["nn_pos"][f"norm_{i}"]["bn"]
        return (h - np.asarray(bs["mean"])) / np.sqrt(np.asarray(bs["var"]) + 1e-5) \
            * np.asarray(pp["scale"]) + np.asarray(pp["bias"])

    def mlp_np(xi, xj):
        # reference message: MLP([x_i, x_j - x_i]) with W = [W1; W2]
        h = np.maximum(xi @ W1 + (xj - xi) @ W2 + b0, 0)
        h = bn_np(h, 0)
        W = np.asarray(p["dense_1"]["kernel"])
        b = np.asarray(p["dense_1"]["bias"])
        h = np.maximum(h @ W + b, 0)
        return bn_np(h, 1)

    xi = np.asarray(x)[0, 3]
    msgs = []
    nbr = np.asarray(mesh.tpl_nbr)[0, 3]
    m = np.asarray(mesh.tpl_mask)[0, 3]
    for j, ok in zip(nbr, m):
        if ok:
            msgs.append(mlp_np(xi, np.asarray(x)[0, j]))
    want = np.max(np.stack(msgs), axis=0)
    np.testing.assert_allclose(np.asarray(out)[0, 3], want, atol=1e-4)


def test_gcu_shapes_and_padding_invariance(rng):
    mesh = make_mesh(rng, nv=20, pad=32)
    x = rng.normal(size=(2, 32, 3)).astype(np.float32)
    x[:, 20:] = 0.0
    gcu = GCU(out_channels=16)
    v = gcu.init(jax.random.key(0), jnp.asarray(x), mesh, False)
    out1 = gcu.apply(v, jnp.asarray(x), mesh, False)
    assert out1.shape == (2, 32, 16)
    # perturb padded vertices: valid outputs unchanged
    x2 = x.copy()
    x2[:, 20:] = 9.0
    out2 = gcu.apply(v, jnp.asarray(x2), mesh, False)
    np.testing.assert_allclose(np.asarray(out1)[:, :20], np.asarray(out2)[:, :20], atol=1e-4)


def test_gcumotion_runs(rng):
    mesh = make_mesh(rng)
    pos = mesh.verts
    x = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
    m = GCUMotion(out_channels=16, dim_pos_feat=8)
    v = m.init(jax.random.key(0), pos, x, mesh, False)
    out = m.apply(v, pos, x, mesh, False)
    assert out.shape == (2, 32, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pointnet_stack(rng):
    B, P = 2, 64
    pos = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    mask = jnp.ones((B, P), dtype=bool)
    sa = SAModule(num_out=16, radius=1.0, mlp_channels=[8, 8], max_neighbors=8)
    v = sa.init(jax.random.key(0), None, pos, mask, False)
    x1, p1, m1 = sa.apply(v, None, pos, mask, False)
    assert x1.shape == (B, 16, 8) and p1.shape == (B, 16, 3)

    gsa = GlobalSAModule([8, 8])
    vg = gsa.init(jax.random.key(1), x1, p1, m1, False)
    xg = gsa.apply(vg, x1, p1, m1, False)
    assert xg.shape == (B, 8)

    fp = FPModule(k=3, mlp_channels=[8])
    vf = fp.init(jax.random.key(2), x1, p1, m1, None, pos, mask, False)
    xf, pf, mf = fp.apply(vf, x1, p1, m1, None, pos, mask, False)
    assert xf.shape == (B, P, 8)

    # global broadcast path
    fp2 = FPModule(k=1, mlp_channels=[4])
    vf2 = fp2.init(jax.random.key(3), xg, None, None, x1, p1, m1, False)
    xf2, _, _ = fp2.apply(vf2, xg, None, None, x1, p1, m1, False)
    assert xf2.shape == (B, 16, 4)
