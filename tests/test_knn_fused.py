"""Fused cosine-kNN kernel (kernels/knn_fused.py) vs the XLA reference path
(kernels/neighbors.py knn) — run in Pallas interpret mode on CPU; the
hardware run lives in tests_tpu/test_knn_fused_tpu.py.

The kernel computes the similarity matmul in bf16 with fp32 accumulation
(the fused edge kernel's precision convention), so the CPU reference here
rounds the inputs to bf16 first: selection and scores then match exactly up
to f32 accumulation order."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morig_tpu.kernels import neighbors as nbk
from morig_tpu.kernels.knn_fused import knn_batched


def _r16(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _xla(q, c, k, m):
    """XLA path on bf16-rounded inputs (the kernel's matmul precision)."""
    return jax.vmap(lambda qq, cc, mm: nbk.knn(qq, cc, k, mm, cosine=True))(
        _r16(q), _r16(c), m)


def _rand(B, N, P, C, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, N, C)).astype(np.float32)
    c = rng.standard_normal((B, P, C)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(c)


@pytest.mark.parametrize("k", [1, 5])
def test_matches_xla(k):
    B, N, P, C = 2, 64, 128, 64
    q, c = _rand(B, N, P, C)
    m = jnp.asarray(np.random.default_rng(1).random((B, P)) > 0.3)
    idx_f, s_f = knn_batched(q, c, k, m, interpret=True)
    idx_x, s_x = _xla(q, c, k, m)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x),
                               rtol=1e-5, atol=1e-5)


def test_fully_masked_rows():
    """All-masked candidate sets return slot 0 with NEG scores (parity with
    argmax-of-all-NEG in the XLA sweeps)."""
    B, N, P, C, k = 1, 8, 128, 8, 3
    q, c = _rand(B, N, P, C, seed=2)
    m = jnp.zeros((B, P), bool)
    idx_f, s_f = knn_batched(q, c, k, m, interpret=True)
    idx_x, s_x = _xla(q, c, k, m)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_x))
    assert (np.asarray(s_f) < -1e29).all()


def test_duplicate_candidates_tie_break():
    """Exact duplicate candidates: first index wins, like argmax."""
    B, N, C, k = 1, 8, 16, 4
    q = jnp.asarray(np.eye(N, C, dtype=np.float32))[None]
    base = np.random.default_rng(3).standard_normal((128, C)).astype(np.float32)
    base[40] = base[7]          # duplicate pair
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    c = jnp.asarray(base)[None]
    m = jnp.ones((B, 128), bool)
    idx_f, _ = knn_batched(q, c, k, m, interpret=True)
    idx_x, _ = _xla(q, c, k, m)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_x))


def test_grad_matches_selected_pairs():
    """The custom VJP puts gradient only into the selected (q, c_idx) pairs —
    identical cotangent structure to the XLA sweep path."""
    B, N, P, C, k = 2, 16, 128, 32, 5
    q, c = _rand(B, N, P, C, seed=4)
    m = jnp.asarray(np.random.default_rng(5).random((B, P)) > 0.2)
    w = jnp.asarray(
        np.random.default_rng(6).standard_normal((B, N, k)).astype(np.float32))

    def loss(q_, c_):
        _, s = knn_batched(q_, c_, k, m, interpret=True)
        return jnp.sum(s * w)

    gq, gc = jax.grad(loss, argnums=(0, 1))(q, c)
    idx, _ = knn_batched(q, c, k, m, interpret=True)
    c_sel = jax.vmap(lambda cc, ii: cc[ii])(c, idx)             # (B,N,k,C)
    gq_ref = jnp.einsum("bnk,bnkc->bnc", w, c_sel)
    gc_ref = jax.vmap(
        lambda i, u: jnp.zeros((P, C), jnp.float32).at[
            i.reshape(-1)].add(u.reshape(-1, C))
    )(idx, w[..., None] * q[:, :, None, :])
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_deformnet_forward_same_flow():
    """DeformNet forward with the fused path (interpret) stays close to the
    XLA f32 path through the full voting/completion chain: the kernel is a
    drop-in whose only divergence is bf16 rounding in the similarity."""
    from morig_tpu.data.pose import capsule_pose_dataset
    from morig_tpu.train.stages import DeformPoseStage

    ds = capsule_pose_dataset(num_models=2, num_frames=3,
                              num_points=128, n_lat=7, n_lon=6)
    b = ds.batch([0, 1], 0, 1)
    stage = DeformPoseStage()
    state = stage.init_state(jax.random.key(0), b)
    vars_ = {"params": state.params, "batch_stats": state.batch_stats}

    flow_x = stage.model.apply(vars_, b.mesh, b.points, False, None)[0]

    from morig_tpu.kernels import knn_fused as kf

    kf.set_knn_impl("fused")       # on CPU this routes through interpret mode
    try:
        flow_f = stage.model.apply(vars_, b.mesh, b.points, False, None)[0]
    finally:
        kf.set_knn_impl("xla")
    np.testing.assert_allclose(np.asarray(flow_f), np.asarray(flow_x),
                               rtol=5e-2, atol=5e-3)
