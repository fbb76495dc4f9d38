"""Fused one-hot-matmul gather (kernels/gather_fused.py) and the kNN-kernel
gather extension (knn_fused gather_values) vs exact XLA gathers — Pallas
interpret mode on CPU; hardware runs live in tests_tpu/test_gather_tpu.py.

The kernel reconstructs fp32 values from packed bf16 hi/lo halves, so parity
is to ~2^-17 relative, well inside every consumer's documented tolerance
(torch-parity tier asserts 1e-4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morig_tpu.kernels.gather_fused import gather_rows, hilo_pack
from morig_tpu.kernels.knn_fused import knn_batched


def _rand_vals(B, N, C, seed=0, scale=10.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal((B, N, C)) * scale)
                       .astype(np.float32))


@pytest.mark.parametrize("C", [3, 67])
def test_gather_rows_matches_take(C):
    B, N, M = 2, 64, 48
    v = _rand_vals(B, N, C)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, N, (B, M, 4))
                      .astype(np.int32))
    got = gather_rows(v, idx, interpret=True)
    ref = jax.vmap(lambda vv, ii: vv[ii])(v, idx.reshape(B, -1)).reshape(
        B, M, 4, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_hilo_pack_reconstructs():
    v = _rand_vals(1, 32, 5, seed=2, scale=1000.0)
    p = hilo_pack(v).astype(jnp.float32)
    rec = p[..., :5] + p[..., 5:]
    np.testing.assert_allclose(np.asarray(rec), np.asarray(v), rtol=2e-5)


def test_gather_rows_train_is_exact():
    v = _rand_vals(1, 32, 3, seed=3)
    idx = jnp.asarray(np.random.default_rng(4).integers(0, 32, (1, 16))
                      .astype(np.int32))
    got = gather_rows(v, idx, train=True)
    ref = jax.vmap(lambda vv, ii: vv[ii])(v, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_knn_gather_values_matches_take():
    B, N, P, C, Cv, k = 2, 32, 128, 16, 3, 5
    rng = np.random.default_rng(5)
    q = rng.standard_normal((B, N, C)).astype(np.float32)
    c = rng.standard_normal((B, P, C)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    vals = _rand_vals(B, P, Cv, seed=6)
    m = jnp.asarray(rng.random((B, P)) > 0.3)
    idx, _, gathered = knn_batched(jnp.asarray(q), jnp.asarray(c), k, m,
                                   gather_values=vals, interpret=True)
    ref = jax.vmap(lambda vv, ii: vv[ii])(vals, idx.reshape(B, -1)).reshape(
        B, N, k, Cv)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_knn_gather_values_grad_scatters():
    """d(values) from the gathered output scatter-adds into the selected rows
    only — same cotangent structure as the XLA gather path."""
    B, N, P, C, Cv, k = 1, 16, 128, 8, 3, 3
    rng = np.random.default_rng(7)
    q = rng.standard_normal((B, N, C)).astype(np.float32)
    c = rng.standard_normal((B, P, C)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    vals = _rand_vals(B, P, Cv, seed=8, scale=1.0)
    m = jnp.ones((B, P), bool)
    w = jnp.asarray(rng.standard_normal((B, N, k, Cv)).astype(np.float32))

    def loss(v_):
        _, _, g = knn_batched(jnp.asarray(q), jnp.asarray(c), k, m,
                              gather_values=v_, interpret=True)
        return jnp.sum(g * w)

    gv = jax.grad(loss)(vals)
    idx, _, _ = knn_batched(jnp.asarray(q), jnp.asarray(c), k, m,
                            gather_values=vals, interpret=True)
    ref = jax.vmap(
        lambda i, u: jnp.zeros((P, Cv), jnp.float32).at[
            i.reshape(-1)].add(u.reshape(-1, Cv))
    )(idx, w)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
