"""Fused cosine-kNN kernel on the real chip: Mosaic-compiled output equals
the XLA sweep path at bench-like shapes, and the kernel wins on wall-clock
(it exists to kill the (V,P) HBM materializations of nn/deformnet.py:95,109
and nn/corrnet.py:144)."""
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morig_tpu.kernels import neighbors as nbk
from morig_tpu.kernels.knn_fused import _fused_vjp, knn_batched


def _xla(q, c, k, m):
    return jax.jit(jax.vmap(
        lambda qq, cc, mm: nbk.knn(qq, cc, k, mm, cosine=True)),
        static_argnums=())(q, c, m)


def _rand(B, N, P, C, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, N, C)).astype(np.float32)
    c = rng.standard_normal((B, P, C)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(c)


@pytest.mark.parametrize("shape", [(4, 512, 512, 64), (2, 1536, 1024, 64)])
def test_hardware_matches_xla(shape):
    B, N, P, C = shape
    k = 5
    q, c = _rand(B, N, P, C)
    m = jnp.asarray(np.random.default_rng(1).random((B, P)) > 0.25)
    idx_f, s_f = _fused_vjp(q, c, m, k, False)
    r16 = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    idx_x, s_x = _xla(r16(q), r16(c), k, m)   # kernel matmul precision
    idx_f, s_f, idx_x, s_x = map(np.asarray, (idx_f, s_f, idx_x, s_x))
    # MXU accumulation order differs from the XLA einsum: allow rare
    # near-tie index flips but demand matching scores everywhere
    mismatch = (idx_f != idx_x).mean()
    assert mismatch < 2e-2, f"index mismatch rate {mismatch}"
    np.testing.assert_allclose(s_f, s_x, rtol=2e-2, atol=2e-3)


def test_hardware_faster_than_xla():
    B, N, P, C, k = 32, 1536, 1024, 64, 5
    q, c = _rand(B, N, P, C, seed=3)
    m = jnp.ones((B, P), bool)

    f_fused = jax.jit(lambda q_, c_, m_: _fused_vjp(q_, c_, m_, k, False))
    f_xla = jax.jit(lambda q_, c_, m_: jax.vmap(
        lambda qq, cc, mm: nbk.knn(qq, cc, k, mm, cosine=True))(q_, c_, m_))

    def timed(f):
        r = f(q, c, m)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(q, c, m)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / 5

    t_fused, t_xla = timed(f_fused), timed(f_xla)
    print(f"fused {t_fused*1e3:.2f} ms vs xla {t_xla*1e3:.2f} ms")
    assert t_fused < t_xla
