"""Compiled-kernel parity on the real TPU at benchmark shapes
(V=2048, D=16, H1=128, H2=256) — the exact configuration behind the headline
throughput number, plus the halo-clipping windowed variant and the trainable
custom-VJP path."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

import jax
import jax.numpy as jnp

from morig_tpu.kernels import edge_fused as ef
from test_edge_fused import _assert_close, make_inputs, run_grad_parity


def test_fused_forward_bench_shapes():
    rng = np.random.default_rng(10)
    args = make_inputs(rng, B=2, V=2048, D=16, H1=128, H2=256)
    ref = ef.reference_edge_mlp(*args)
    got = ef.fused_edge_mlp(*args)
    _assert_close(got, ref, args[3])


def test_windowed_forward_bench_shapes():
    rng = np.random.default_rng(11)
    args = make_inputs(rng, B=2, V=2048, D=16, H1=128, H2=256, local=True)
    assert ef.check_neighbor_locality(np.asarray(args[2]))
    ref = ef.reference_edge_mlp(*args)
    got = ef.fused_edge_mlp_windowed(*args)
    _assert_close(got, ref, args[3])


def test_trainable_grad_parity_tpu():
    run_grad_parity(interpret=False, windowed=False)


def test_trainable_grad_parity_windowed_tpu():
    run_grad_parity(interpret=False, windowed=True)


def test_windowed_tv128_bench_shapes():
    rng = np.random.default_rng(12)
    args = make_inputs(rng, B=2, V=1536, D=12, H1=128, H2=256, local=True,
                       tile_v=128)
    assert ef.check_neighbor_locality(np.asarray(args[2]), tile_v=128)
    ref = ef.reference_edge_mlp(*args)
    got = ef.fused_edge_mlp_windowed(*args, tile_v=128)
    _assert_close(got, ref, args[3])


def test_bwd_kernel_parity_tpu():
    """Compiled fused backward at a training shape: precise (fp32) formula
    parity vs the XLA VJP, then the production bf16 path's noise bounds."""
    from test_edge_fused import run_bwd_kernel_parity

    run_bwd_kernel_parity(interpret=False, max_tol=2e-3, mean_tol=1e-4)
    run_bwd_kernel_parity(interpret=False, precise=False,
                          max_tol=0.15, mean_tol=1e-3)


def test_bwd_kernel_bench_shape_tpu():
    """The backward compiles and runs inside its VMEM gate at the
    bench-train shape (V=2048, D=12, H1=128, H2=256)."""
    from morig_tpu.nn.gcu import _vmem_tile_bwd

    rng = np.random.default_rng(13)
    args = make_inputs(rng, B=2, V=2048, D=12, H1=128, H2=256)
    tv = _vmem_tile_bwd(2048, 12, 128, 256)
    assert tv is not None
    dout = jnp.asarray(rng.normal(size=(2, 2048, 256)).astype(np.float32))
    outs = ef.fused_edge_mlp_bwd(*args, dout, tile_v=tv)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
