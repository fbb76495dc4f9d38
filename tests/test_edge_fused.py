"""Parity tests for the fused Pallas EdgeMLP kernels against the XLA oracle
(kernels/edge_fused.reference_edge_mlp), in pallas interpret mode so the
kernel program logic (one-hot gather, LN, masked max, halo-window index math)
is exercised on CPU in the regular suite.  The SAME assertions run against
the compiled TPU kernels in tests_tpu/test_edge_fused_tpu.py.

Tolerances: the fused kernel computes its matmuls in bf16 (the reference is
fp32), so forward parity is bounded by bf16 noise on O(1) LayerNorm outputs
(~4e-3 relative); gradients of a linear loss are EXACT because the custom VJP
rematerializes the fp32 XLA program.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morig_tpu.kernels import edge_fused as ef

ATOL_BF16 = 0.05
MEAN_TOL = 0.01


def make_inputs(rng, B, V, D, H1, H2, local=False, tile_v=256,
                n_fully_masked=3):
    a = rng.normal(size=(B, V, H1)).astype(np.float32)
    b = rng.normal(size=(B, V, H1)).astype(np.float32)
    if local:
        # ring-ordered: neighbors within +-tile_v of the row -> inside the
        # 3-block halo; include extreme offsets that touch window edges
        base = np.arange(V)[None, :, None]
        offs = rng.integers(-tile_v, tile_v, size=(B, V, D))
        nbr = np.clip(base + offs, 0, V - 1).astype(np.int32)
        NB = V // tile_v
        for i in range(NB):                      # rows pinned to halo edges
            ws = int(np.clip(i - 1, 0, NB - 3)) * tile_v
            r = i * tile_v
            nbr[:, r, 0] = ws                     # window start
            nbr[:, r, 1] = ws + 3 * tile_v - 1    # window end
    else:
        nbr = rng.integers(0, V, size=(B, V, D)).astype(np.int32)
    mask = rng.uniform(size=(B, V, D)) < 0.7
    mask[:, :, 0] = True
    for i in range(n_fully_masked):               # rows with no valid edges
        mask[:, 7 + 11 * i, :] = False
    w2 = (rng.normal(size=(H1, H2)) / np.sqrt(H1)).astype(np.float32)
    b2 = rng.normal(size=(H2,)).astype(np.float32) * 0.1
    g1 = rng.uniform(0.5, 1.5, H1).astype(np.float32)
    be1 = rng.normal(size=(H1,)).astype(np.float32) * 0.1
    g2 = rng.uniform(0.5, 1.5, H2).astype(np.float32)
    be2 = rng.normal(size=(H2,)).astype(np.float32) * 0.1
    return (jnp.asarray(a), jnp.asarray(b), jnp.asarray(nbr), jnp.asarray(mask),
            jnp.asarray(w2), jnp.asarray(b2), jnp.asarray(g1), jnp.asarray(be1),
            jnp.asarray(g2), jnp.asarray(be2))


def _assert_close(got, ref, mask):
    got, ref = np.asarray(got), np.asarray(ref)
    diff = np.abs(got - ref)
    assert diff.max() < ATOL_BF16, f"max diff {diff.max()}"
    assert diff.mean() < MEAN_TOL, f"mean diff {diff.mean()}"
    # fully-masked rows must be exactly zero
    dead = ~np.asarray(mask).any(-1)
    assert (got[dead] == 0).all()


def run_forward_parity(interpret: bool):
    rng = np.random.default_rng(0)
    args = make_inputs(rng, B=2, V=512, D=4, H1=128, H2=128)
    ref = ef.reference_edge_mlp(*args)
    got = ef.fused_edge_mlp(*args, interpret=interpret)
    _assert_close(got, ref, args[3])


def run_windowed_parity(interpret: bool, V=1024):
    """NB=4 blocks: first/last-block halo clipping (ws=clip(i-1,0,NB-3)*TV)
    is exercised at both boundaries."""
    rng = np.random.default_rng(1)
    args = make_inputs(rng, B=2, V=V, D=4, H1=128, H2=128, local=True)
    assert ef.check_neighbor_locality(np.asarray(args[2]))
    ref = ef.reference_edge_mlp(*args)
    got = ef.fused_edge_mlp_windowed(*args, interpret=interpret)
    _assert_close(got, ref, args[3])


def run_grad_parity(interpret: bool, windowed: bool):
    rng = np.random.default_rng(2)
    args = make_inputs(rng, B=1, V=768 if windowed else 512, D=4,
                       H1=128, H2=128, local=windowed)
    a, b, nbr, mask, *tail = args

    def loss_fused(a, b, w2, b2, g1, be1, g2, be2):
        return jnp.sum(ef.fused_edge_mlp_trainable(
            a, b, nbr, mask, w2, b2, g1, be1, g2, be2, windowed, interpret))

    def loss_ref(a, b, w2, b2, g1, be1, g2, be2):
        return jnp.sum(ef.reference_edge_mlp(
            a, b, nbr, mask, w2, b2, g1, be1, g2, be2))

    diff = (a, b) + tuple(tail)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*diff)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*diff)
    # linear loss -> incoming cotangent is ones -> the rematerialized VJP
    # must match the XLA gradients exactly
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-5, rtol=1e-5)


# ---- CPU interpret-mode instantiations (regular suite) ----

def test_fused_forward_parity_interpret():
    run_forward_parity(interpret=True)


def test_windowed_forward_parity_interpret():
    run_windowed_parity(interpret=True)


def test_trainable_grad_parity_interpret():
    run_grad_parity(interpret=True, windowed=False)


def test_trainable_grad_parity_windowed_interpret():
    run_grad_parity(interpret=True, windowed=True)


def test_locality_checker_rejects_nonlocal():
    rng = np.random.default_rng(3)
    nbr = rng.integers(0, 1024, size=(1, 1024, 4)).astype(np.int32)
    nbr[0, 0, 0] = 1023          # block 0 -> block 3: outside the 3-block halo
    assert not ef.check_neighbor_locality(nbr)


def test_windowed_tv128_parity_interpret():
    """Narrow-tile windowed variant (TV=128, halo 384): same oracle parity,
    including boundary clipping over NB=8 blocks."""
    rng = np.random.default_rng(5)
    args = make_inputs(rng, B=1, V=1024, D=4, H1=128, H2=128, local=True,
                       tile_v=128)
    assert ef.check_neighbor_locality(np.asarray(args[2]), tile_v=128)
    ref = ef.reference_edge_mlp(*args)
    got = ef.fused_edge_mlp_windowed(*args, tile_v=128, interpret=True)
    _assert_close(got, ref, args[3])


def _assert_close_tol(got, ref, mask, atol):
    # LayerNorm over n channels amplifies bf16 input rounding by ~1/sigma;
    # for small n sigma shrinks, so the tolerance scales ~sqrt(128/n) vs the
    # fp32 oracle (the bf16 XLA inference path has the same amplification).
    got, ref = np.asarray(got), np.asarray(ref)
    diff = np.abs(got - ref)
    assert diff.max() < atol, f"max diff {diff.max()} (atol {atol})"
    assert diff.mean() < atol / 5.0, f"mean diff {diff.mean()}"
    dead = ~np.asarray(mask).any(-1)
    assert (got[dead] == 0).all()


@pytest.mark.parametrize("h1,h2,atol", [(16, 16, 0.15), (32, 64, 0.10),
                                        (64, 128, 0.07)])
def test_small_channel_auto_parity_interpret(h1, h2, atol):
    """Lane-padded small-channel dispatch: padded kernels with true-width
    LayerNorm statistics must match the unpadded oracle."""
    rng = np.random.default_rng(21)
    args = make_inputs(rng, B=1, V=512, D=4, H1=h1, H2=h2)
    ref = ef.reference_edge_mlp(*args)
    got = ef.fused_edge_mlp_auto(*args, windowed=False, tile_v=256,
                                 interpret=True)
    assert got.shape == ref.shape
    _assert_close_tol(got, ref, args[3], atol)


def test_small_channel_windowed_auto_parity_interpret():
    rng = np.random.default_rng(22)
    args = make_inputs(rng, B=1, V=1024, D=4, H1=16, H2=16, local=True)
    ref = ef.reference_edge_mlp(*args)
    got = ef.fused_edge_mlp_auto(*args, windowed=True, tile_v=256,
                                 interpret=True)
    _assert_close_tol(got, ref, args[3], 0.15)


def test_vmem_tile_gate():
    """The dispatch-side scoped-VMEM budget model: shapes known to OOM the
    16 MB scoped limit must shrink the tile or fall back (None); known-good
    bench shapes keep their tile; windowed never shrinks (its locality
    precondition is tile-specific)."""
    from morig_tpu.nn.gcu import _vmem_tile

    # campaign val-step shape that OOM'd at TV=256 (18.08 MB actual)
    assert _vmem_tile(2048, 16, 256, 256, 256) == 128
    # round-2 bench shape, compiled + ran at TV=256
    assert _vmem_tile(1536, 12, 256, 256, 256) == 256
    # windowed halo at tile 128 fits; an over-budget windowed tile must
    # return None rather than shrink
    assert _vmem_tile(2048, 16, 256, 256, 128, windowed=True) == 128
    assert _vmem_tile(8192, 16, 512, 512, 512, windowed=True) is None
    # giant full-table: no tile fits -> XLA fallback
    assert _vmem_tile(16384, 16, 512, 512, 256) is None


# ---- fused backward kernel ----

def _bwd_args(seed=31, B=2, V=256, D=5, H1=128, H2=128, tie_cols=True):
    rng = np.random.default_rng(seed)
    args = make_inputs(rng, B=B, V=V, D=D, H1=H1, H2=H2)
    a, b, nbr, mask, *tail = args
    if tie_cols:
        # duplicate neighbor columns -> EXACT ties in the masked max, so the
        # equal-split routing of the backward is exercised, not just argmax
        nbr = nbr.at[:, :, 1].set(nbr[:, :, 0])
        mask = mask.at[:, :, 1].set(mask[:, :, 0])
    dout = jnp.asarray(rng.normal(size=(B, V, H2)).astype(np.float32))
    return (a, b, nbr, mask, *tail), dout


def run_bwd_kernel_parity(interpret: bool, tile_v: int = 128, precise=True,
                          max_tol=1e-4, mean_tol=1e-6):
    """All eight gradients vs the fp32 XLA VJP of the reference oracle.

    `precise=True` (fp32 in-kernel matmuls) validates the backward FORMULA
    — max-routing with equal tie splits, both LayerNorm backwards, the
    transpose-one-hot scatter, all cross-tile accumulations — to ~1e-5.
    `precise=False` runs the production bf16 path; its divergence from the
    fp32 VJP is mixed-precision noise (bf16 eps amplified by per-row
    LayerNorm statistics), so only statistical bounds apply."""
    args, dout = _bwd_args()
    a, b, nbr, mask, w2, b2, g1, be1, g2, be2 = args
    oracle = ef.reference_edge_mlp if precise else ef.reference_edge_mlp_bf16

    def primal(a, b, w2, b2, g1, be1, g2, be2):
        return oracle(a, b, nbr, mask, w2, b2, g1, be1, g2, be2)

    _, vjp = jax.vjp(primal, a, b, w2, b2, g1, be1, g2, be2)
    want = vjp(dout)
    got = ef.fused_edge_mlp_bwd(a, b, nbr, mask, w2, b2, g1, be1, g2, be2,
                                dout, tile_v=tile_v, interpret=interpret,
                                precise=precise)
    names = ("da", "db_table", "dw2", "db2", "dg1", "dbe1", "dg2", "dbe2")
    for n, gf, gr in zip(names, got, want):
        gf, gr = np.asarray(gf), np.asarray(gr)
        assert gf.shape == gr.shape, n
        scale = max(float(np.abs(gr).max()), 1.0)
        err = np.abs(gf - gr)
        # a handful of entries may take O(dout)-sized hits from max-routing
        # flips at near-ties (bf16 mode only); a formula bug shifts ALL
        # entries, which the mean and fraction bounds catch
        frac_off = float((err > max_tol * scale).mean())
        assert frac_off < 1e-3, (n, frac_off, err.max(), scale)
        assert err.mean() / scale < mean_tol, (n, err.mean(), scale)


def test_bwd_kernel_parity_interpret():
    run_bwd_kernel_parity(interpret=True)


def test_bwd_kernel_parity_tv64_interpret():
    """Tile revisiting: V/TV=4 tiles accumulate db/dw2 across grid steps."""
    run_bwd_kernel_parity(interpret=True, tile_v=64)


def test_bwd_kernel_bf16_noise_interpret():
    """The production bf16 backward: bounded mixed-precision noise vs the
    VJP of the bf16-matched oracle — same input rounding and max routing,
    so the residual is only WHERE each side rounds to bf16 in the backward
    (a formula bug produces errors orders of magnitude larger)."""
    run_bwd_kernel_parity(interpret=True, precise=False,
                          max_tol=0.15, mean_tol=1e-3)


def test_trainable_pallas_bwd_interpret():
    """End-to-end grad through the trainable wrapper with pallas_bwd=True
    (forward = fused kernel, backward = fused backward kernel) vs grads of
    the bf16-matched oracle.  Routing is identical (same forward values);
    entries differ only by where each side rounds to bf16 in the backward
    (the kernel rounds ds before its matmuls, XLA's cast-VJP rounds the
    cotangents after), so statistical bounds apply."""
    args, _ = _bwd_args(seed=32, B=1, V=256, D=4)
    a, b, nbr, mask, *tail = args

    def loss_fused(a, b, w2, b2, g1, be1, g2, be2):
        return jnp.sum(ef.fused_edge_mlp_trainable(
            a, b, nbr, mask, w2, b2, g1, be1, g2, be2,
            False, True, True, 128))

    def loss_ref(a, b, w2, b2, g1, be1, g2, be2):
        return jnp.sum(ef.reference_edge_mlp_bf16(
            a, b, nbr, mask, w2, b2, g1, be1, g2, be2))

    diff = (a, b) + tuple(tail)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*diff)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*diff)
    for gf, gr in zip(g_fused, g_ref):
        gf, gr = np.asarray(gf), np.asarray(gr)
        scale = max(float(np.abs(gr).max()), 1.0)
        err = np.abs(gf - gr)
        assert float((err > 0.15 * scale).mean()) < 1e-3
        assert err.mean() / scale < 1e-3


def test_bwd_zero_rows():
    """Vertices with no valid neighbors must produce zero input gradients."""
    args, dout = _bwd_args(seed=33, B=1, V=256, D=4, tie_cols=False)
    a, b, nbr, mask, *tail = args
    mask = mask.at[0, 5, :].set(False)
    got = ef.fused_edge_mlp_bwd(a, b, nbr, mask, *tail, dout,
                                tile_v=128, interpret=True)
    da = np.asarray(got[0])
    assert (da[0, 5] == 0).all()


def test_vmem_tile_bwd_gate():
    from morig_tpu.nn.gcu import _vmem_tile_bwd

    # production shapes OOM on hardware (17.64 MB actual at D=12, V=2048,
    # P=128/128 inside a full train program, 16 MB scoped limit) -> the gate
    # must route them to the remat-XLA backward
    assert _vmem_tile_bwd(2048, 12, 128, 256) is None
    assert _vmem_tile_bwd(2048, 12, 128, 128) is None
    assert _vmem_tile_bwd(16384, 16, 512, 512) is None
    # small-V / low-D configs fit with margin under the calibrated model
    assert _vmem_tile_bwd(1024, 8, 128, 128) == 128
    # tiles must be multiples of 128 (Mosaic last-dim constraint)
    assert _vmem_tile_bwd(1024, 8, 128, 128, tile_v=64) is None


def test_auto_select_edge_impl():
    """Per-batch kernel auto-selection (closes the manual set_edge_impl
    flip): windowed for halo-local tables, fused for small non-local meshes,
    XLA beyond the full-table gather budget."""
    from morig_tpu.nn import gcu

    prev_impl, prev_tile = gcu.get_edge_impl(), gcu.get_edge_tile()
    try:
        V, D = 512, 4
        base = np.arange(V)[:, None]
        local_nbr = np.clip(base + np.arange(D)[None] - 2, 0, V - 1).astype(np.int32)
        e_local = {"tpl_nbr": local_nbr, "geo_nbr": local_nbr}
        assert gcu.auto_select_edge_impl([e_local], tile_v=128) == "windowed"
        assert gcu.get_edge_tile() == 128
        far = local_nbr.copy()
        far[0, 0] = V - 1                      # block 0 -> block 3: non-local
        e_far = {"tpl_nbr": far, "geo_nbr": local_nbr}
        assert gcu.auto_select_edge_impl([e_far], tile_v=128) == "fused"
        assert gcu.auto_select_edge_impl([e_far], tile_v=128,
                                         max_fused_v=256) == "xla"
        # one non-local entry poisons the whole batch
        assert gcu.auto_select_edge_impl([e_local, e_far],
                                         tile_v=128) == "fused"
    finally:
        gcu.set_edge_impl(prev_impl)
        gcu.set_edge_tile(prev_tile)
