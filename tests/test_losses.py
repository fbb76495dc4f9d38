"""Loss tests: infoNCE vs per-sample oracle, chamfer, soft CE, masked L1."""
import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.losses.basic import (
    batched_chamfer_with_average,
    bce_with_logits,
    chamfer_with_average,
    cross_entropy_with_probs,
    masked_l1,
)
from morig_tpu.losses.nce import info_nce, multi_pos_info_nce


def _softmax_ce(logits, label):
    z = logits - logits.max()
    logz = np.log(np.exp(z).sum())
    return logz - z[label]


def test_info_nce_matches_oracle(rng):
    B, V, P, C, N = 2, 12, 9, 8, 5
    vf = rng.normal(size=(B, V, C)).astype(np.float32)
    pf = rng.normal(size=(B, P, C)).astype(np.float32)
    vf /= np.linalg.norm(vf, axis=-1, keepdims=True)
    pf /= np.linalg.norm(pf, axis=-1, keepdims=True)
    v2p = rng.integers(0, [V, P], size=(B, N, 2))
    p2v = rng.integers(0, [P, V], size=(B, N, 2))
    v2p_mask = np.ones((B, N), bool); v2p_mask[1, 3:] = False
    p2v_mask = np.ones((B, N), bool)
    tau = 0.07

    got = float(info_nce(
        jnp.asarray(vf), jnp.asarray(pf),
        jnp.asarray(v2p), jnp.asarray(v2p_mask),
        jnp.asarray(p2v), jnp.asarray(p2v_mask),
        jnp.ones((B, V), bool), jnp.ones((B, P), bool), jnp.asarray(tau),
    ))

    # oracle: per-sample loop like the reference (customized_losses.py:107-134)
    total = 0.0
    for b in range(B):
        ls = []
        for n in range(N):
            if v2p_mask[b, n]:
                logits = vf[b, v2p[b, n, 0]] @ pf[b].T / tau
                ls.append(_softmax_ce(logits, v2p[b, n, 1]))
        total += np.mean(ls)
        ls = []
        for n in range(N):
            if p2v_mask[b, n]:
                logits = pf[b, p2v[b, n, 0]] @ vf[b].T / tau
                ls.append(_softmax_ce(logits, p2v[b, n, 1]))
        total += np.mean(ls)
    want = total / B
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_multi_pos_info_nce_finite_and_separates(rng):
    B, V, J, C = 2, 600, 6, 16
    # two clusters with identical skin vectors inside each cluster
    skin = np.zeros((B, V, J), np.float32)
    skin[:, : V // 2, 0] = 1.0
    skin[:, V // 2 :, 1] = 1.0
    # features aligned with clusters -> low loss; random -> higher loss
    f_good = np.zeros((B, V, C), np.float32)
    f_good[:, : V // 2, 0] = 5.0
    f_good[:, V // 2 :, 1] = 5.0
    f_rand = rng.normal(size=(B, V, C)).astype(np.float32)
    mask = np.ones((B, V), bool)
    key = jax.random.key(0)
    l_good = float(multi_pos_info_nce(key, jnp.asarray(f_good), jnp.asarray(skin), jnp.asarray(mask), num_sample=128, num_neg=64))
    l_rand = float(multi_pos_info_nce(key, jnp.asarray(f_rand), jnp.asarray(skin), jnp.asarray(mask), num_sample=128, num_neg=64))
    assert np.isfinite(l_good) and np.isfinite(l_rand)
    assert l_good < l_rand


def test_chamfer_oracle(rng):
    p1 = rng.normal(size=(10, 3)).astype(np.float32)
    p2 = rng.normal(size=(7, 3)).astype(np.float32)
    got = float(chamfer_with_average(jnp.asarray(p1), jnp.asarray(p2)))
    d = np.linalg.norm(p1[:, None] - p2[None], axis=-1)
    want = 0.5 * (d.min(1).mean() + d.min(0).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # masked version: padding ignored
    p1p = np.concatenate([p1, np.full((3, 3), 50.0, np.float32)])
    m1 = np.array([True] * 10 + [False] * 3)
    got2 = float(chamfer_with_average(jnp.asarray(p1p), jnp.asarray(p2), jnp.asarray(m1), None))
    np.testing.assert_allclose(got2, want, rtol=1e-5)


def test_cross_entropy_with_probs(rng):
    logits = rng.normal(size=(5, 4)).astype(np.float32)
    probs = rng.random((5, 4)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    got = np.asarray(cross_entropy_with_probs(jnp.asarray(logits), jnp.asarray(probs)))
    z = logits - logits.max(1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(1, keepdims=True))
    want = -probs * logp
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_masked_l1_and_bce(rng):
    pred = rng.normal(size=(2, 6, 3)).astype(np.float32)
    tar = rng.normal(size=(2, 6, 3)).astype(np.float32)
    mask = np.ones((2, 6), bool); mask[0, 4:] = False
    got = float(masked_l1(jnp.asarray(pred), jnp.asarray(tar), jnp.asarray(mask)))
    want = np.abs(pred - tar)[mask].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)

    logits = rng.normal(size=(2, 6)).astype(np.float32)
    targets = (rng.random((2, 6)) > 0.5).astype(np.float32)
    gotb = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)))
    p = 1 / (1 + np.exp(-logits))
    per = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    np.testing.assert_allclose(gotb, per[mask].mean(), rtol=1e-4)


def test_multi_pos_info_nce_oversampled_padding(rng):
    """num_sample larger than the valid vertex count must not contaminate the
    loss with padded rows (they get sampled by the replace=False overflow)."""
    B, V, J, C = 1, 64, 4, 8
    skin = np.zeros((B, V, J), np.float32)
    skin[:, :16, 0] = 1.0
    skin[:, 16:32, 1] = 1.0  # rows 32+ are padding (all-zero skin)
    feat = rng.normal(size=(B, V, C)).astype(np.float32)
    feat[:, 32:] = 99.0      # poison the padded features
    mask = np.zeros((B, V), bool)
    mask[:, :32] = True
    key = jax.random.key(0)
    loss = float(multi_pos_info_nce(
        key, jnp.asarray(feat), jnp.asarray(skin), jnp.asarray(mask),
        num_sample=48, num_pos=4, num_neg=16,  # 48 > 32 valid rows
    ))
    assert np.isfinite(loss)
    # poisoning the padding must not change the value
    feat2 = feat.copy(); feat2[:, 32:] = -99.0
    loss2 = float(multi_pos_info_nce(
        key, jnp.asarray(feat2), jnp.asarray(skin), jnp.asarray(mask),
        num_sample=48, num_pos=4, num_neg=16,
    ))
    np.testing.assert_allclose(loss, loss2, rtol=1e-5)


def test_chamfer_directional_matches_average(rng):
    from morig_tpu.losses.basic import chamfer_directional

    p1 = rng.normal(size=(12, 3)).astype(np.float32)
    p2 = rng.normal(size=(6, 3)).astype(np.float32)
    m1 = np.array([True] * 9 + [False] * 3)
    m2 = np.array([True] * 5 + [False])
    a, b = chamfer_directional(jnp.asarray(p1), jnp.asarray(p2),
                               jnp.asarray(m1), jnp.asarray(m2))
    want = float(chamfer_with_average(jnp.asarray(p1), jnp.asarray(p2),
                                      jnp.asarray(m1), jnp.asarray(m2)))
    np.testing.assert_allclose(0.5 * (float(a) + float(b)), want, rtol=1e-5)
    # numpy oracle for each direction
    d = np.linalg.norm(p1[:9, None] - p2[None, :5], axis=-1)
    np.testing.assert_allclose(float(a), d.min(1).mean(), rtol=1e-5)
    np.testing.assert_allclose(float(b), d.min(0).mean(), rtol=1e-5)


def test_masked_l1_weighted(rng):
    from morig_tpu.losses.basic import masked_l1_weighted

    pred = rng.normal(size=(2, 8, 3)).astype(np.float32)
    tgt = rng.normal(size=(2, 8, 3)).astype(np.float32)
    mask = np.ones((2, 8), bool); mask[1, 5:] = False
    ones = np.ones((2, 8), np.float32)
    base = float(masked_l1(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask)))
    same = float(masked_l1_weighted(jnp.asarray(pred), jnp.asarray(tgt),
                                    jnp.asarray(mask), jnp.asarray(ones)))
    np.testing.assert_allclose(same, base, rtol=1e-6)
    # weighted oracle
    w = rng.random((2, 8)).astype(np.float32) + 0.1
    got = float(masked_l1_weighted(jnp.asarray(pred), jnp.asarray(tgt),
                                   jnp.asarray(mask), jnp.asarray(w)))
    wm = (w * mask)[..., None] * np.ones(3)
    want = (np.abs(pred - tgt) * wm).sum() / wm.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rigstage_recall_knobs_defaults_reference(rng):
    """dense_weight=0 / recall_weight=1 must reproduce the reference loss
    exactly; the opted-in variants must differ and stay finite."""
    import jax as _jax
    from morig_tpu.data.rig import capsule_rig_dataset
    from morig_tpu.train.stages import RigStage

    ds = capsule_rig_dataset(num_models=2, num_points=32, n_lat=7, n_lon=6)
    b = ds.batch([0, 1])
    ref = RigStage(arch="jointnet", num_embed_sample=32)
    mod = RigStage(arch="jointnet", num_embed_sample=32,
                   dense_weight=3.0, recall_weight=2.0)
    st = ref.init_state(_jax.random.key(0), b)
    k = _jax.random.key(1)
    out = st.apply_fn({"params": st.params, "batch_stats": st.batch_stats},
                      b.pred_flow, b.mesh, False)
    t_ref, m_ref = ref._losses(k, out, b)
    t_mod, m_mod = mod._losses(k, out, b)
    assert np.isfinite(float(t_ref)) and np.isfinite(float(t_mod))
    assert float(t_ref) != float(t_mod)
    # same embed term; chamfer/l1 terms differ
    np.testing.assert_allclose(float(m_ref["loss_motion"]),
                               float(m_mod["loss_motion"]), rtol=1e-6)
