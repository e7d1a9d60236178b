"""Encoder layer-wrapper tests: residual, highway, stacking (SURVEY §2.2 row 7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.configs import EncoderConfig
from avsr_tpu.models import encoder as enc


def run(cfg, rng, D=8):
    params = enc.encoder_init(jax.random.PRNGKey(0), cfg, D)
    x = jnp.asarray(rng.standard_normal((6, 2, D)).astype(np.float32))
    lengths = jnp.asarray([6, 4], jnp.int32)
    ys, _ = enc.encoder_apply(params, cfg, x, lengths,
                              compute_dtype=jnp.float32)
    return params, np.asarray(ys)


def test_residual_and_highway_change_outputs(rng):
    # two stacked layers with matching dims (bidirectional: 2*4 = 8 = D)
    base = EncoderConfig(hidden_units=(4, 4), bidirectional=True,
                         dropout_rate=0.0)
    _, plain = run(base, np.random.default_rng(0))
    _, resid = run(dataclasses.replace(base, residual=True),
                   np.random.default_rng(0))
    p_hw, highway = run(dataclasses.replace(base, highway=True),
                        np.random.default_rng(0))
    assert not np.allclose(plain, resid)
    assert not np.allclose(plain, highway)
    assert not np.allclose(resid, highway)
    # highway params exist only where dims match (layer 2: in 8 == out 8;
    # layer 1: in D=8 == out 8 too for this config)
    assert "hw_w" in p_hw["layers"][1]
    assert np.all(np.isfinite(highway))


def test_highway_skipped_when_dims_mismatch(rng):
    cfg = EncoderConfig(hidden_units=(5,), bidirectional=False,
                        dropout_rate=0.0, highway=True)
    params = enc.encoder_init(jax.random.PRNGKey(1), cfg, 8)  # 8 != 5
    assert "hw_w" not in params["layers"][0]
    x = jnp.asarray(rng.standard_normal((4, 2, 8)).astype(np.float32))
    ys, _ = enc.encoder_apply(params, cfg, x, jnp.asarray([4, 4], jnp.int32),
                              compute_dtype=jnp.float32)
    assert ys.shape == (4, 2, 5)


def test_masking_preserved_with_wrappers(rng):
    cfg = EncoderConfig(hidden_units=(4, 4), bidirectional=True,
                        dropout_rate=0.0, highway=True)
    params = enc.encoder_init(jax.random.PRNGKey(2), cfg, 8)
    x = jnp.asarray(rng.standard_normal((6, 2, 8)).astype(np.float32))
    lengths = jnp.asarray([6, 3], jnp.int32)
    ys, _ = enc.encoder_apply(params, cfg, x, lengths,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ys)[3:, 1], 0.0, atol=1e-7)


def test_paired_encoder_apply_matches_separate(rng):
    """paired_encoder_apply (stream-batched scans) must be numerically
    identical to two encoder_apply calls — including every dropout draw —
    for unequal stack depths (3 vs 1 layers) and unequal lengths."""
    B = 4
    cfg_a = EncoderConfig(hidden_units=(6, 6, 6), bidirectional=True,
                          dropout_rate=0.3)
    cfg_v = EncoderConfig(hidden_units=(6,), bidirectional=True,
                          dropout_rate=0.3)
    pa = enc.encoder_init(jax.random.PRNGKey(41), cfg_a, 5)
    pv = enc.encoder_init(jax.random.PRNGKey(42), cfg_v, 3)
    xa = jnp.asarray(np.random.default_rng(1).standard_normal(
        (10, B, 5)).astype(np.float32))
    xv = jnp.asarray(np.random.default_rng(2).standard_normal(
        (7, B, 3)).astype(np.float32))
    la = jnp.asarray([10, 8, 10, 3], jnp.int32)
    lv = jnp.asarray([7, 7, 2, 5], jnp.int32)
    ra, rv = jax.random.PRNGKey(7), jax.random.PRNGKey(8)

    assert enc.can_pair_encoders(cfg_a, cfg_v, train=True)
    for train in (False, True):
        (ya_p, sa_p), (yv_p, sv_p) = enc.paired_encoder_apply(
            pa, cfg_a, xa, la, pv, cfg_v, xv, lv,
            train=train, dropout_rng_a=ra, dropout_rng_b=rv,
            compute_dtype=jnp.float32,
        )
        ya, sa = enc.encoder_apply(pa, cfg_a, xa, la, train=train,
                                   dropout_rng=ra, compute_dtype=jnp.float32)
        yv, sv = enc.encoder_apply(pv, cfg_v, xv, lv, train=train,
                                   dropout_rng=rv, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(ya_p), np.asarray(ya),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(yv_p), np.asarray(yv),
                                   rtol=1e-5, atol=1e-6)
        for s_p, s in ((sa_p, sa), (sv_p, sv)):
            for t_p, t in zip(jax.tree_util.tree_leaves(s_p),
                              jax.tree_util.tree_leaves(s)):
                np.testing.assert_allclose(np.asarray(t_p), np.asarray(t),
                                           rtol=1e-5, atol=1e-6)


def test_paired_encoder_grads_match_separate(rng):
    B = 2
    cfg_a = EncoderConfig(hidden_units=(4, 4), bidirectional=True,
                          dropout_rate=0.0)
    cfg_v = EncoderConfig(hidden_units=(4,), bidirectional=True,
                          dropout_rate=0.0)
    pa = enc.encoder_init(jax.random.PRNGKey(51), cfg_a, 3)
    pv = enc.encoder_init(jax.random.PRNGKey(52), cfg_v, 2)
    xa = jnp.asarray(np.random.default_rng(3).standard_normal(
        (6, B, 3)).astype(np.float32))
    xv = jnp.asarray(np.random.default_rng(4).standard_normal(
        (4, B, 2)).astype(np.float32))
    la = jnp.asarray([6, 5], jnp.int32)
    lv = jnp.asarray([4, 3], jnp.int32)

    def loss(params, paired):
        pa_, pv_ = params
        if paired:
            (ya, _), (yv, _) = enc.paired_encoder_apply(
                pa_, cfg_a, xa, la, pv_, cfg_v, xv, lv,
                compute_dtype=jnp.float32,
            )
        else:
            ya, _ = enc.encoder_apply(pa_, cfg_a, xa, la,
                                      compute_dtype=jnp.float32)
            yv, _ = enc.encoder_apply(pv_, cfg_v, xv, lv,
                                      compute_dtype=jnp.float32)
        return jnp.sum(ya ** 2) + 1.3 * jnp.sum(yv ** 2)

    g_p = jax.grad(lambda p: loss(p, True))((pa, pv))
    g_s = jax.grad(lambda p: loss(p, False))((pa, pv))
    for t_p, t in zip(jax.tree_util.tree_leaves(g_p),
                      jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t),
                                   rtol=1e-4, atol=1e-5)


def test_can_pair_encoders_gates():
    bi = EncoderConfig(hidden_units=(6,), bidirectional=True)
    assert enc.can_pair_encoders(bi, bi, train=False)
    uni = EncoderConfig(hidden_units=(6,), bidirectional=False)
    assert not enc.can_pair_encoders(bi, uni, train=False)
    gru = EncoderConfig(hidden_units=(6,), cell_type="gru", bidirectional=True)
    assert not enc.can_pair_encoders(bi, gru, train=False)
    other_h = EncoderConfig(hidden_units=(8,), bidirectional=True)
    assert not enc.can_pair_encoders(bi, other_h, train=False)
    rd = EncoderConfig(hidden_units=(6,), bidirectional=True,
                       recurrent_dropout_rate=0.2)
    assert not enc.can_pair_encoders(bi, rd, train=True)
    assert enc.can_pair_encoders(bi, rd, train=False)
