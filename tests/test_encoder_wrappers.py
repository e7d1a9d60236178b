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
