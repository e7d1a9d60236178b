"""Scheduled-sampling ramp (DecoderConfig.sampling_ramp_steps).

The ramp is computed on device from the train state's step counter, so a
single compiled program serves the whole curriculum (SURVEY §3.5 scheduled
sampling; the classic Bengio-style linear schedule).  Contracts:

- a TRACED sampling probability produces bit-identical logits to the same
  STATIC probability (same rng), including p=0 == pure teacher forcing;
- a ramped train step at step 0 matches a sampling-disabled step, and at
  step >= ramp matches the constant-p step, parameter-for-parameter;
- the ramp lives inside one jitted program (no retrace across steps).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.models import decoder as dec
from avsr_tpu.train import step as step_lib
from tests.test_decoder import CFG, V, make_memory
from tests.test_seq2seq import VOCAB, tiny_batch, tiny_config


def test_traced_p_matches_static_p():
    # local generator: keep the shared session rng stream untouched
    rng = np.random.default_rng(42)
    B, K = 2, 6
    mem = make_memory(rng, B=B)
    params = dec.decoder_init(jax.random.PRNGKey(1), CFG, [7], V)
    targets = jnp.asarray(rng.integers(3, V, (B, K)), jnp.int32)
    lengths = jnp.asarray([K, K], jnp.int32)

    def logits(p):
        return np.asarray(dec.teacher_forced_logits(
            params, CFG, targets, lengths, [mem],
            sampling_probability=p, rng=jax.random.PRNGKey(3),
            compute_dtype=jnp.float32,
        ))

    # traced p == static p for a p that actually flips coins
    np.testing.assert_array_equal(logits(jnp.float32(0.7)), logits(0.7))
    # traced p=0 == pure teacher forcing (no rng at all)
    base = np.asarray(dec.teacher_forced_logits(
        params, CFG, targets, lengths, [mem], compute_dtype=jnp.float32
    ))
    np.testing.assert_allclose(
        logits(jnp.float32(0.0)), base, rtol=1e-6, atol=1e-6
    )


def _cfg(p=0.5, ramp=0):
    cfg = tiny_config("audio")
    return dataclasses.replace(
        cfg,
        audio_encoder=dataclasses.replace(cfg.audio_encoder, dropout_rate=0.0),
        decoder=dataclasses.replace(
            cfg.decoder, dropout_rate=0.0,
            sampling_probability=p, sampling_ramp_steps=ramp,
        ),
    )


def _step_at(cfg, batch, step_value):
    state, tx = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, VOCAB)
    state = state._replace(step=jnp.asarray(step_value, jnp.int32))
    fn = step_lib.make_jitted_train_step(cfg, tx)
    new_state, metrics = fn(state, batch, jax.random.PRNGKey(7))
    return fn, new_state, metrics


def test_ramp_matches_endpoints():
    rng = np.random.default_rng(43)
    batch = tiny_batch("audio", rng, B=2)
    ramp = 4

    # step 0: ramped p is exactly 0 -> teacher forcing == sampling-off cfg
    _, s_ramp0, m_ramp0 = _step_at(_cfg(0.5, ramp), batch, 0)
    _, s_off0, m_off0 = _step_at(_cfg(0.0, 0), batch, 0)
    np.testing.assert_allclose(
        float(m_ramp0["ce_loss"]), float(m_off0["ce_loss"]), rtol=1e-6
    )

    # step >= ramp: ramped p has reached the configured constant
    fn, s_ramp, m_ramp = _step_at(_cfg(0.5, ramp), batch, ramp)
    _, s_const, m_const = _step_at(_cfg(0.5, 0), batch, ramp)
    np.testing.assert_allclose(
        float(m_ramp["ce_loss"]), float(m_const["ce_loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ramp.params),
        jax.tree_util.tree_leaves(s_const.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_ramp_is_one_program():
    """Different step values run through the SAME compiled program — the
    schedule is data, not a trace-time constant."""
    rng = np.random.default_rng(44)
    batch = tiny_batch("audio", rng, B=2)
    cfg = _cfg(0.5, ramp=8)
    state, tx = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, VOCAB)
    fn = step_lib.make_jitted_train_step(cfg, tx)
    losses = []
    for step_value in (0, 4, 8):
        st = jax.tree_util.tree_map(jnp.copy, state)
        st = st._replace(step=jnp.asarray(step_value, jnp.int32))
        _, metrics = fn(st, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    if hasattr(fn, "_cache_size"):
        assert fn._cache_size() == 1
    # mid-ramp sampling feeds model predictions, so the loss genuinely
    # differs from the teacher-forced step-0 loss on an untrained model
    assert losses[0] != losses[2]


def test_host_schedule_mirror_matches_optax():
    """host_schedule_value (logging-only, no device round-trip) must track
    the optax schedule the optimizer actually consumes."""
    from avsr_tpu.configs import TrainConfig
    from avsr_tpu.train.optim import build_schedule, host_schedule_value

    cases = [
        TrainConfig(learning_rate=1e-3, lr_schedule="constant"),
        TrainConfig(learning_rate=1e-3, lr_schedule="exponential",
                    lr_decay=0.1),
        TrainConfig(learning_rate=3e-4, lr_schedule="cosine", num_epochs=3),
        TrainConfig(learning_rate=3e-4, lr_schedule="warmup_cosine",
                    warmup_steps=50, num_epochs=3),
    ]
    spe = 100
    for cfg in cases:
        sched = build_schedule(cfg, spe)
        for s in (0, 1, 49, 50, 99, 100, 150, 299, 5000):
            np.testing.assert_allclose(
                host_schedule_value(cfg, s, spe), float(sched(s)),
                rtol=1e-6, atol=1e-9,
                err_msg=f"{cfg.lr_schedule} step {s}",
            )


def test_host_sampling_p_mirror():
    cfg = _cfg(0.5, ramp=10)
    assert step_lib.host_sampling_p(cfg, 0) == 0.0
    assert step_lib.host_sampling_p(cfg, 5) == 0.25
    assert step_lib.host_sampling_p(cfg, 10) == 0.5
    assert step_lib.host_sampling_p(cfg, 99) == 0.5
    assert step_lib.host_sampling_p(_cfg(0.5, 0), 7) == 0.5
    assert step_lib.host_sampling_p(_cfg(0.0, 0), 7) == 0.0
