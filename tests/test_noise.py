"""On-device noise mixing: achieved SNR must match the label (SURVEY.md §4.1,
§7.3 hard-part 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.data.synthetic import make_noise_bank
from avsr_tpu.ops import noise as noise_ops


def measured_snr_db(clean, noisy, length):
    clean = clean[:length]
    added = noisy[:length] - clean
    return 10.0 * np.log10(np.mean(clean**2) / np.mean(added**2))


@pytest.mark.parametrize("target", [-5.0, 0.0, 10.0, 20.0])
def test_mix_at_snr_achieves_target(target):
    sr = 16000
    t = np.arange(sr) / sr
    clean = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((1, sr)).astype(np.float32)
    lengths = jnp.asarray([sr], jnp.int32)
    noisy = np.asarray(
        noise_ops.mix_at_snr(
            jnp.asarray(clean), lengths, jnp.asarray(noise),
            jnp.asarray([target], jnp.float32),
        )
    )
    got = measured_snr_db(clean[0], noisy[0], sr)
    assert abs(got - target) < 0.1, (got, target)


def test_mix_respects_padding():
    sr = 8000
    clean = np.zeros((1, sr), np.float32)
    clean[0, :4000] = 0.5
    noise = np.ones((1, sr), np.float32)
    lengths = jnp.asarray([4000], jnp.int32)
    noisy = np.asarray(
        noise_ops.mix_at_snr(
            jnp.asarray(clean), lengths, jnp.asarray(noise),
            jnp.asarray([0.0], jnp.float32),
        )
    )
    np.testing.assert_allclose(noisy[0, 4000:], 0.0, atol=1e-7)


def test_sample_and_mix_shapes_and_determinism():
    bank = jnp.asarray(make_noise_bank(num_rows=3, row_samples=10_000))
    rngk = jax.random.PRNGKey(0)
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 8000)).astype(np.float32)
    )
    lengths = jnp.asarray([8000, 6000, 4000, 2000], jnp.int32)
    a = np.asarray(
        noise_ops.sample_and_mix(rngk, wav, lengths, bank, (0.0, 10.0), 0.0)
    )
    b = np.asarray(
        noise_ops.sample_and_mix(rngk, wav, lengths, bank, (0.0, 10.0), 0.0)
    )
    np.testing.assert_array_equal(a, b)  # same key -> same mix
    c = np.asarray(
        noise_ops.sample_and_mix(
            jax.random.PRNGKey(7), wav, lengths, bank, (0.0, 10.0), 0.0
        )
    )
    assert not np.allclose(a, c)  # different key -> different mix


def test_typed_bank_conditions_differ():
    """babble@0dB and cafe@0dB are DIFFERENT deterministic conditions
    (SURVEY.md §1 item 4: per-(type x SNR) evaluation)."""
    rng = np.random.default_rng(3)
    bank = noise_ops.NoiseBank.create({
        "babble": rng.standard_normal((2, 9000)).astype(np.float32),
        "cafe": rng.uniform(-1, 1, (3, 9000)).astype(np.float32),
    })
    assert bank.names == ("babble", "cafe") and bank.num_types == 2
    wav = jnp.asarray(
        (0.3 * np.sin(np.arange(8000) / 8)).astype(np.float32)[None, :]
    )
    lengths = jnp.asarray([8000], jnp.int32)
    b1 = np.asarray(noise_ops.mix_fixed_snr(wav, lengths, bank, 0.0,
                                            noise_type="babble"))
    b2 = np.asarray(noise_ops.mix_fixed_snr(wav, lengths, bank, 0.0,
                                            noise_type="babble"))
    c1 = np.asarray(noise_ops.mix_fixed_snr(wav, lengths, bank, 0.0,
                                            noise_type="cafe"))
    np.testing.assert_array_equal(b1, b2)  # same condition -> same mix
    assert not np.allclose(b1, c1)  # different type -> different mix
    # both achieve the labeled SNR
    for mixed in (b1, c1):
        got = measured_snr_db(np.asarray(wav)[0], mixed[0], 8000)
        assert abs(got - 0.0) < 0.1, got
    with pytest.raises(KeyError):
        bank.type_index("street")


def test_typed_sample_and_mix_draws_all_types():
    """Training-time sampling draws from every named type."""
    bank = noise_ops.NoiseBank.create({
        "pos": np.full((1, 9000), 1.0, np.float32),
        "neg": np.full((1, 9000), -1.0, np.float32),
    })
    B = 32
    wav = jnp.asarray(
        np.tile((0.3 * np.sin(np.arange(8000) / 8)).astype(np.float32),
                (B, 1))
    )
    lengths = jnp.full((B,), 8000, jnp.int32)
    noisy = np.asarray(
        noise_ops.sample_and_mix(jax.random.PRNGKey(0), wav, lengths, bank,
                                 (0.0,), 0.0)
    )
    added_sign = np.sign((noisy - np.asarray(wav)).mean(axis=1))
    assert (added_sign > 0).any() and (added_sign < 0).any()


def test_legacy_array_bank_still_works():
    bank_arr = make_noise_bank(num_rows=2, row_samples=9000)
    coerced = noise_ops.NoiseBank.create(bank_arr)
    assert coerced.names == ("noise",)
    wav = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 8000)).astype(np.float32)
    )
    lengths = jnp.asarray([8000, 8000], jnp.int32)
    out = noise_ops.sample_and_mix(
        jax.random.PRNGKey(1), wav, lengths, bank_arr, (10.0,), 0.0
    )
    assert out.shape == wav.shape


def test_fixed_snr_eval_mixing_is_deterministic():
    bank = jnp.asarray(make_noise_bank(num_rows=2, row_samples=10_000))
    wav = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 8000)).astype(np.float32)
    )
    lengths = jnp.asarray([8000, 8000], jnp.int32)
    a = np.asarray(noise_ops.mix_fixed_snr(wav, lengths, bank, 10.0))
    b = np.asarray(noise_ops.mix_fixed_snr(wav, lengths, bank, 10.0))
    np.testing.assert_array_equal(a, b)
    got = measured_snr_db(np.asarray(wav)[0], a[0], 8000)
    assert abs(got - 10.0) < 0.1


def test_fixed_snr_noise_keyed_to_uid_not_batch_position():
    """The same utterance must receive the SAME noise in any batch
    composition (uid-hash keying): error rates stay comparable across
    checkpoints when the eval set changes (VERDICT round-2 weak #3)."""
    rng = np.random.default_rng(11)
    bank = rng.standard_normal((3, 9000)).astype(np.float32)
    w1 = (0.3 * np.sin(np.arange(8000) / 8)).astype(np.float32)
    w2 = (0.2 * np.sin(np.arange(8000) / 17)).astype(np.float32)
    lengths = jnp.asarray([8000, 8000], jnp.int32)
    h1, h2 = np.uint32(0xDEADBEEF), np.uint32(0x12345678)

    wav_a = jnp.asarray(np.stack([w1, w2]))
    noisy_a = np.asarray(noise_ops.mix_fixed_snr(
        wav_a, lengths, bank, 5.0, uid_hashes=jnp.asarray([h1, h2])
    ))
    # same utterances, swapped batch positions
    wav_b = jnp.asarray(np.stack([w2, w1]))
    noisy_b = np.asarray(noise_ops.mix_fixed_snr(
        wav_b, lengths, bank, 5.0, uid_hashes=jnp.asarray([h2, h1])
    ))
    np.testing.assert_allclose(noisy_a[0], noisy_b[1], rtol=1e-6)
    np.testing.assert_allclose(noisy_a[1], noisy_b[0], rtol=1e-6)
    # and a singleton batch still reproduces the same mix
    noisy_c = np.asarray(noise_ops.mix_fixed_snr(
        wav_a[:1], lengths[:1], bank, 5.0, uid_hashes=jnp.asarray([h1])
    ))
    np.testing.assert_allclose(noisy_a[0], noisy_c[0], rtol=1e-6)
    # distinct uids draw distinct noise
    assert not np.allclose(noisy_a[0] - np.asarray(wav_a)[0],
                           noisy_a[1] - np.asarray(wav_a)[1])
