"""Edit-distance / CER / WER and unit-dictionary tests (SURVEY.md §4.1)."""

import numpy as np
import pytest

from avsr_tpu.data.units import EOS_ID, GO_ID, PAD_ID, builtin_unit_dict
from avsr_tpu.eval.metrics import ErrorRateAccumulator, levenshtein, _levenshtein_np


@pytest.mark.parametrize(
    "a,b,d",
    [
        ("", "", 0),
        ("abc", "abc", 0),
        ("kitten", "sitting", 3),
        ("abc", "", 3),
        ("", "xy", 2),
        ("flaw", "lawn", 2),
    ],
)
def test_levenshtein_known_values(a, b, d):
    assert levenshtein(list(a), list(b)) == d
    assert _levenshtein_np(list(a), list(b)) == d


def test_levenshtein_native_matches_numpy(rng):
    for _ in range(20):
        n, m = rng.integers(0, 30, 2)
        a = list(rng.integers(0, 5, n))
        b = list(rng.integers(0, 5, m))
        assert levenshtein(a, b) == _levenshtein_np(a, b)


def test_error_rate_accumulator():
    acc = ErrorRateAccumulator()
    acc.update("the cat", "the bat")  # 1 char sub, 1 word sub
    assert acc.char_errors == 1 and acc.char_total == 7
    assert acc.word_errors == 1 and acc.word_total == 2
    acc.update("hello", "hello")
    assert acc.cer == 1 / 12
    assert acc.wer == 1 / 3


def test_prediction_file(tmp_path):
    acc = ErrorRateAccumulator()
    acc.update("abc", "abd", uid="u1")
    p = str(tmp_path / "pred.txt")
    acc.write_predictions(p)
    text = open(p).read()
    assert "u1" in text and "ref: abc" in text and "hyp: abd" in text


def test_unit_dict_roundtrip():
    d = builtin_unit_dict("character")
    ids = d.encode("hello world")
    assert ids[-1] == EOS_ID
    assert d.decode(ids) == "hello world"
    # PAD/GO stripped, stops at EOS
    assert d.decode([GO_ID] + ids[:-1] + [EOS_ID, 5, 6]) == "hello world"


def test_unit_dict_unknown_units_skipped():
    d = builtin_unit_dict("character")
    assert d.decode(d.encode("héllo")) == "hllo"


def test_unit_dict_save_load(tmp_path):
    d = builtin_unit_dict("phoneme")
    p = str(tmp_path / "units.txt")
    d.save(p)
    d2 = d.load(p, "phoneme")
    assert d2.idx_to_unit == d.idx_to_unit
    assert d2.decode(d2.encode("aa b sil")) == "aa b sil"


def test_viseme_dict():
    d = builtin_unit_dict("viseme")
    assert d.vocab_size > 3
    assert d.decode(d.encode("A B sil")) == "A B sil"


def test_lrs2_charset_roundtrips_digits():
    """LRS2 transcripts contain digits; the character_lrs2 inventory must
    round-trip them (VERDICT round-1 item 8)."""
    from avsr_tpu.data.units import builtin_unit_dict

    d = builtin_unit_dict("character_lrs2")
    text = "meet me at 10.30, flat 4-b o'clock"
    assert d.decode(d.encode(text)) == text
    # the base charset would silently drop the digits
    base = builtin_unit_dict("character")
    assert base.decode(base.encode(text)) != text


def test_encode_strict_mode_errors_on_unknown():
    from avsr_tpu.data.units import builtin_unit_dict

    d = builtin_unit_dict("character")
    import pytest

    with pytest.raises(ValueError, match="outside the 'character' inventory"):
        d.encode("agent 007", on_unknown="error")
    assert d.count_unknown("agent 007") == 3
    assert d.count_unknown("agent") == 0


def test_loader_strict_units(tmp_path):
    from avsr_tpu.configs import DataConfig
    from avsr_tpu.data.loader import BucketingLoader
    from avsr_tpu.data.synthetic import Utterance
    from avsr_tpu.data.units import builtin_unit_dict
    import numpy as np
    import pytest

    utt = Utterance(uid="u0", transcript="call 911",
                    waveform=np.zeros(4000, np.float32))
    mk = lambda strict: BucketingLoader(
        [utt], builtin_unit_dict("character"),
        DataConfig(batch_size=1, audio_bucket_boundaries=(100,),
                   max_label_length=12, strict_units=strict),
        require_audio=True, require_video=False,
        frame_step=160, frame_length=400,
    )
    # default: drops digits (with a warning) and still batches
    batches = list(mk(False).epoch(shuffle=False))
    assert len(batches) == 1
    with pytest.raises(ValueError, match="outside the 'character' inventory"):
        list(mk(True).epoch(shuffle=False))


def test_train_step_flops_hand_check():
    """Analytic FLOPs: hand-verify the dominant LSTM term on a minimal
    audio-only config (BASELINE.md §C MFU accounting)."""
    from avsr_tpu.configs import (AudioFrontendConfig, DecoderConfig,
                                  EncoderConfig, ExperimentConfig)
    from avsr_tpu.utils.flops import train_step_flops

    cfg = ExperimentConfig(
        architecture="audio",
        audio=AudioFrontendConfig(num_mel_bins=10, add_deltas=False,
                                  frame_stacking=1, frame_skipping=1,
                                  use_matmul_dft=False,
                                  feature_type="spectrogram"),
        audio_encoder=EncoderConfig(hidden_units=(8,), bidirectional=False),
        decoder=DecoderConfig(embedding_dim=4, hidden_units=(8,),
                              attention_units=4),
    )
    B, S, K, V = 2, 16_000, 5, 7
    f = train_step_flops(cfg, batch=B, audio_samples=S, label_len=K, vocab=V)
    T = (S - cfg.audio.frame_length) // cfg.audio.frame_step + 1
    D = cfg.audio.fft_length // 2 + 1  # spectrogram input dim
    # encoder fwd: 2*B*T*4H*(D+H); train factor 3
    expect_enc = 3 * 2 * B * T * 4 * 8 * (D + 8)
    assert f["audio_encoder"] == expect_enc
    assert f["total"] > f["audio_encoder"] > 0
    assert f["total"] == sum(v for k, v in f.items()
                             if k not in ("total", "forward"))
