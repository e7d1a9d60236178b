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
