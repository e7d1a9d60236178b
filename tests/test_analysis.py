"""Error-analysis surface (eval/analysis.py + `cli analyze`).

Alignment must agree with the Levenshtein kernel on op counts; aggregates
must surface planted confusions; the CLI must parse real prediction files
written by ErrorRateAccumulator.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from avsr_tpu.eval.analysis import (
    align,
    analyze,
    analyze_file,
    bootstrap_ci,
    compare,
    parse_predictions,
)
from avsr_tpu.eval.metrics import ErrorRateAccumulator, levenshtein


def test_align_matches_levenshtein_op_count():
    # local generator: the session rng fixture is a SHARED stream; drawing
    # from it here would shift every later test's data
    rng = np.random.default_rng(42)
    alphabet = list("abcd ")
    for _ in range(50):
        ref = "".join(rng.choice(alphabet, size=rng.integers(0, 12)))
        hyp = "".join(rng.choice(alphabet, size=rng.integers(0, 12)))
        ops = align(list(ref), list(hyp))
        errs = sum(1 for k, _, _ in ops if k != "match")
        assert errs == levenshtein(list(ref), list(hyp)), (ref, hyp)
        # the alignment must reconstruct both sequences
        assert "".join(r for k, r, _ in ops if k in ("match", "sub", "del")) == ref
        assert "".join(h for k, _, h in ops if k in ("match", "sub", "ins")) == hyp


def test_analyze_surfaces_planted_confusions():
    pairs = [
        # 3x b->d substitution, 2x deleted 'x', 1x inserted 'q'
        ("u0", "abba", "adda"),      # two b->d
        ("u1", "bat", "dat"),        # one b->d
        ("u2", "xaxa", "aa"),        # two deleted x
        ("u3", "cc", "cqc"),         # one inserted q
        ("u4", "hello", "hello"),    # clean
    ]
    rep = analyze(pairs, top=3)
    assert rep["num_utterances"] == 5
    assert rep["top_substitutions"][0] == ("b->d", 3)
    assert rep["top_deletions"][0] == ("x", 2)
    assert rep["top_insertions"][0] == ("q", 1)
    # overall CER = total errors / total ref chars
    total_ref = sum(len(r) for _, r, _ in pairs)
    assert np.isclose(rep["cer"], 6 / total_ref)
    worst = rep["worst_utterances"][0]
    assert worst["uid"] in ("u0", "u2", "u3")  # cer 0.5 each
    assert rep["cer_percentiles"]["max"] == 0.5
    assert sum(rep["cer_histogram"].values()) == 5


def test_analyze_surfaces_word_confusions():
    pairs = [
        ("u0", "the cat sat", "the bat sat"),    # cat->bat
        ("u1", "a cat ran", "a bat ran"),        # cat->bat
        ("u2", "see the dog", "see dog"),        # deleted "the"
        ("u3", "go home", "go now home"),        # inserted "now"
    ]
    rep = analyze(pairs, top=3)
    assert rep["top_word_substitutions"][0] == ("cat->bat", 2)
    assert rep["top_word_deletions"][0] == ("the", 1)
    assert rep["top_word_insertions"][0] == ("now", 1)
    # WER still equals word-op count / ref words (4 errors / 11 words)
    assert np.isclose(rep["wer"], 4 / 11)


def test_parse_predictions_roundtrip(tmp_path):
    acc = ErrorRateAccumulator()
    acc.update("the cat", "the bat", uid="a")
    acc.update("", "x", uid="b")       # empty reference
    acc.update("dog", "", uid="c")     # empty hypothesis
    path = str(tmp_path / "predictions_epoch1.txt")
    acc.write_predictions(path)
    triples = parse_predictions(path)
    assert triples == [("a", "the cat", "the bat"), ("b", "", "x"),
                       ("c", "dog", "")]
    rep = analyze_file(path)
    assert np.isclose(rep["cer"], acc.cer)
    assert np.isclose(rep["wer"], acc.wer)


def test_parse_predictions_preserves_leading_space(tmp_path):
    """Space is in the character inventory; a hypothesis/reference that
    STARTS with one must round-trip exactly or the file-derived CER
    disagrees with the eval accumulator's."""
    acc = ErrorRateAccumulator()
    acc.update(" cat", "  cat", uid="s")
    path = str(tmp_path / "predictions_sp.txt")
    acc.write_predictions(path)
    assert parse_predictions(path) == [("s", " cat", "  cat")]
    rep = analyze_file(path)
    assert np.isclose(rep["cer"], acc.cer)


def test_bootstrap_ci_brackets_point_and_degenerates():
    rng = np.random.default_rng(7)
    alphabet = list("abcde ")
    pairs = []
    for i in range(40):
        ref = "".join(rng.choice(alphabet, size=rng.integers(4, 20)))
        # corrupt a few positions
        hyp = list(ref)
        for _ in range(rng.integers(0, 3)):
            if hyp:
                hyp[rng.integers(0, len(hyp))] = rng.choice(alphabet)
        pairs.append((f"u{i}", ref, "".join(hyp)))
    ci = bootstrap_ci(pairs, n_resamples=500, seed=1)
    for m in ("cer", "wer"):
        assert ci[m]["low"] <= ci[m]["point"] <= ci[m]["high"]
        assert ci[m]["high"] - ci[m]["low"] < 0.5
    # deterministic corpus with zero errors -> CI collapses to 0
    clean = [(f"c{i}", "hello there", "hello there") for i in range(10)]
    ci0 = bootstrap_ci(clean, n_resamples=200, seed=2)
    assert ci0["cer"] == {"point": 0.0, "low": 0.0, "high": 0.0}
    # seed-deterministic
    again = bootstrap_ci(pairs, n_resamples=500, seed=1)
    assert again == ci


def test_compare_paired_bootstrap():
    rng = np.random.default_rng(11)
    alphabet = list("abcde ")
    pairs_a, pairs_b = [], []
    for i in range(60):
        ref = "".join(rng.choice(alphabet, size=rng.integers(6, 20)))
        # system A: perfect; system B: one substitution per utterance
        hyp_b = list(ref)
        hyp_b[rng.integers(0, len(hyp_b))] = "z"
        pairs_a.append((f"u{i}", ref, ref))
        pairs_b.append((f"u{i}", ref, "".join(hyp_b)))
    rep = compare(pairs_a, pairs_b, n_resamples=500, seed=3)
    assert rep["num_shared_utterances"] == 60
    assert rep["cer"]["a"] == 0.0
    assert rep["cer"]["delta"] < 0
    assert rep["cer"]["p_value"] < 0.01          # A clearly better
    assert rep["num_a_better"] == 60
    assert rep["b_wins"] == []
    assert len(rep["a_wins"]) == 10
    # identical systems -> delta 0, p-value not significant
    same = compare(pairs_a, pairs_a, n_resamples=200, seed=4)
    assert same["cer"]["delta"] == 0.0
    assert same["cer"]["p_value"] >= 0.9
    assert same["num_tied"] == 60
    # reference mismatch on a shared uid must fail loudly
    tampered = [(u, r + "x", h) for u, r, h in pairs_b]
    with pytest.raises(ValueError, match="reference mismatch"):
        compare(pairs_a, tampered)
    # disjoint uid sets must fail loudly
    renamed = [(u + "_r", r, h) for u, r, h in pairs_b]
    with pytest.raises(ValueError, match="no shared uids"):
        compare(pairs_a, renamed)


def test_cli_analyze_bootstrap_compare(tmp_path):
    acc_a, acc_b = ErrorRateAccumulator(), ErrorRateAccumulator()
    for i in range(12):
        ref = f"utterance number {i}"
        acc_a.update(ref, ref, uid=f"u{i}")                # perfect
        acc_b.update(ref, ref.replace("e", "q"), uid=f"u{i}")
    pa = str(tmp_path / "predictions_a.txt")
    pb = str(tmp_path / "predictions_b.txt")
    acc_a.write_predictions(pa)
    acc_b.write_predictions(pb)
    out = subprocess.run(
        [sys.executable, "-m", "avsr_tpu.cli", "analyze",
         "--predictions", pa, "--compare", pb, "--bootstrap", "300"],
        capture_output=True, text=True, check=True,
    )
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["bootstrap"]["cer"]["point"] == 0.0
    cmp_rep = rep["compare"]
    assert cmp_rep["cer"]["a"] == 0.0
    assert cmp_rep["cer"]["b"] > 0.0
    assert cmp_rep["cer"]["p_value"] < 0.05
    assert cmp_rep["b_predictions_file"] == pb


def test_cli_analyze(tmp_path):
    acc = ErrorRateAccumulator()
    acc.update("abc", "adc", uid="u0")
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    acc.write_predictions(str(run_dir / "predictions_epoch3.txt"))
    out = subprocess.run(
        [sys.executable, "-m", "avsr_tpu.cli", "analyze",
         "--run-dir", str(run_dir)],
        capture_output=True, text=True, check=True,
    )
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["top_substitutions"][0] == ["b->d", 1]
    assert rep["predictions_file"].endswith("predictions_epoch3.txt")
