"""Error-analysis surface (eval/analysis.py + `cli analyze`).

Alignment must agree with the Levenshtein kernel on op counts; aggregates
must surface planted confusions; the CLI must parse real prediction files
written by ErrorRateAccumulator.
"""

import json
import subprocess
import sys

import numpy as np

from avsr_tpu.eval.analysis import align, analyze, analyze_file, parse_predictions
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
