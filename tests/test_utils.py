"""Direct coverage for the utils subsystem: profiling/sanitizers
(SURVEY.md §5.1-5.2), structured logging (§5.5), and the analytic FLOPs
model behind bench.py's MFU accounting (BASELINE.md §C)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.utils.flops import peak_flops_of, train_step_flops
from avsr_tpu.utils.logging import MetricsLogger
from avsr_tpu.utils.profiling import StepTimer, assert_finite, sanitize, trace
from tests.test_seq2seq import tiny_config


def test_sanitize_raises_on_nan():
    with pytest.raises(FloatingPointError):
        with sanitize():
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))


def test_sanitize_restores_config():
    before = jax.config.jax_debug_nans
    with sanitize():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_assert_finite():
    assert_finite({"a": jnp.ones((2, 2)), "ids": jnp.zeros((2,), jnp.int32)})
    with pytest.raises(AssertionError):
        assert_finite({"a": jnp.asarray([1.0, float("nan")])})


def test_step_timer_warmup_and_stats():
    t = StepTimer(warmup=2)
    for _ in range(6):
        t.start()
        t.stop(jnp.zeros(()))
    assert len(t.times) == 4  # first 2 are warmup
    assert t.mean > 0 and t.p50 > 0 and t.steps_per_sec() > 0


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.jit(lambda x: x * 2)(jnp.ones((4,))).block_until_ready()
    # jax.profiler writes a plugins/profile tree under the logdir
    found = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert found, "profiler produced no trace files"


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), logfile=str(tmp_path / "run.log"))
    logger.log("train", step=3, loss=1.5, bucket=0)
    logger.info("hello")
    logger.close()
    rows = [json.loads(line)
            for line in open(tmp_path / "metrics.jsonl", encoding="utf-8")]
    assert rows[0]["kind"] == "train"
    assert rows[0]["loss"] == 1.5 and rows[0]["step"] == 3.0
    assert "hello" in open(tmp_path / "run.log", encoding="utf-8").read()


def test_flops_model_scales_and_covers_components():
    cfg = tiny_config("av_align")
    kw = dict(audio_samples=8000, video_frames=10, label_len=6, vocab=12)
    f1 = train_step_flops(cfg, batch=2, **kw)
    f2 = train_step_flops(cfg, batch=4, **kw)
    assert f1["total"] > 0 and f1["forward"] > 0
    assert f1["total"] > f1["forward"]  # backward factor applied
    # matmul FLOPs are linear in batch
    np.testing.assert_allclose(f2["total"], 2.0 * f1["total"], rtol=1e-6)
    # all four regimes produce finite positive totals
    for arch in ("audio", "video", "av_align", "bimodal"):
        f = train_step_flops(tiny_config(arch), batch=2, **kw)
        assert f["total"] > 0, arch


def test_peak_flops_lookup():
    class Fake:
        device_kind = "TPU v5 lite"

    assert peak_flops_of(Fake()) > 1e14


def test_bench_knobs_flagship_and_v2(monkeypatch):
    from avsr_tpu.utils.bench_knobs import variant_from_env

    for k in list(__import__("os").environ):
        if k.startswith("AVSR_BENCH_"):
            monkeypatch.delenv(k)
    v = variant_from_env()
    assert v.fusion_value_dim == 256 and v.decoder_value_dim == 256
    assert v.fusion_type == "av_align" and v.decoder_type == "rnn"
    assert v.audio_encoder.hidden_units == (256, 256, 256)
    assert v.audio_encoder.bidirectional
    assert v.decoder_sampling_probability == 0.1

    monkeypatch.setenv("AVSR_BENCH_XF", "512,3,8")
    monkeypatch.setenv("AVSR_BENCH_XF_VIDEO", "512,1,8")
    monkeypatch.setenv("AVSR_BENCH_FUSION_TYPE", "cross_attention")
    monkeypatch.setenv("AVSR_BENCH_DECODER_TYPE", "transformer")
    monkeypatch.setenv("AVSR_BENCH_FUSION_VDIM", "0")
    monkeypatch.setenv("AVSR_BENCH_TIME_REDUCTION", "1,2")
    v2 = variant_from_env()
    assert v2.audio_encoder.encoder_type == "transformer"
    assert v2.audio_encoder.num_heads == 8
    assert v2.audio_encoder.time_reduction == (1, 2)
    assert v2.video_encoder.hidden_units == (512,)
    assert v2.fusion_value_dim is None
    # scheduled sampling is rejected by the transformer decoder
    assert v2.decoder_sampling_probability == 0.0
