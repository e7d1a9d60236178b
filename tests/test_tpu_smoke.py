"""TPU smoke tier (SURVEY.md §4.6): compile + one step against the REAL
device.

The main suite forces CPU (conftest.py), so these tests drive a SUBPROCESS
without the CPU override — it picks up the environment's axon TPU plugin.
Run with ``AVSR_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_smoke.py``;
skipped otherwise (device compiles take minutes and the suite budget is CPU).
"""

import os
import subprocess
import sys

import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("AVSR_TPU_TESTS") != "1",
        reason="TPU smoke tier disabled (set AVSR_TPU_TESTS=1)",
    ),
]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SMOKE = r"""
import jax, numpy as np
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
print("device:", dev)

from avsr_tpu.configs import (AudioFrontendConfig, DataConfig, DecodeConfig,
                              DecoderConfig, EncoderConfig, ExperimentConfig,
                              TrainConfig)
from avsr_tpu.data.loader import to_model_batch, BucketingLoader
from avsr_tpu.data.synthetic import SyntheticSpec, generate
from avsr_tpu.data.units import builtin_unit_dict
from avsr_tpu.train import step as step_lib

cfg = ExperimentConfig(
    architecture="audio",
    audio=AudioFrontendConfig(num_mel_bins=12, fft_length=256,
                              frame_stacking=3, frame_skipping=3,
                              add_deltas=False),
    audio_encoder=EncoderConfig(hidden_units=(32,), dropout_rate=0.0),
    decoder=DecoderConfig(embedding_dim=8, hidden_units=(32,),
                          attention_units=16, max_label_length=8,
                          dropout_rate=0.0),
    data=DataConfig(batch_size=4, audio_bucket_boundaries=(60,),
                    max_label_length=8),
    train=TrainConfig(compute_dtype="bfloat16"),
    decode=DecodeConfig(beam_width=2, max_decode_length=8),
)
units = builtin_unit_dict("character")
data = generate(SyntheticSpec(num_utterances=4, min_chars=2, max_chars=3,
                              seed=0, alphabet="ab", char_duration_s=0.1))
loader = BucketingLoader(data, units, cfg.data, require_audio=True,
                         frame_step=cfg.audio.frame_step,
                         frame_length=cfg.audio.frame_length)
state, tx = step_lib.create_train_state(jax.random.PRNGKey(0), cfg,
                                        units.vocab_size)
train = step_lib.make_jitted_train_step(cfg, tx)
_, np_batch = next(iter(loader.epoch(shuffle=False)))
state, metrics = train(state, to_model_batch(np_batch), jax.random.PRNGKey(1))
loss = float(metrics["loss"])  # host sync (device timing rule, CLAUDE.md)
assert np.isfinite(loss), loss
print("TPU_SMOKE_OK loss", loss)
"""


def _run_on_device(script: str, timeout: int = 900):
    env = dict(os.environ)
    # drop the CPU forcing the parent test process may carry
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        cwd=_REPO, env=env, timeout=timeout,
    )


def test_tpu_compile_and_train_step():
    out = _run_on_device(_SMOKE)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TPU_SMOKE_OK" in out.stdout, out.stdout


def test_tpu_graft_entry_forward():
    out = _run_on_device(
        "import jax, numpy as np\n"
        "from __graft_entry__ import entry\n"
        "fn, args = entry()\n"
        "y = jax.jit(fn)(*args)\n"
        "leaf = jax.tree_util.tree_leaves(y)[0]\n"
        "assert np.isfinite(np.asarray(leaf)).all()\n"
        "print('ENTRY_OK', jax.devices()[0])\n"
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ENTRY_OK" in out.stdout, out.stdout
