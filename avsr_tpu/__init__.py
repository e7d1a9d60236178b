"""avsr_tpu: TPU-native audio-visual speech recognition framework.

A from-scratch JAX/XLA rebuild of the capabilities of
georgesterpu/avsr-tf1 (see SURVEY.md): seq2seq AVSR with log-mel audio and
lip-ROI CNN video frontends, (Bi)LSTM encoders, AV-Align cross-modal
attention fusion, attention character decoders, batched beam search,
on-device SNR noise mixing, and a pjit data-parallel training loop.
"""

__version__ = "0.1.0"

from avsr_tpu.configs import ExperimentConfig, PRESETS  # noqa: F401
