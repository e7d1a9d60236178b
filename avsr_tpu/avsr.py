"""Public experiment API: the ``AVSR`` class.

Surface parity with the reference's public train/eval/decode API
(upstream:avsr/avsr.py, SURVEY.md §2.2 row 1, §3.5): the constructor takes
the full knob set (unit type + unit file, record paths per modality,
architecture switch, encoder/decoder sizes, attention type, batch size, LR,
dropout, scheduled-sampling probability, beam width, max label length,
SNR/noise selection) and exposes ``train(num_epochs, logfile,
try_restore_latest_checkpoint)`` and ``evaluate(checkpoint, epoch)``
[BASELINE.json:north_star: "Match the reference's public train/eval/decode
API"].

Underneath it is pure TPU-native machinery: jitted XLA train/eval programs,
bucketing loader, orbax checkpoints.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from avsr_tpu.configs import (
    AudioFrontendConfig,
    DataConfig,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    FusionConfig,
    NoiseConfig,
    TrainConfig,
    VideoFrontendConfig,
)
from avsr_tpu.data import tfrecord
from avsr_tpu.data.loader import BucketingLoader
from avsr_tpu.data.units import load_or_builtin
from avsr_tpu.train.loop import Trainer


class AVSR:
    """One experiment: datasets + model + training/eval state.

    Accepts either a ready ``ExperimentConfig`` via ``config=``, or the
    reference-style flat kwargs listed below.
    """

    def __init__(
        self,
        *,
        config: Optional[ExperimentConfig] = None,
        # ---- reference-style knobs (SURVEY §3.5) ----
        unit: str = "character",
        unit_file: Optional[str] = None,
        audio_train_record: Optional[str] = None,
        audio_test_record: Optional[str] = None,
        video_train_record: Optional[str] = None,
        video_test_record: Optional[str] = None,
        architecture: str = "audio",  # audio | video | av_align | bimodal
        encoder_units_per_layer: Sequence[int] = (256, 256, 256),
        video_encoder_units_per_layer: Sequence[int] = (256,),
        decoder_units_per_layer: Sequence[int] = (256,),
        cell_type: str = "lstm",
        bidirectional: bool = True,
        attention_type: str = "bahdanau",
        embedding_size: int = 128,
        batch_size: int = 32,
        learning_rate: float = 1e-3,
        lr_decay: float = 0.0,
        optimizer: str = "adam",
        max_gradient_norm: float = 1.0,
        dropout_probability: float = 0.1,
        sampling_probability: float = 0.0,
        sampling_ramp_steps: int = 0,
        beam_width: int = 10,
        max_label_length: int = 150,
        noise_snr_db: Optional[Sequence[float]] = None,
        # one record path (anonymous type) or {type: path} (babble/cafe)
        noise_bank_record: "Optional[str | Dict[str, str]]" = None,
        au_loss_weight: float = 0.0,
        compute_dtype: str = "bfloat16",
        run_dir: Optional[str] = None,
        num_epochs: int = 100,
        seed: int = 42,
        # in-memory data injection (tests / synthetic experiments)
        train_utterances=None,
        eval_utterances=None,
        # [N, L] array (anonymous type) or {type: [Ni, Li]} typed bank
        noise_bank: "Optional[np.ndarray | Dict[str, np.ndarray]]" = None,
        mesh=None,
    ):
        if config is None:
            config = ExperimentConfig(
                architecture=architecture,
                audio=AudioFrontendConfig(),
                video=VideoFrontendConfig(embedding_dim=embedding_size),
                audio_encoder=EncoderConfig(
                    cell_type=cell_type,
                    hidden_units=tuple(encoder_units_per_layer),
                    bidirectional=bidirectional,
                    dropout_rate=dropout_probability,
                ),
                video_encoder=EncoderConfig(
                    cell_type=cell_type,
                    hidden_units=tuple(video_encoder_units_per_layer),
                    bidirectional=bidirectional,
                    dropout_rate=dropout_probability,
                ),
                fusion=FusionConfig(
                    attention_type=attention_type, au_loss_weight=au_loss_weight
                ),
                decoder=DecoderConfig(
                    embedding_dim=embedding_size,
                    hidden_units=tuple(decoder_units_per_layer),
                    attention_type=attention_type,
                    dropout_rate=dropout_probability,
                    sampling_probability=sampling_probability,
                    sampling_ramp_steps=sampling_ramp_steps,
                    max_label_length=max_label_length,
                ),
                noise=NoiseConfig(
                    enabled=noise_snr_db is not None,
                    snr_db=tuple(noise_snr_db) if noise_snr_db else
                    NoiseConfig().snr_db,
                ),
                data=DataConfig(
                    unit=unit,
                    unit_file=unit_file,
                    audio_train_records=audio_train_record,
                    audio_eval_records=audio_test_record,
                    video_train_records=video_train_record,
                    video_eval_records=video_test_record,
                    batch_size=batch_size,
                    max_label_length=max_label_length,
                ),
                train=TrainConfig(
                    learning_rate=learning_rate,
                    lr_decay=lr_decay,
                    optimizer=optimizer,
                    max_gradient_norm=max_gradient_norm,
                    num_epochs=num_epochs,
                    compute_dtype=compute_dtype,
                    seed=seed,
                ),
                decode=DecodeConfig(
                    beam_width=beam_width, max_decode_length=max_label_length
                ),
                name=f"{architecture}_{unit}",
            )
        self.config = config
        self.unit_dict = load_or_builtin(config.data.unit_file, config.data.unit)

        # Record-path datasets open as STREAMING random-access sources: the
        # loader decodes records lazily per epoch, so corpus size (LRS2:
        # multi-GB) never bounds host RSS (SURVEY §2.2 row 10, §2.3 row 5).
        # AV runs INNER-join the two record files by uid with a logged drop
        # count (reference two-record iterator semantics).
        train_utts = train_utterances
        if train_utts is None and config.data.audio_train_records:
            train_utts = _open_source(
                config.data.audio_train_records,
                config.data.video_train_records,
            )
        eval_utts = eval_utterances
        if eval_utts is None and config.data.audio_eval_records:
            eval_utts = _open_source(
                config.data.audio_eval_records,
                config.data.video_eval_records,
            )
        if train_utts is None and config.data.video_train_records:
            train_utts = _open_source(config.data.video_train_records, None)
        if eval_utts is None and config.data.video_eval_records:
            eval_utts = _open_source(config.data.video_eval_records, None)
        self._has_train_data = train_utts is not None
        if train_utts is None:
            if eval_utts is None:
                raise ValueError(
                    "no data: pass train/eval record paths or utterances"
                )
            # EVAL-ONLY construction (evaluate / export / analyze /
            # average-checkpoints machines need no training TFRecords):
            # the eval set stands in for schedule/warmup metadata only;
            # train() refuses below.
            train_utts = eval_utts

        need_audio = config.architecture in ("audio", "av_align", "bimodal")
        need_video = config.architecture in ("video", "av_align", "bimodal")
        au_stacking = None
        if config.architecture == "av_align" and config.fusion.au_loss_weight > 0:
            au_stacking = (config.audio.frame_stacking, config.audio.frame_skipping)
        mk = lambda utts: BucketingLoader(
            utts, self.unit_dict, config.data,
            require_audio=need_audio, require_video=need_video,
            frame_step=config.audio.frame_step,
            frame_length=config.audio.frame_length,
            au_target_stacking=au_stacking,
            au_dim=config.fusion.au_dim,
        )
        self.train_loader = mk(train_utts)
        self.eval_loader = mk(eval_utts) if eval_utts is not None else None

        if noise_bank is None and not noise_bank_record:
            # config-file/CLI route: noise.bank_records ((type, path), ...)
            if config.noise.bank_records:
                noise_bank_record = {
                    name: path for name, path in config.noise.bank_records
                }
        if noise_bank is None and noise_bank_record:
            noise_bank = _load_noise_bank(noise_bank_record)

        # Config-driven mesh (train.num_data_shards x train.num_model_shards):
        # data parallelism over the batch axis plus optional tensor
        # parallelism over the model axis (parallel/tp.py).  An explicitly
        # passed mesh wins; both knobs at 1 keeps the single-device path.
        if mesh is None and (
            config.train.num_data_shards > 1
            or config.train.num_model_shards > 1
        ):
            from avsr_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(
                num_data=config.train.num_data_shards,
                num_model=config.train.num_model_shards,
            )

        self.trainer = Trainer(
            config, self.unit_dict, self.train_loader, self.eval_loader,
            run_dir=run_dir, noise_bank=noise_bank, mesh=mesh,
        )

    # -- reference-parity entry points -----------------------------------

    def train(
        self,
        num_epochs: Optional[int] = None,
        logfile: Optional[str] = None,
        try_restore_latest_checkpoint: bool = False,
    ) -> Dict[str, float]:
        if not self._has_train_data:
            raise ValueError(
                "train() called on an eval-only AVSR (constructed without "
                "training data); pass data.*_train_records or utterances"
            )
        if logfile:
            # Attach to the Trainer's existing logger — constructing a
            # second MetricsLogger would leak the first one's open
            # metrics.jsonl / TensorBoard event files.
            self.trainer.logger.add_logfile(logfile)
        return self.trainer.train(
            num_epochs,
            try_restore_latest_checkpoint=try_restore_latest_checkpoint,
        )

    def evaluate(
        self,
        checkpoint: Optional[str] = None,
        epoch: Optional[int] = None,
        use_beam: bool = True,
    ) -> Dict[str, float]:
        """Evaluate the eval set; ``checkpoint`` restores an explicit step
        (an int, a step string, or a path ending in the step directory).

        An unresolvable or missing checkpoint FAILS LOUDLY — silently
        evaluating the wrong model is worse than an error.  Likewise a
        NEVER-TRAINED state: with no checkpoint on disk and no training done
        in this session, evaluation would score freshly-initialized params
        (~100% WER) with no hint why, so it raises instead."""
        self._restore_for_eval(checkpoint)
        return self.trainer.evaluate(epoch=epoch, use_beam=use_beam)

    def _restore_for_eval(self, checkpoint: Optional[str]) -> None:
        """Restore-for-scoring policy shared by evaluate() and the noise
        matrix: explicit checkpoint > in-session state (params trained,
        averaged, or restored THIS session are never silently clobbered) >
        latest on disk > fail loudly on a never-trained model."""
        if checkpoint is not None:
            step = self._resolve_checkpoint_step(checkpoint)
            self.trainer.state, _, _ = self.trainer.ckpt.restore(
                self.trainer.state, step
            )
            self.trainer._host_step = step
        elif self.trainer._host_step != 0:
            return  # keep in-session state (e.g. an unsaved average)
        elif self.trainer.ckpt.latest_step() is not None:
            self.trainer.state, _, step = self.trainer.ckpt.restore(
                self.trainer.state
            )
            self.trainer._host_step = int(step)
        else:
            raise RuntimeError(
                "evaluate() called on a never-trained model: no checkpoint "
                f"under {self.trainer.ckpt.directory} and no training steps "
                "taken this session — the result would score randomly-"
                "initialized parameters.  Train first, or pass checkpoint=."
            )

    def _resolve_checkpoint_step(self, checkpoint) -> int:
        """checkpoint -> step int; raises on anything unresolvable.

        ``"best"`` resolves through run_dir/best.json (written whenever an
        in-train eval improves the CER; that step is pinned against keep-N
        pruning)."""
        if isinstance(checkpoint, str) and checkpoint == "best":
            import json

            path = os.path.join(self.trainer.run_dir, "best.json")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"checkpoint='best' but no best.json under "
                    f"{self.trainer.run_dir} — it is written when training "
                    "runs with an eval set"
                )
            with open(path) as f:
                step = int(json.load(f)["step"])
        elif isinstance(checkpoint, int):
            step = checkpoint
        else:
            ck = os.path.normpath(str(checkpoint))
            base = os.path.basename(ck)
            try:
                step = int(base)
            except ValueError:
                raise ValueError(
                    f"cannot resolve checkpoint {checkpoint!r}: expected a "
                    f"step number or a path ending in the step directory "
                    f"(e.g. .../checkpoints/42)"
                ) from None
            # A full path must point INTO this run's checkpoint directory —
            # restoring 'step 42' from some other run's path would silently
            # load the wrong model.
            parent = os.path.dirname(os.path.abspath(ck))
            if base != ck and parent != self.trainer.ckpt.directory:
                raise ValueError(
                    f"checkpoint path {checkpoint!r} is not under this "
                    f"run's checkpoint directory {self.trainer.ckpt.directory}"
                )
        if step not in (self.trainer.ckpt.all_steps() or []):
            raise FileNotFoundError(
                f"no checkpoint for step {step} under "
                f"{self.trainer.ckpt.directory}; available: "
                f"{self.trainer.ckpt.all_steps()}"
            )
        return step

    def decode(self, use_beam: bool = True):
        """Decode the eval set; returns the ErrorRateAccumulator-style summary."""
        return self.trainer.evaluate(use_beam=use_beam)

    def evaluate_noise_matrix(self, snrs=(None, 20.0, 10.0, 0.0, -5.0),
                              noise_types=None, use_beam: bool = True,
                              checkpoint: Optional[str] = None):
        """Per-(noise type x SNR)-condition evaluation (reference workflow:
        error-rate files per condition, e.g. babble_0dB / cafe_0dB).

        Same restore policy as ``evaluate`` — in particular a fresh
        process with checkpoints on disk restores the latest instead of
        silently scoring freshly-initialized params across every
        condition."""
        self._restore_for_eval(checkpoint)
        return self.trainer.evaluate_noise_matrix(
            snrs, noise_types=noise_types, use_beam=use_beam
        )

    def predict(self, utterances, use_beam: bool = True, n_best: int = 1):
        """Transcribe raw utterances -> list of (uid, hypothesis) pairs.

        Convenience inference API: accepts in-memory Utterance objects (only
        the modalities the architecture needs must be present) and runs the
        full frontend + encoder + beam/greedy decode pipeline.  Restores the
        latest checkpoint when one exists and nothing was trained this
        session; a never-trained model with no checkpoint raises (silently
        transcribing with random params helps nobody).

        ``n_best > 1`` (beam only) returns
        ``(uid, [(hypothesis, score), ...])`` pairs ranked best-first with
        length-normalized log-prob scores — the rescoring/analysis surface
        the reference's top-1-only BeamSearchDecoder lacks.
        """
        import numpy as np

        from avsr_tpu.data.loader import BucketingLoader, to_model_batch

        if self.trainer._host_step == 0:
            if self.trainer.ckpt.latest_step() is not None:
                self.trainer.state, _, step = self.trainer.ckpt.restore(
                    self.trainer.state
                )
                self.trainer._host_step = int(step)
            else:
                raise RuntimeError(
                    "predict() called on a never-trained model: no "
                    f"checkpoint under {self.trainer.ckpt.directory} and no "
                    "training steps taken this session.  Train first, or "
                    "point run_dir at a trained run."
                )

        cfg = self.config
        need_audio = cfg.architecture in ("audio", "av_align", "bimodal")
        need_video = cfg.architecture in ("video", "av_align", "bimodal")
        loader = BucketingLoader(
            list(utterances), self.unit_dict, cfg.data,
            require_audio=need_audio, require_video=need_video,
            frame_step=cfg.audio.frame_step,
            frame_length=cfg.audio.frame_length,
        )
        if n_best > 1 and not use_beam:
            raise ValueError("n_best > 1 requires use_beam=True")
        if n_best > self.config.decode.beam_width:
            raise ValueError(
                f"n_best {n_best} exceeds decode.beam_width "
                f"{self.config.decode.beam_width}"
            )
        decode_fn = self.trainer._make_decode_fn(use_beam, n_best=n_best)
        out = []

        def drain(res, np_batch) -> None:
            if n_best > 1:
                ids, scores = np.asarray(res[0]), np.asarray(res[1])
                for j in range(np_batch["num_real"]):
                    alts = [
                        (self.unit_dict.decode(ids[j, r]),
                         float(scores[j, r]))
                        for r in range(ids.shape[1])
                    ]
                    out.append((np_batch["uids"][j], alts))
            else:
                ids = np.asarray(res)
                for j in range(np_batch["num_real"]):
                    out.append(
                        (np_batch["uids"][j], self.unit_dict.decode(ids[j]))
                    )

        # One-deep dispatch-ahead pipeline (same shape as Trainer.evaluate):
        # batch i+1's decode program is queued before batch i's ids are
        # fetched, overlapping device decode with host id->text work.
        pending = None
        for _, np_batch in loader.epoch(shuffle=False):
            res = decode_fn(
                self.trainer.state.params, to_model_batch(np_batch)
            )
            if pending is not None:
                drain(*pending)
            pending = (res, np_batch)
        if pending is not None:
            drain(*pending)
        return out


def _load_noise_bank(record: "str | Dict[str, str]"):
    """Noise-bank records -> per-type waveform arrays.

    ``record`` is one TFRecord path (single anonymous type) or a
    {type_name: path} mapping (babble/cafe banks, SURVEY §3.3).  Each type's
    waveforms are CONCATENATED into one long [1, L] row — noise segments are
    sampled by offset into it on device — rather than cyclically tiled to a
    common length (np.resize would introduce periodic noise artifacts and a
    large [N, max_len] array)."""

    def one(path: str) -> np.ndarray:
        rows = [
            np.asarray(u.waveform, np.float32)
            for u in tfrecord.read_dataset(path)
            if u.waveform is not None
        ]
        if not rows:
            raise ValueError(f"noise bank record {path!r} has no waveforms")
        return np.concatenate(rows)[None, :]

    if isinstance(record, dict):
        return {name: one(path) for name, path in record.items()}
    return one(record)


def _open_source(records: str, video_records: Optional[str]):
    """Open record file(s) as a lazy random-access source; with a video
    record file, INNER-join by uid (reference:
    make_iterator_from_two_records, SURVEY §2.2 row 10).  Paths may be
    single files, shard globs (``train-*.tfrecord``), or comma-separated
    lists — sharded corpora read as one dataset."""
    from avsr_tpu.data.grain_loader import JoinedAVSource, open_sharded

    src = open_sharded(records)
    if video_records:
        return JoinedAVSource(src, open_sharded(video_records))
    return src
