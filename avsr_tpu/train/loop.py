"""Training loop: epochs, evaluation, checkpointing, metrics.

Rebuild of the reference's ``AVSR.train`` / ``AVSR.evaluate`` epoch loop
(upstream:avsr/avsr.py, SURVEY.md §3.1-3.2) on the jitted step functions:
per-epoch (and per-K-step) orbax checkpoints, auto-resume from latest,
greedy or width-K beam evaluation producing prediction files and CER/WER,
JSONL metrics with frames/sec throughput.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.configs import ExperimentConfig
from avsr_tpu.data.loader import BucketingLoader, to_model_batch
from avsr_tpu.data.units import UnitDict
from avsr_tpu.decode.beam import beam_search
from avsr_tpu.decode.greedy import greedy_decode
from avsr_tpu.eval.metrics import ErrorRateAccumulator
from avsr_tpu.models import seq2seq
from avsr_tpu.train import step as step_lib
from avsr_tpu.train.checkpoint import CheckpointManager
from avsr_tpu.train.optim import build_optimizer
from avsr_tpu.utils.logging import MetricsLogger


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        unit_dict: UnitDict,
        train_loader: BucketingLoader,
        eval_loader: Optional[BucketingLoader] = None,
        *,
        run_dir: Optional[str] = None,
        noise_bank: Optional[np.ndarray] = None,
        logfile: Optional[str] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.units = unit_dict
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.run_dir = run_dir or os.path.join("runs", cfg.name)
        self.logger = MetricsLogger(self.run_dir, logfile,
                                    tensorboard=cfg.train.tensorboard)
        self.mesh = mesh
        if mesh is not None:
            # batch-axis sharding needs every bucket's batch size to divide
            # evenly over the data axis; catching it here beats an opaque
            # XLA sharding error mid-epoch.
            from avsr_tpu.parallel.mesh import DATA_AXIS

            n_data = mesh.shape[DATA_AXIS]
            sizes = set(cfg.data.bucket_batch_sizes or ()) | {
                cfg.data.batch_size
            }
            bad = sorted(b for b in sizes if b % n_data)
            if bad:
                raise ValueError(
                    f"batch sizes {bad} are not divisible by the mesh's "
                    f"data axis ({n_data} shards); adjust data.batch_size/"
                    f"data.bucket_batch_sizes"
                )
        # Gradient accumulation: validate factors up front (a bad factor
        # otherwise surfaces as an opaque reshape/scan error mid-epoch).
        bga = cfg.data.bucket_grad_accum
        if cfg.train.grad_accum_steps < 1:
            raise ValueError("train.grad_accum_steps must be >= 1")
        if bga:
            bbs = cfg.data.bucket_batch_sizes
            if bbs and len(bga) != len(bbs):
                raise ValueError(
                    f"data.bucket_grad_accum ({len(bga)}) must match "
                    f"data.bucket_batch_sizes ({len(bbs)})"
                )
            for i, a in enumerate(bga):
                bsz = bbs[i] if bbs else cfg.data.batch_size
                if a < 1 or bsz % a:
                    raise ValueError(
                        f"bucket {i}: grad accum {a} must divide its batch "
                        f"size {bsz}"
                    )
        elif cfg.train.grad_accum_steps > 1:
            for bsz in set(cfg.data.bucket_batch_sizes or ()) | {
                cfg.data.batch_size
            }:
                if bsz % cfg.train.grad_accum_steps:
                    raise ValueError(
                        f"train.grad_accum_steps "
                        f"({cfg.train.grad_accum_steps}) must divide every "
                        f"batch size (got {bsz})"
                    )
        self.noise_bank = None
        if noise_bank is not None:
            from avsr_tpu.ops.noise import NoiseBank

            bank = NoiseBank.create(noise_bank)
            # NoiseConfig.noise_types selects which named types train/eval
            # may draw from; it applies only to typed banks (a plain-array
            # bank has one anonymous type).  Unknown names fail loudly.
            if bank.num_types > 1 and cfg.noise.noise_types:
                keep = tuple(cfg.noise.noise_types)
                idxs = [bank.type_index(n) for n in keep]
                bank = NoiseBank(keep, tuple(bank.banks[i] for i in idxs))
            self.noise_bank = bank

        steps_per_epoch = max(len(train_loader), 1)
        self._steps_per_epoch = steps_per_epoch
        rng = jax.random.PRNGKey(cfg.train.seed)
        self.state, self.tx = step_lib.create_train_state(
            rng, cfg, unit_dict.vocab_size, steps_per_epoch
        )
        from avsr_tpu.utils.params import param_count

        self.logger.info(
            f"model: {param_count(self.state.params):,} params "
            f"({cfg.architecture}, vocab {unit_dict.vocab_size})"
        )
        # Tensor parallelism (beyond-parity scale-out, parallel/tp.py):
        # when the mesh has a model axis, shard params + Adam slots over it
        # and pin the step's output state to the same shards.
        self._state_shardings = None
        if mesh is not None:
            from avsr_tpu.parallel.mesh import MODEL_AXIS

            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                from avsr_tpu.parallel import tp

                self.state = tp.shard_train_state(mesh, self.state, self.tx)
                self._state_shardings = tp.train_state_shardings(
                    mesh, self.state, self.tx
                )
                self.logger.info(
                    tp.describe(
                        self.state.params, int(mesh.shape[MODEL_AXIS])
                    )
                )
        # One jitted program per (bucket shape, accum factor); the cache
        # keys on accum, XLA's jit cache keys on shapes.
        self._train_step_cache = {}
        self.ckpt = CheckpointManager(
            os.path.join(self.run_dir, cfg.train.checkpoint_dir),
            keep=cfg.train.keep_checkpoints,
        )
        self.epoch = 0
        # Host-side mirror of state.step: reading int(self.state.step) every
        # step would force a per-step device sync (the relay charges ~27 ms
        # per sync — CLAUDE.md timing notes) and serialize dispatch; the step
        # advances by exactly 1 per train_step call, so the host can track it
        # without ever touching the device.
        self._host_step = 0
        # Batches already consumed in the in-progress epoch at restore time
        # (data-iterator state, SURVEY §5.4): train() fast-forwards past them
        # so a mid-epoch resume continues bit-exactly instead of replaying.
        self._resume_batches = 0
        # Best-eval tracking: lowest in-train eval CER so far, persisted to
        # run_dir/best.json and pinned against keep-N pruning; feeds
        # train.early_stop_patience.
        self._best_cer = float("inf")
        self._evals_since_best = 0
        self._best_record = None
        self._load_best_record()
        self._data_rng = jax.random.PRNGKey(cfg.train.seed + 1)
        # jitted decode/eval fns cached per cfg: evaluate() runs every epoch
        # (and once per noise condition) and a fresh jit each call would
        # recompile (minutes on TPU)
        self._decode_cache = {}
        # Graceful-preemption flag (SURVEY §5.3): set by request_stop() /
        # SIGTERM during train(); the loop checkpoints the exact iterator
        # position and returns, so the next --resume run continues
        # bit-exactly (same guarantee as the SIGKILL path, without losing
        # the batches since the last periodic save).
        self._stop_requested = False

    def _train_step_for_accum(self, accum: int):
        fn = self._train_step_cache.get(accum)
        if fn is None:
            fn = step_lib.make_jitted_train_step(
                self.cfg, self.tx, mesh=self.mesh,
                noise_bank=self.noise_bank,
                state_shardings=self._state_shardings, accum=accum,
            )
            self._train_step_cache[accum] = fn
        return fn

    def _accum_for(self, bucket: int) -> int:
        bga = self.cfg.data.bucket_grad_accum
        if bga:
            return max(int(bga[bucket]), 1)
        return max(self.cfg.train.grad_accum_steps, 1)

    def average_checkpoints(
        self, steps=None, last_n: int = 5, save: bool = True
    ) -> int:
        """Average the last-N (or given) checkpoints' parameters, adopt the
        result as the current state, and (by default) save it as a NEW
        checkpoint step (newest averaged step + 1) so ``evaluate
        --checkpoint`` and ``export`` can target it.  Returns that step."""
        state, used = self.ckpt.average(self.state, steps=steps,
                                        last_n=last_n)
        if self._state_shardings is not None:
            state = jax.device_put(state, self._state_shardings)
        self.state = state
        self._host_step = int(used[-1])
        # Past the NEWEST checkpoint on disk, not just the newest averaged
        # one: averaging older steps must never clobber (or silently skip
        # over) a real later checkpoint.
        new_step = max(self.ckpt.all_steps()) + 1
        if save:
            # The saved payload's step must equal its label: restore
            # derives rng folds, on-device schedules (lr / sampling ramp),
            # and the next save's label from state.step — a payload step
            # of used[-1] under label new_step would desync them forever.
            step_arr = jnp.asarray(new_step, dtype=self.state.step.dtype)
            if self._state_shardings is not None:
                step_arr = jax.device_put(
                    step_arr, self._state_shardings.step
                )
            self.state = self.state._replace(step=step_arr)
            self.ckpt.save(
                new_step, self.state,
                {"epoch": self.epoch, "averaged_from": used},
            )
            self._host_step = new_step
        self.logger.info(
            f"averaged checkpoints {used}"
            + (f" -> saved as step {new_step}" if save else "")
        )
        return new_step if save else used[-1]

    def request_stop(self) -> None:
        """Ask the running train() loop to checkpoint and return after the
        current step (signal-handler safe: only sets a flag)."""
        self._stop_requested = True

    # ------------------------------------------------------------------

    def try_restore_latest_checkpoint(self) -> bool:
        """Resume from the newest checkpoint if one exists (parity with the
        reference's train(try_restore_latest_checkpoint=True) flag)."""
        if self.ckpt.latest_step() is None:
            return False
        self.restore_checkpoint()
        return True

    def restore_checkpoint(self, step: Optional[int] = None) -> int:
        """Restore params/opt-state/step plus the data-iterator position
        (epoch + batches consumed in it); ``step=None`` = latest.  Training
        then continues bit-exactly identical to an uninterrupted run: the
        loader's shuffle order is deterministic in (seed, epoch) and every
        in-step rng is folded from the restored ``state.step``."""
        self.state, extra, step = self.ckpt.restore(self.state, step=step)
        if self._state_shardings is not None:
            # orbax restores onto default devices; put the tree back on its
            # model-axis shards before the (donating) train step sees it.
            self.state = jax.device_put(self.state, self._state_shardings)
        self.epoch = int(extra.get("epoch", 0)) if extra else 0
        self._resume_batches = int(extra.get("batches_done", 0)) if extra else 0
        self._host_step = int(step)
        self.train_loader.set_epoch(self.epoch)
        self.logger.info(
            f"restored checkpoint at step {step}, epoch {self.epoch}"
            + (f" (+{self._resume_batches} batches)"
               if self._resume_batches else "")
        )
        return int(step)

    def train(
        self,
        num_epochs: Optional[int] = None,
        *,
        try_restore_latest_checkpoint: bool = False,
        evaluate_every: Optional[int] = None,
    ) -> Dict[str, float]:
        cfg = self.cfg
        # `is None`, not `or`: an explicit 0 means "no epochs" / "never
        # eval in-train", not "use the config default".
        if num_epochs is None:
            num_epochs = cfg.train.num_epochs
        if evaluate_every is None:
            evaluate_every = cfg.train.eval_every_epochs
        if try_restore_latest_checkpoint:
            self.try_restore_latest_checkpoint()
        if self._host_step == 0 and self._best_record is not None:
            # FRESH run in a directory holding a previous run's best.json:
            # that record describes another model's CER (early stopping
            # would count against it, and once this run overwrites the
            # pinned step, `checkpoint="best"` would load new tensors
            # labeled with the old run's CER).  Reset the tracker.
            self.logger.info(
                "fresh run: discarding previous run's best.json "
                f"(step {self._best_record.get('step')}, "
                f"cer {self._best_record.get('cer')})"
            )
            self._best_record = None
            self._best_cer = float("inf")
            self._evals_since_best = 0
            self.ckpt.set_preserved(set())
            try:
                os.remove(os.path.join(self.run_dir, "best.json"))
            except OSError:
                pass
        if cfg.train.warmup_compile:
            self.warmup()

        # SIGTERM -> graceful stop (cluster preemption notice): checkpoint
        # the iterator position and return instead of dying mid-step.
        import signal
        import threading

        prev_handler = None
        if threading.current_thread() is threading.main_thread():
            try:
                prev_handler = signal.signal(
                    signal.SIGTERM, lambda *_: self.request_stop()
                )
            except (ValueError, OSError):  # non-main interpreter contexts
                prev_handler = None

        try:
            return self._train_epochs(num_epochs, evaluate_every)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _train_epochs(
        self, num_epochs: int, evaluate_every: int
    ) -> Dict[str, float]:
        cfg = self.cfg
        last_metrics: Dict[str, float] = {}
        while self.epoch < num_epochs:
            t_epoch = time.time()
            frames = 0
            from avsr_tpu.data.loader import prefetch

            skip = self._resume_batches
            self._resume_batches = 0
            batches_done = skip

            def device_batches():
                # Batch assembly AND the host->device transfer both happen on
                # the prefetch thread: jax.device_put is async, so the next
                # batch streams into HBM while the current step computes.
                for i, (bucket, np_batch) in enumerate(self.train_loader.epoch()):
                    if i < skip:
                        # fast-forward to the checkpointed iterator position
                        # (one-time assembly cost at resume; nothing is
                        # transferred or stepped)
                        continue
                    yield bucket, np_batch, self._place(to_model_batch(np_batch))

            for bucket, np_batch, batch in prefetch(device_batches()):
                step_fn = self._train_step_for_accum(self._accum_for(bucket))
                self.state, metrics = step_fn(
                    self.state, batch, self._data_rng
                )
                self._host_step += 1
                batches_done += 1
                step_i = self._host_step
                if np_batch.get("audio_lengths") is not None:
                    frames += int(np.sum(np_batch["audio_lengths"]) // 160)
                elif np_batch.get("video_lengths") is not None:
                    frames += int(np.sum(np_batch["video_lengths"]))
                if step_i % max(cfg.train.log_every_steps, 1) == 0:
                    loss = float(metrics["loss"])
                    # lr / sampling-p are host-side schedule mirrors (no
                    # extra device fetch); the step just executed saw the
                    # pre-increment counter, hence step_i - 1.
                    from avsr_tpu.train.optim import host_schedule_value

                    self.logger.log(
                        "train", step=step_i, epoch=self.epoch, loss=loss,
                        grad_norm=float(metrics["grad_norm"]), bucket=bucket,
                        lr=host_schedule_value(
                            cfg.train, step_i - 1, self._steps_per_epoch
                        ),
                        sampling_p=step_lib.host_sampling_p(cfg, step_i - 1),
                    )
                if (
                    cfg.train.save_every_steps
                    and step_i % cfg.train.save_every_steps == 0
                ):
                    self.ckpt.save(
                        step_i, self.state,
                        {"epoch": self.epoch, "batches_done": batches_done},
                    )
                if self._stop_requested:
                    # graceful preemption: persist the exact iterator
                    # position; --resume continues bit-exactly from here
                    self.ckpt.save(
                        step_i, self.state,
                        {"epoch": self.epoch, "batches_done": batches_done},
                    )
                    self.logger.info(
                        f"stop requested: checkpointed step {step_i} "
                        f"(epoch {self.epoch}, {batches_done} batches) "
                        "and exiting train loop"
                    )
                    return last_metrics
            self.epoch += 1
            dt = time.time() - t_epoch
            fps = frames / max(dt, 1e-9)
            self.logger.log(
                "epoch", epoch=self.epoch, seconds=dt, frames_per_sec=fps
            )
            self.logger.info(
                f"epoch {self.epoch}: {dt:.1f}s, {fps:.0f} frames/s"
            )
            # epoch boundary: iterator state resets (batches_done = 0)
            self.ckpt.save(
                self._host_step, self.state,
                {"epoch": self.epoch, "batches_done": 0},
            )
            if (self.eval_loader is not None and evaluate_every
                    and self.epoch % evaluate_every == 0):
                last_metrics = self.evaluate(epoch=self.epoch)
                if self._update_best(last_metrics):
                    return last_metrics
        return last_metrics

    def _load_best_record(self) -> None:
        """Resume best-CER tracking from run_dir/best.json (written by
        ``_update_best``); re-pins the best step against pruning."""
        import json

        path = os.path.join(self.run_dir, "best.json")
        if not os.path.exists(path):
            return
        try:
            with open(path) as f:
                best = json.load(f)
            self._best_cer = float(best["cer"])
            # Patience survives preemption: without this, every resume
            # resets the early-stop window and a frequently-preempted
            # plateaued run never stops.
            self._evals_since_best = int(best.get("evals_since_best", 0))
            self._best_record = best
            self.ckpt.set_preserved({int(best["step"])})
        except (ValueError, KeyError, OSError):
            self.logger.info(f"ignoring unreadable best record {path}")

    def _write_best_record(self) -> None:
        import json

        with open(os.path.join(self.run_dir, "best.json"), "w") as f:
            json.dump(self._best_record, f)

    def _update_best(self, metrics: Dict[str, float]) -> bool:
        """Track the best in-train eval CER; returns True when
        ``train.early_stop_patience`` says to stop.

        The best step is persisted to run_dir/best.json (surfaced as
        ``checkpoint="best"`` in evaluate/export) and pinned against keep-N
        pruning, so the best model survives arbitrarily long runs.
        """
        cer = metrics.get("cer")
        if cer is None:
            return False
        if cer < self._best_cer:
            self._best_cer = float(cer)
            self._evals_since_best = 0
            self._best_record = {
                "step": self._host_step, "epoch": self.epoch,
                "cer": float(cer), "wer": float(metrics.get("wer", -1.0)),
                "evals_since_best": 0,
            }
            self._write_best_record()
            self.ckpt.set_preserved({self._host_step})
            self.logger.info(
                f"new best CER {cer:.4f} at step {self._host_step} "
                "(best.json; checkpoint pinned)"
            )
            return False
        self._evals_since_best += 1
        if getattr(self, "_best_record", None) is not None:
            self._best_record["evals_since_best"] = self._evals_since_best
            self._write_best_record()
        patience = self.cfg.train.early_stop_patience
        if patience and self._evals_since_best >= patience:
            self.logger.info(
                f"early stop: no CER improvement in {self._evals_since_best} "
                f"evals (best {self._best_cer:.4f})"
            )
            return True
        return False

    def warmup(self) -> int:
        """Pre-compile the train step for every bucket shape by running one
        dummy step per shape on a THROWAWAY copy of the state.

        On TPU each new bucket shape otherwise stalls epoch 1 for minutes
        of compile mid-training; after warmup every epoch runs at
        steady-state speed.  Training state, rng, and data iterators are
        untouched, so results are bit-identical with or without warmup
        (tested).  Returns the number of bucket programs compiled."""
        loader = self.train_loader
        if not hasattr(loader, "bucket_shapes"):
            return 0
        n = 0
        bs_for = getattr(
            loader, "batch_size_for", lambda b: self.cfg.data.batch_size
        )
        for b, shp in sorted(loader.bucket_shapes().items()):
            np_batch = self._dummy_batch(shp, bs_for(b))
            batch = self._place(to_model_batch(np_batch))
            # jnp.copy, NOT asarray: the jitted step donates its state
            # argument, so passing self.state's own buffers would
            # invalidate the real training state.
            state_copy = jax.tree_util.tree_map(jnp.copy, self.state)
            step_fn = self._train_step_for_accum(self._accum_for(b))
            _, metrics = step_fn(state_copy, batch, self._data_rng)
            float(metrics["loss"])  # true host sync: wait out the compile
            n += 1
            self.logger.info(
                f"warmup: bucket {b} compiled "
                f"(audio={shp.audio_samples}, video={shp.video_frames}, "
                f"labels={shp.label_len})"
            )
        return n

    def _dummy_batch(self, shp, batch_size: Optional[int] = None):
        """Zero batch matching one bucket's static shapes (and the
        transfer dtypes), mirroring BucketingLoader._assemble."""
        cfg = self.cfg
        loader = self.train_loader
        B = batch_size if batch_size is not None else cfg.data.batch_size
        compact = cfg.data.transfer_dtype == "compact"
        arch = cfg.architecture
        out = {
            "uids": [f"warmup{i}" for i in range(B)],
            "num_real": B,
            "uid_hashes": np.arange(B, dtype=np.uint32),
        }
        if arch in ("audio", "av_align", "bimodal"):
            S = shp.audio_samples
            out["audio"] = np.zeros(
                (B, S), np.int16 if compact else np.float32
            )
            out["audio_lengths"] = np.full((B,), S, np.int32)
        if arch in ("video", "av_align", "bimodal"):
            T = shp.video_frames
            # AU-feature datasets feed [T, au_dim] instead of ROI frames;
            # the loader's video signature (peeked once at the source) says
            # which program shape to compile — guessing wrong here wastes a
            # multi-minute remote compile on a program no real batch uses.
            kind, fshape = loader.video_signature()
            if kind == "au":
                out["video"] = np.zeros((B, T, fshape[0]), np.float32)
            else:
                out["video"] = np.zeros(
                    (B, T, *fshape),
                    np.uint8 if compact else np.float32,
                )
            out["video_lengths"] = np.full((B,), T, np.int32)
        if getattr(loader, "au_target_stacking", None) is not None:
            stack, skip = loader.au_target_stacking
            T_raw = max(
                (shp.audio_samples - loader.frame_length)
                // loader.frame_step + 1, 1,
            )
            T_a = max((T_raw - stack) // skip + 1, 1)
            out["au_targets"] = np.zeros((B, T_a, loader.au_dim), np.float32)
            out["au_row_weights"] = np.ones((B,), np.float32)
        K = shp.label_len
        tgt = np.zeros((B, K), np.int32)
        tgt[:, 0] = 2  # EOS
        out["targets"] = tgt
        out["target_lengths"] = np.ones((B,), np.int32)
        return out

    def _place(self, batch):
        if self.mesh is None:
            # Async transfer to the default device; without this, jit would
            # do a blocking transfer at dispatch time on the main thread.
            return jax.device_put(batch)
        from avsr_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, batch)

    # ------------------------------------------------------------------

    def evaluate(
        self,
        *,
        epoch: Optional[int] = None,
        use_beam: bool = True,
        loader: Optional[BucketingLoader] = None,
    ) -> Dict[str, float]:
        """Decode the eval set, write predictions, return CER/WER
        (reference workflow: per-epoch prediction + error-rate files)."""
        cfg = self.cfg
        loader = loader or self.eval_loader
        acc = ErrorRateAccumulator()
        eval_fn = self._make_eval_decode_fn(use_beam)
        losses: List[float] = []
        weights: List[int] = []
        t_eval = time.time()
        eval_snr = jnp.asarray(
            cfg.noise.eval_snr_db if cfg.noise.eval_snr_db is not None
            else 0.0,
            jnp.float32,
        )
        def drain(ids_dev, metrics_dev, np_batch) -> None:
            # np.asarray/float are TRUE host fetches: they block until the
            # device finishes THIS batch (while the NEXT batch's program is
            # already queued behind it — see the pipeline note below).
            ids = np.asarray(ids_dev)
            n_real = np_batch["num_real"]
            losses.append(float(metrics_dev["loss"]))
            # Per-batch losses are token means (sequence_loss normalizes by
            # its mask); combine them weighted by real token count so the
            # summary is the corpus token mean — utterance-count weighting
            # would shift with the bucket mix (long-utterance buckets run
            # smaller batches) even at identical model quality.
            tl = np.asarray(np_batch["target_lengths"][:n_real])
            K_cap = np_batch["targets"].shape[1]
            weights.append(int(np.minimum(tl, K_cap).sum()))
            # Score against the UNTRUNCATED reference carried by the loader
            # (np_batch["references"]); the targets tensor is capped at the
            # bucket's label horizon (label_bucket_caps) for the training/
            # loss path, and scoring against it would shorten references
            # and inflate CER/WER.  Fallback for hand-built batches.
            refs = np_batch.get("references")
            for j in range(n_real):
                hyp = self.units.decode(ids[j])
                ref = (
                    refs[j] if refs is not None
                    else self.units.decode(np_batch["targets"][j])
                )
                acc.update(ref, hyp, np_batch["uids"][j])

        # One-deep dispatch-ahead pipeline: dispatch batch i+1's program
        # (async in JAX) BEFORE fetching batch i's ids, so the device
        # decodes batch i+1 while the host scores batch i and the loader
        # assembles i+2.  Results are identical to the serial loop; only
        # the device-idle gaps (host Levenshtein + batch assembly + the
        # ~27 ms relay fetch) disappear from the critical path.
        pending = None
        for bucket, np_batch in loader.epoch(shuffle=False):
            batch = to_model_batch(np_batch)
            batch = self._place(batch)
            ids_dev, metrics_dev = eval_fn(self.state.params, batch, eval_snr)
            if pending is not None:
                drain(*pending)
            pending = (ids_dev, metrics_dev, np_batch)
        if pending is not None:
            drain(*pending)
        tag = f"epoch{epoch}" if epoch is not None else "final"
        if self.cfg.noise.eval_snr_db is not None:
            if self.noise_bank is not None and self.noise_bank.num_types > 1:
                tag += f"_{self.cfg.noise.eval_noise_type}"
            tag += f"_{self.cfg.noise.eval_snr_db:g}dB"
        acc.write_predictions(
            os.path.join(self.run_dir, f"predictions_{tag}.txt")
        )
        summary = acc.summary()
        dt = time.time() - t_eval
        summary["seconds"] = round(dt, 3)
        summary["utterances_per_sec"] = round(
            summary["num_utterances"] / max(dt, 1e-9), 2
        )
        if losses:
            summary["loss"] = float(
                np.average(losses, weights=np.maximum(weights, 1))
            )
        # per-eval error-rate summary file (reference workflow: one error
        # file per epoch/condition)
        with open(os.path.join(self.run_dir, f"error_rates_{tag}.txt"), "w") as f:
            f.write(
                f"CER {summary['cer']:.6f}\nWER {summary['wer']:.6f}\n"
                f"utterances {summary['num_utterances']}\n"
            )
        self.logger.log("eval", epoch=epoch or -1, **summary)
        self.logger.info(
            f"eval {tag}: CER {summary['cer']:.4f} WER {summary['wer']:.4f}"
        )
        return summary

    def evaluate_noise_matrix(
        self,
        snrs=(None, 20.0, 10.0, 0.0, -5.0),
        *,
        noise_types: Optional[List[str]] = None,
        use_beam: bool = True,
        epoch: Optional[int] = None,
    ) -> Dict[str, Dict[str, float]]:
        """Per-(noise type x SNR)-condition evaluation matrix (reference
        workflow: one error-rate file per noise condition — babble/cafe at
        each SNR, SURVEY.md §1 item 4, §3.3).  SNR ``None`` means clean
        (evaluated once, type-independent).  ``noise_types`` defaults to all
        types in the bank (a single anonymous-type bank yields SNR-only
        conditions, preserving the untyped workflow)."""
        import dataclasses

        if noise_types is None:
            if self.noise_bank is not None and self.noise_bank.num_types > 1:
                noise_types = list(self.noise_bank.names)
            else:
                noise_types = [None]
        results: Dict[str, Dict[str, float]] = {}
        original = self.cfg
        try:
            for snr in snrs:
                if snr is None:
                    conditions = [(None, None)]
                else:
                    conditions = [(ntype, snr) for ntype in noise_types]
                for ntype, csnr in conditions:
                    tag = "clean" if csnr is None else (
                        f"{csnr:g}dB" if ntype is None else f"{ntype}_{csnr:g}dB"
                    )
                    self.cfg = dataclasses.replace(
                        original,
                        noise=dataclasses.replace(
                            original.noise,
                            eval_snr_db=csnr,
                            eval_noise_type=(
                                ntype if ntype is not None
                                else original.noise.eval_noise_type
                            ),
                        ),
                    )
                    results[tag] = self.evaluate(epoch=epoch, use_beam=use_beam)
                    self.logger.log("eval_noise", condition=tag, **results[tag])
        finally:
            self.cfg = original
        return results

    def _make_eval_decode_fn(self, use_beam: bool):
        """ONE jitted eval program per (use_beam, cfg): the encoder runs
        once and feeds BOTH the teacher-forced eval loss and the beam/greedy
        decode (the encoder dominates eval compute, so fusing them nearly
        halves eval cost vs separate loss/decode programs).
        The eval SNR enters as a RUNTIME scalar, so one compiled program
        serves every SNR of a noise matrix; only clean-vs-noisy and the
        noise TYPE (bank shapes) are baked in (cached per such key)."""
        import dataclasses

        cfg = self.cfg
        noise_bank = self.noise_bank
        has_snr = cfg.noise.eval_snr_db is not None
        key_cfg = dataclasses.replace(
            cfg,
            noise=dataclasses.replace(
                cfg.noise, eval_snr_db=0.0 if has_snr else None
            ),
        )
        cache_key = ("eval", use_beam, key_cfg)
        cached = self._decode_cache.get(cache_key)
        if cached is not None:
            return cached

        def eval_decode(params, batch, eval_snr):
            out = seq2seq.encode(
                params, cfg, batch, train=False, noise_bank=noise_bank,
                eval_snr=eval_snr,
            )
            _, metrics = seq2seq.loss_given_encode(
                params, cfg, batch, out, train=False
            )
            if use_beam and cfg.decode.beam_width > 1:
                res = beam_search(
                    params["decoder"], cfg.decoder, out.memories,
                    cfg.decode.max_decode_length,
                    beam_width=cfg.decode.beam_width,
                    length_penalty=cfg.decode.length_penalty,
                    compute_dtype=seq2seq.compute_dtype_of(cfg),
                )
                ids = res.ids
            else:
                ids, _ = greedy_decode(
                    params["decoder"], cfg.decoder, out.memories,
                    cfg.decode.max_decode_length,
                    compute_dtype=seq2seq.compute_dtype_of(cfg),
                )
            return ids, metrics

        fn = jax.jit(eval_decode)
        self._decode_cache[cache_key] = fn
        return fn

    def _make_decode_fn(self, use_beam: bool, n_best: int = 1):
        cfg = self.cfg
        noise_bank = self.noise_bank
        cache_key = (use_beam, n_best, cfg)
        cached = self._decode_cache.get(cache_key)
        if cached is not None:
            return cached

        def decode(params, batch):
            out = seq2seq.encode(
                params, cfg, batch, train=False, noise_bank=noise_bank
            )
            if use_beam and cfg.decode.beam_width > 1:
                res = beam_search(
                    params["decoder"], cfg.decoder, out.memories,
                    cfg.decode.max_decode_length,
                    beam_width=cfg.decode.beam_width,
                    length_penalty=cfg.decode.length_penalty,
                    compute_dtype=seq2seq.compute_dtype_of(cfg),
                    n_best=n_best,
                )
                if n_best > 1:
                    return res.nbest_ids, res.nbest_scores
                return res.ids
            ids, _ = greedy_decode(
                params["decoder"], cfg.decoder, out.memories,
                cfg.decode.max_decode_length,
                compute_dtype=seq2seq.compute_dtype_of(cfg),
            )
            return ids

        fn = jax.jit(decode)
        self._decode_cache[cache_key] = fn
        return fn
