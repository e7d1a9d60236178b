"""Model assembly: wire frontends + encoders + fusion + decoder per regime.

Rebuild of the reference's ``Seq2SeqModel`` (upstream:avsr/seq2seq.py,
SURVEY.md §2.2 row 2): a single forward/loss entry point switched on the
architecture — ``audio`` | ``video`` | ``av_align`` | ``bimodal`` —
[BASELINE.json:configs].  All four regimes share one Batch schema and one
decoder; the whole forward + loss compiles into a single XLA program.

Layout conventions: frontends produce batch-major [B, T, D]; the recurrent
core runs time-major [T, B, D]; decoder memories are batch-major [B, S, H].
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.configs import ExperimentConfig
from avsr_tpu.models import decoder as dec
from avsr_tpu.models import encoder as enc
from avsr_tpu.models import fusion as fus
from avsr_tpu.models import video_cnn
from avsr_tpu.ops import attention as attn
from avsr_tpu.ops import noise as noise_ops
from avsr_tpu.ops.audio_features import logmel_frontend
from avsr_tpu.utils.params import Params


class Batch(NamedTuple):
    """One padded, static-shape training/eval batch.

    Unused modalities are None (e.g. video* for audio-only runs).
    """

    audio: Optional[jnp.ndarray] = None          # [B, S] waveform
    audio_lengths: Optional[jnp.ndarray] = None  # [B] samples
    video: Optional[jnp.ndarray] = None          # [B, T_v, H, W, C] or [B, T_v, au_dim]
    video_lengths: Optional[jnp.ndarray] = None  # [B] frames
    targets: Optional[jnp.ndarray] = None        # [B, K] unit ids incl. EOS
    target_lengths: Optional[jnp.ndarray] = None # [B] incl. EOS
    au_targets: Optional[jnp.ndarray] = None     # [B, T_a, au_dim] (TASLP AU loss)
    au_row_weights: Optional[jnp.ndarray] = None # [B] 1.0 = row contributes
                                                 # to the AU loss (0 for the
                                                 # loader's repeated padding
                                                 # rows and utterances with
                                                 # no AU stream)
    uid_hashes: Optional[jnp.ndarray] = None     # [B] uint32 crc32(uid): keys
                                                 # deterministic eval noise to
                                                 # the utterance, not its
                                                 # batch position


def compute_dtype_of(cfg: ExperimentConfig):
    return jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def model_init(key, cfg: ExperimentConfig, vocab_size: int) -> Params:
    arch = cfg.architecture
    keys = jax.random.split(key, 6)
    params: Params = {}
    memory_dims: List[int] = []

    if arch in ("audio", "av_align", "bimodal"):
        params["audio_encoder"] = enc.encoder_init(
            keys[0], cfg.audio_encoder, cfg.audio.output_dim
        )
        audio_out = enc.encoder_output_dim(cfg.audio_encoder)

    if arch in ("video", "av_align", "bimodal"):
        params["video_frontend"] = video_cnn_init_dispatch(keys[1], cfg)
        params["video_encoder"] = enc.encoder_init(
            keys[2], cfg.video_encoder, cfg.video.embedding_dim
        )
        video_out = enc.encoder_output_dim(cfg.video_encoder)

    if arch == "audio":
        memory_dims = [audio_out]
    elif arch == "video":
        memory_dims = [video_out]
    elif arch == "av_align":
        if cfg.fusion.fusion_type == "cross_attention":
            # scan-free fusion: fused memory = [audio encoder output ;
            # attended visual context] (no extra fusion LSTM state)
            params["fusion"] = fus.cross_attention_fusion_init(
                keys[3], cfg.fusion, audio_out, video_out
            )
            memory_dims = [
                audio_out + (cfg.fusion.memory_value_dim or video_out)
            ]
        else:
            fusion_hidden = cfg.audio_encoder.hidden_units[-1]
            params["fusion"] = fus.av_align_init(
                keys[3], cfg.fusion, audio_out, fusion_hidden, video_out
            )
            # fused memory = [audio LSTM state ; attended visual context];
            # the context half shrinks to memory_value_dim when values are
            # projected
            memory_dims = [
                fusion_hidden + (cfg.fusion.memory_value_dim or video_out)
            ]
    elif arch == "bimodal":
        memory_dims = [audio_out, video_out]
    else:
        raise ValueError(f"unknown architecture {arch}")

    # Bimodal decoding (upstream decoder_bimodal.py) is expressed purely by
    # the two-entry memory_dims: the decoder builds one attention mechanism
    # per memory and concatenates the contexts (dual attention).
    params["decoder"] = dec.decoder_init(keys[4], cfg.decoder, memory_dims, vocab_size)
    return params


def video_cnn_init_dispatch(key, cfg: ExperimentConfig) -> Params:
    return video_cnn.video_cnn_init(key, cfg.video)


def memory_dims_of(cfg: ExperimentConfig) -> List[int]:
    arch = cfg.architecture
    audio_out = enc.encoder_output_dim(cfg.audio_encoder)
    video_out = enc.encoder_output_dim(cfg.video_encoder)
    if arch == "audio":
        return [audio_out]
    if arch == "video":
        return [video_out]
    if arch == "av_align":
        audio_half = (
            audio_out
            if cfg.fusion.fusion_type == "cross_attention"
            else cfg.audio_encoder.hidden_units[-1]
        )
        return [audio_half + (cfg.fusion.memory_value_dim or video_out)]
    if arch == "bimodal":
        return [audio_out, video_out]
    raise ValueError(arch)


# ---------------------------------------------------------------------------
# Encode: batch -> decoder attention memories
# ---------------------------------------------------------------------------


class EncodeOutput(NamedTuple):
    memories: Tuple[attn.AttentionMemory, ...]
    aux: Dict[str, Any]  # alignments, au_predictions, feature lengths...


def encode(
    params: Params,
    cfg: ExperimentConfig,
    batch: Batch,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    noise_bank: Optional[jnp.ndarray] = None,
    eval_snr: Optional[jnp.ndarray] = None,
) -> EncodeOutput:
    arch = cfg.architecture
    cdt = compute_dtype_of(cfg)
    aux: Dict[str, Any] = {}
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k_noise, k_enc_a, k_enc_v = jax.random.split(rng, 3)

    audio_mem = video_mem = None
    audio_mem_len = video_mem_len = None
    audio_out_tb = None  # time-major audio encoder output (for av_align)

    # Rematerialization: recompute encoder activations in the backward pass
    # instead of saving them (trades FLOPs for HBM; enables larger batches).
    def enc_apply(p, ecfg, x, lengths, rng):
        return enc.encoder_apply(
            p, ecfg, x, lengths, train=train, dropout_rng=rng,
            compute_dtype=cdt,
        )

    if cfg.train.remat:
        enc_apply = jax.checkpoint(enc_apply, static_argnums=(1,))

    if arch in ("audio", "av_align", "bimodal"):
        wav, wav_len = batch.audio, batch.audio_lengths
        if wav.dtype == jnp.int16:
            # compact-transfer PCM (data.transfer_dtype; loader quantized
            # with x32767) — dequantize on device, fused into the frontend.
            wav = wav.astype(jnp.float32) / 32767.0
        if noise_bank is not None:
            if train and cfg.noise.enabled:
                wav = noise_ops.sample_and_mix(
                    k_noise, wav, wav_len, noise_bank,
                    cfg.noise.snr_db, cfg.noise.clean_probability,
                )
            elif not train and cfg.noise.eval_snr_db is not None:
                # Fixed-(type x SNR) eval mixing applies whenever a condition
                # is requested — independent of the TRAINING mixing switch
                # (`enabled`), so clean-trained models can be evaluated
                # under noise (reference per-condition eval workflow).
                bank = noise_ops.NoiseBank.create(noise_bank)
                ntype = (
                    cfg.noise.eval_noise_type if bank.num_types > 1 else None
                )
                # ``eval_snr`` (a traced scalar) lets ONE compiled program
                # serve every SNR of a (type x SNR) evaluation matrix —
                # only the noise TYPE (bank shapes) forces a recompile.
                snr = (
                    eval_snr if eval_snr is not None
                    else cfg.noise.eval_snr_db
                )
                wav = noise_ops.mix_fixed_snr(
                    wav, wav_len, bank, snr, noise_type=ntype,
                    uid_hashes=batch.uid_hashes,
                )
        feats, feat_len = logmel_frontend(
            wav, wav_len, cfg.audio, compute_dtype=cdt
        )
        if train and cfg.audio.spec_augment:
            from avsr_tpu.ops.specaugment import spec_augment

            k_noise, k_sa = jax.random.split(k_noise)
            feats = spec_augment(
                k_sa, feats, feat_len,
                num_time_masks=cfg.audio.time_masks,
                time_mask_width=cfg.audio.time_mask_width,
                num_freq_masks=cfg.audio.freq_masks,
                freq_mask_width=cfg.audio.freq_mask_width,
            )
        feats_tb = jnp.transpose(feats, (1, 0, 2))  # time-major
        # Frontend-rate lengths; "audio_feature_lengths" below is the
        # ENCODER-OUTPUT rate (differs under pyramidal time_reduction).
        aux["audio_frontend_lengths"] = feat_len
        aux["audio_feature_lengths"] = feat_len

    v_tb = v_len = None
    if arch in ("video", "av_align", "bimodal"):
        video = batch.video
        if video.dtype == jnp.uint8:
            # compact-transfer ROI crops (loader quantized with round(x*255))
            video = video.astype(jnp.float32) / 255.0
        v_emb, v_len = video_cnn.video_cnn_apply(
            params["video_frontend"], cfg.video, video,
            batch.video_lengths, compute_dtype=cdt,
        )
        v_tb = jnp.transpose(v_emb, (1, 0, 2))

    # Encoder application.  The AV regimes' audio/video encoder stacks are
    # independent chains; when shapes line up their same-depth layers run as
    # ONE direction-and-stream-batched scan (models/encoder.py
    # paired_encoder_apply) — a TPU core serializes independent scans, so
    # pairing removes the video encoder's scan from the critical path.
    pair = (
        arch in ("av_align", "bimodal")
        and cfg.train.fuse_encoder_scans
        and enc.can_pair_encoders(cfg.audio_encoder, cfg.video_encoder, train)
    )
    if pair:
        def dual_apply(pa, pv, xa, la, xv, lv, ra, rv):
            return enc.paired_encoder_apply(
                pa, cfg.audio_encoder, xa, la,
                pv, cfg.video_encoder, xv, lv,
                train=train, dropout_rng_a=ra, dropout_rng_b=rv,
                compute_dtype=cdt,
            )

        if cfg.train.remat:
            dual_apply = jax.checkpoint(dual_apply)
        (audio_out_tb, _), (v_out_tb, _) = dual_apply(
            params["audio_encoder"], params["video_encoder"],
            feats_tb, feat_len, v_tb, v_len, k_enc_a, k_enc_v,
        )
    else:
        if arch in ("audio", "av_align", "bimodal"):
            audio_out_tb, _ = enc_apply(
                params["audio_encoder"], cfg.audio_encoder, feats_tb,
                feat_len, k_enc_a,
            )
        if v_tb is not None:
            v_out_tb, _ = enc_apply(
                params["video_encoder"], cfg.video_encoder, v_tb, v_len,
                k_enc_v,
            )

    if arch in ("audio", "av_align", "bimodal"):
        audio_mem = jnp.transpose(audio_out_tb, (1, 0, 2))
        # Pyramidal time reduction shrinks the output step count; every
        # consumer below (fusion scan, decoder memories, AU loss) runs at
        # the REDUCED rate.
        audio_mem_len = enc.encoder_output_lengths(cfg.audio_encoder, feat_len)
        aux["audio_feature_lengths"] = audio_mem_len
    if v_tb is not None:
        video_mem = jnp.transpose(v_out_tb, (1, 0, 2))
        video_mem_len = enc.encoder_output_lengths(cfg.video_encoder, v_len)

    dec_cfg = cfg.decoder
    if arch == "audio":
        mems = (prep(dec_cfg, params, 0, audio_mem, audio_mem_len, cdt),)
    elif arch == "video":
        mems = (prep(dec_cfg, params, 0, video_mem, video_mem_len, cdt),)
    elif arch == "av_align":
        fusion_apply = (
            fus.cross_attention_fusion_apply
            if cfg.fusion.fusion_type == "cross_attention"
            else fus.av_align_apply
        )
        out = fusion_apply(
            params["fusion"], cfg.fusion, audio_out_tb, audio_mem_len,
            video_mem, video_mem_len, compute_dtype=cdt,
        )
        fused_bm = jnp.transpose(out.fused, (1, 0, 2))
        aux["av_alignments"] = out.alignments
        aux["au_predictions"] = out.au_predictions
        mems = (prep(dec_cfg, params, 0, fused_bm, audio_mem_len, cdt),)
    elif arch == "bimodal":
        mems = (
            prep(dec_cfg, params, 0, audio_mem, audio_mem_len, cdt),
            prep(dec_cfg, params, 1, video_mem, video_mem_len, cdt),
        )
    else:
        raise ValueError(arch)
    return EncodeOutput(memories=mems, aux=aux)


def prep(dec_cfg, params, idx, memory, lengths, cdt) -> attn.AttentionMemory:
    # The transformer decoder's memories are value-only (it computes its
    # own multi-head scores; see transformer_decoder_init).
    att_type = ("value_only" if dec_cfg.decoder_type == "transformer"
                else dec_cfg.attention_type)
    return attn.prepare_memory(
        att_type, params["decoder"]["atts"][idx],
        memory, lengths, compute_dtype=cdt,
    )


# ---------------------------------------------------------------------------
# Forward + loss
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    cfg: ExperimentConfig,
    batch: Batch,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    noise_bank: Optional[jnp.ndarray] = None,
    sampling_p=None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Teacher-forced logits for the batch: [B, K, V].

    ``sampling_p`` overrides the config's scheduled-sampling probability
    (train mode only); a traced scalar here lets the train step ramp the
    probability on device without recompiling (DecoderConfig.
    sampling_ramp_steps).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k_enc, k_dec = jax.random.split(rng)
    out = encode(
        params, cfg, batch, train=train, rng=k_enc, noise_bank=noise_bank
    )
    if not train:
        p = 0.0
    elif sampling_p is not None:
        p = sampling_p
    else:
        p = cfg.decoder.sampling_probability
    logits = dec.teacher_forced_logits(
        params["decoder"], cfg.decoder, batch.targets, batch.target_lengths,
        out.memories,
        sampling_probability=p,
        rng=k_dec,
        compute_dtype=compute_dtype_of(cfg),
        dropout=train,
    )
    return logits, out.aux


def loss_fn(
    params: Params,
    cfg: ExperimentConfig,
    batch: Batch,
    *,
    train: bool = True,
    rng: Optional[jax.Array] = None,
    noise_bank: Optional[jnp.ndarray] = None,
    sampling_p=None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    logits, aux = forward(
        params, cfg, batch, train=train, rng=rng, noise_bank=noise_bank,
        sampling_p=sampling_p,
    )
    return _losses(cfg, batch, logits, aux, train=train)


def loss_given_encode(
    params: Params,
    cfg: ExperimentConfig,
    batch: Batch,
    enc_out: EncodeOutput,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """CE (+AU) sequence loss from an already-computed EncodeOutput — lets
    one jitted eval program share the encoder between the teacher-forced
    loss and the beam/greedy decode (the encoder dominates eval compute)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    logits = dec.teacher_forced_logits(
        params["decoder"], cfg.decoder, batch.targets, batch.target_lengths,
        enc_out.memories,
        sampling_probability=cfg.decoder.sampling_probability if train else 0.0,
        rng=rng,
        compute_dtype=compute_dtype_of(cfg),
        dropout=train,
    )
    return _losses(cfg, batch, logits, enc_out.aux, train=train)


def _pool_time(x_tbd: jnp.ndarray, lengths: jnp.ndarray, r: int) -> jnp.ndarray:
    """Masked mean over groups of ``r`` consecutive time-major frames:
    [T, B, D] -> [ceil(T/r), B, D].  Frames beyond each example's length
    are excluded from the group's denominator, so a partly valid last
    group is the mean of its VALID frames only (padding-invariant)."""
    T, B, D = x_tbd.shape
    Tp = -(-T // r) * r
    if Tp != T:
        x_tbd = jnp.pad(x_tbd, ((0, Tp - T), (0, 0), (0, 0)))
    valid = (jnp.arange(Tp)[:, None] < lengths[None, :]).astype(x_tbd.dtype)
    groups = x_tbd.reshape(Tp // r, r, B, D)
    v = valid.reshape(Tp // r, r, B, 1)
    return jnp.sum(groups * v, axis=1) / jnp.maximum(jnp.sum(v, axis=1), 1.0)


def _losses(
    cfg: ExperimentConfig,
    batch: Batch,
    logits: jnp.ndarray,
    aux: Dict[str, Any],
    *,
    train: bool,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    ce = dec.sequence_loss(
        logits, batch.targets, batch.target_lengths,
        label_smoothing=cfg.train.label_smoothing if train else 0.0,
    )
    metrics: Dict[str, Any] = {"ce_loss": ce}
    total = ce
    if (
        cfg.architecture == "av_align"
        and cfg.fusion.au_loss_weight > 0.0
        and aux.get("au_predictions") is not None
        and batch.au_targets is not None
    ):
        au_t = jnp.transpose(batch.au_targets, (1, 0, 2))  # time-major
        R = enc.total_time_reduction(cfg.audio_encoder)
        if R > 1:
            # au_predictions run at the encoder-output (reduced) rate;
            # pool the frontend-rate targets to match (masked group mean).
            au_t = _pool_time(au_t, aux["audio_frontend_lengths"], R)
        au_loss = fus.au_regression_loss(
            aux["au_predictions"], au_t, aux["audio_feature_lengths"],
            row_weights=batch.au_row_weights,
        )
        metrics["au_loss"] = au_loss
        total = total + cfg.fusion.au_loss_weight * au_loss
    metrics["loss"] = total
    return total, metrics
