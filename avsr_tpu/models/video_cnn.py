"""Lip-ROI visual frontend: per-frame CNN producing a frame-embedding sequence.

Rebuild of the reference's video feature graph (upstream:avsr/video.py,
SURVEY.md §2.2 row 9): a small conv stack over ~36x36 grayscale lip crops,
applied to every video frame, trained end-to-end with the seq2seq model.

TPU mapping: frames are folded into the batch axis ([B, T, H, W, C] ->
[B*T, H, W, C]) so XLA sees ONE large conv per layer — big batched convs on
the MXU rather than a vmap over T small ones.  Padded frames are zeros in,
zeros out (bias is added then re-masked at the sequence level by the caller).

The alternative visual-feature path (precomputed OpenFace action units,
TASLP-2020) bypasses the CNN via a linear projection.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.configs import VideoFrontendConfig
from avsr_tpu.utils.params import Params, glorot_uniform


def video_cnn_init(key, cfg: VideoFrontendConfig, dtype=jnp.float32) -> Params:
    if cfg.use_au_features:
        return {
            "au_proj": glorot_uniform(key, (cfg.au_dim, cfg.embedding_dim), dtype),
            "au_bias": jnp.zeros((cfg.embedding_dim,), dtype),
        }
    params: Params = {"convs": []}
    c_in = cfg.channels
    h, w = cfg.roi_height, cfg.roi_width
    keys = jax.random.split(key, len(cfg.conv_channels) + 1)
    for k, c_out in zip(keys[:-1], cfg.conv_channels):
        fan = cfg.conv_kernel * cfg.conv_kernel
        params["convs"].append(
            {
                "w": glorot_uniform(
                    k, (fan * c_in, c_out), dtype
                ).reshape(cfg.conv_kernel, cfg.conv_kernel, c_in, c_out),
                "b": jnp.zeros((c_out,), dtype),
            }
        )
        c_in = c_out
        h = -(-h // cfg.conv_stride)
        w = -(-w // cfg.conv_stride)
    params["proj_w"] = glorot_uniform(
        keys[-1], (h * w * c_in, cfg.embedding_dim), dtype
    )
    params["proj_b"] = jnp.zeros((cfg.embedding_dim,), dtype)
    return params


def video_cnn_apply(
    params: Params,
    cfg: VideoFrontendConfig,
    frames: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, H, W, C] lip crops -> [B, T, E] frame embeddings.

    For the AU path, ``frames`` is [B, T, au_dim].
    Padded frames are zeroed in the output via the length mask.
    """
    B, T = frames.shape[:2]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)

    if cfg.use_au_features:
        emb = jnp.einsum(
            "bta,ae->bte",
            frames.astype(compute_dtype),
            params["au_proj"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) + params["au_bias"]
        return emb * mask[:, :, None], lengths

    x = frames.reshape(B * T, *frames.shape[2:]).astype(compute_dtype)
    for conv in params["convs"]:
        # Conv runs entirely in compute_dtype (a fp32 preferred_element_type
        # here would make the grad-transpose conv see mixed dtypes); bias add
        # and ReLU happen in fp32.
        x = jax.lax.conv_general_dilated(
            x,
            conv["w"].astype(compute_dtype),
            window_strides=(cfg.conv_stride, cfg.conv_stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x.astype(jnp.float32) + conv["b"])
        x = x.astype(compute_dtype)
    x = x.reshape(B * T, -1)
    emb = jnp.dot(
        x, params["proj_w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + params["proj_b"]
    emb = emb.reshape(B, T, -1)
    return emb * mask[:, :, None], lengths
