"""SEANet convolutional encoder/decoder for the Mimi codec.

24 kHz mono waveform ↔ 512-d latents at 25 Hz.  Encoder: init conv (1→64,
k7) then four [residual-unit → ELU → strided-downsample] stages with ratios
(4, 5, 6, 8) doubling channels each stage, then ELU + final conv
(1024→512, k3).  Decoder mirrors it with transposed convs and ratios
(8, 6, 5, 4).  All convs causal (left-padded).  Residual unit:
ELU → conv k3 (C→C/2) → ELU → conv k1 (C/2→C) + identity skip.

Reference-capability equivalent of the Mimi SEANet stacks the reference
uses through ``moshi`` (src/csm/generator.py:66-70;
docs/reference/moshi/model_architecture.md).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.codec.convs import (
    ConvParams,
    causal_conv1d,
    causal_conv_transpose1d,
    conv1d_output_length,
)

# (stride) per encoder stage; decoder uses the reverse.
ENCODER_RATIOS = (4, 5, 6, 8)
DECODER_RATIOS = (8, 6, 5, 4)


def _res_unit(x: jnp.ndarray, conv1: ConvParams, conv2: ConvParams) -> jnp.ndarray:
    y = jax.nn.elu(x)
    y = causal_conv1d(y, conv1)
    y = jax.nn.elu(y)
    y = causal_conv1d(y, conv2)
    return x + y


def seanet_encode(params: dict, audio: jnp.ndarray) -> jnp.ndarray:
    """(B, T) waveform → (B, T/960, 512) latents at 25 Hz."""
    x = audio[..., None]  # (B, T, 1)
    x = causal_conv1d(x, params["init"])
    for blk, stride in zip(params["blocks"], ENCODER_RATIOS):
        x = _res_unit(x, blk["res_conv1"], blk["res_conv2"])
        x = jax.nn.elu(x)
        x = causal_conv1d(x, blk["down"], stride=stride)
    x = jax.nn.elu(x)
    x = causal_conv1d(x, params["final"])
    return x


def seanet_decode(params: dict, latents: jnp.ndarray) -> jnp.ndarray:
    """(B, F, 512) latents at 25 Hz → (B, F*960) waveform."""
    x = causal_conv1d(latents, params["init"])
    for blk, stride in zip(params["blocks"], DECODER_RATIOS):
        x = jax.nn.elu(x)
        x = causal_conv_transpose1d(x, blk["up"], stride=stride)
        x = _res_unit(x, blk["res_conv1"], blk["res_conv2"])
    x = jax.nn.elu(x)
    x = causal_conv1d(x, params["final"])
    return x[..., 0]  # (B, T)


def encoded_length(audio_len: int) -> int:
    """Number of 25 Hz latent frames the encoder produces."""
    n = conv1d_output_length(audio_len, 7, 1)
    for stride in ENCODER_RATIOS:
        n = conv1d_output_length(n, 2 * stride, stride)
    return conv1d_output_length(n, 3, 1)


def _conv_init(key, k, cin, cout, bias=True, dtype=jnp.float32):
    w = jax.random.normal(key, (k, cin, cout), jnp.float32) / np.sqrt(k * cin)
    return ConvParams(
        w.astype(dtype), jnp.zeros((cout,), dtype) if bias else None
    )


def seanet_encoder_init(key, num_filters=64, hidden=512, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 32))
    c = num_filters
    blocks: List[dict] = []
    params = {"init": _conv_init(next(ks), 7, 1, c, dtype=dtype)}
    for stride in ENCODER_RATIOS:
        blocks.append(
            {
                "res_conv1": _conv_init(next(ks), 3, c, c // 2, dtype=dtype),
                "res_conv2": _conv_init(next(ks), 1, c // 2, c, dtype=dtype),
                "down": _conv_init(next(ks), 2 * stride, c, 2 * c, dtype=dtype),
            }
        )
        c *= 2
    params["blocks"] = blocks
    params["final"] = _conv_init(next(ks), 3, c, hidden, dtype=dtype)
    return params


def seanet_decoder_init(key, num_filters=64, hidden=512, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 32))
    c = num_filters * 16  # 1024
    blocks: List[dict] = []
    params = {"init": _conv_init(next(ks), 7, hidden, c, dtype=dtype)}
    for stride in DECODER_RATIOS:
        blocks.append(
            {
                "up": _conv_init(next(ks), 2 * stride, c, c // 2, dtype=dtype),
                "res_conv1": _conv_init(next(ks), 3, c // 2, c // 4, dtype=dtype),
                "res_conv2": _conv_init(next(ks), 1, c // 4, c // 2, dtype=dtype),
            }
        )
        c //= 2
    params["blocks"] = blocks
    params["final"] = _conv_init(next(ks), 3, c, 1, dtype=dtype)
    return params
