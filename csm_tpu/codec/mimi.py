"""Mimi neural audio codec — TPU-native JAX implementation.

24 kHz mono waveform ↔ 32 RVQ codebooks at 12.5 Hz (80 ms frames):

    encode:  SEANet conv encoder (→25 Hz latents) → 8-layer transformer →
             stride-2 causal downsample (→12.5 Hz) → split RVQ
             (1 semantic + 31 acoustic codebooks)
    decode:  split RVQ embed-sum → depthwise stride-2 transposed upsample
             (→25 Hz) → 8-layer transformer → SEANet conv decoder (→24 kHz)

The reference treats Mimi as an external PyTorch dependency
(``moshi.models.loaders.get_mimi``, src/csm/generator.py:66-70); here it is
a first-class XLA program so audio tokenization/synthesis stays on-device.
Weight import from public Mimi checkpoints: csm_tpu/codec/convert.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from csm_tpu.codec.convs import ConvParams, causal_conv1d, causal_conv_transpose1d, conv1d_output_length
from csm_tpu.codec.rvq import (
    RVQParams,
    SplitRVQParams,
    split_rvq_decode,
    split_rvq_encode,
)
from csm_tpu.codec.seanet import (
    encoded_length,
    seanet_decode,
    seanet_decoder_init,
    seanet_encode,
    seanet_encoder_init,
)
from csm_tpu.codec.transformer import (
    MimiTransformerConfig,
    mimi_transformer_apply,
    mimi_transformer_init,
)


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24_000
    frame_rate: float = 12.5
    hidden_size: int = 512
    num_filters: int = 64
    codebook_size: int = 2048
    codebook_dim: int = 256
    num_quantizers: int = 32
    num_semantic_quantizers: int = 1
    transformer: MimiTransformerConfig = MimiTransformerConfig()

    @property
    def samples_per_frame(self) -> int:
        return int(self.sample_rate / self.frame_rate)  # 1920 (80 ms)


CSM_MIMI_CONFIG = MimiConfig()


def mimi_encode(
    params: dict,
    audio: jnp.ndarray,
    cfg: MimiConfig = CSM_MIMI_CONFIG,
    num_quantizers: Optional[int] = None,
) -> jnp.ndarray:
    """Encode waveform to RVQ codes.

    Args:
        audio: (B, T) float waveform at 24 kHz.
    Returns:
        (B, K, T_frames) int32 codes at 12.5 Hz (codebook 0 semantic).
    """
    latents = seanet_encode(params["encoder"], audio)  # (B, F25, 512)
    latents = mimi_transformer_apply(
        params["encoder_transformer"], cfg.transformer, latents
    )
    latents = causal_conv1d(latents, params["downsample"], stride=2)  # (B, F, 512)
    return split_rvq_encode(params["quantizer"], latents, num_quantizers)


def mimi_decode(
    params: dict, codes: jnp.ndarray, cfg: MimiConfig = CSM_MIMI_CONFIG
) -> jnp.ndarray:
    """Decode RVQ codes to waveform.

    Args:
        codes: (B, K, T_frames) int codes.
    Returns:
        (B, T) float waveform at 24 kHz.
    """
    latents = split_rvq_decode(params["quantizer"], codes)  # (B, F, 512)
    latents = causal_conv_transpose1d(
        latents, params["upsample"], stride=2, groups=cfg.hidden_size
    )  # (B, F25, 512)
    latents = mimi_transformer_apply(
        params["decoder_transformer"], cfg.transformer, latents
    )
    return seanet_decode(params["decoder"], latents)


def mimi_num_frames(audio_len: int) -> int:
    """Frames produced for an input length (encoder chain + downsample)."""
    return conv1d_output_length(encoded_length(audio_len), 4, 2)


def mimi_init(key: jax.Array, cfg: MimiConfig = CSM_MIMI_CONFIG, dtype=jnp.float32) -> dict:
    """Random-init Mimi parameters (for tests; real use imports weights)."""
    k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 8)
    H, D, C = cfg.hidden_size, cfg.codebook_dim, cfg.codebook_size

    def rvq_init(k, Q):
        a, b, c = jax.random.split(k, 3)
        return RVQParams(
            input_proj=(jax.random.normal(a, (H, D)) / jnp.sqrt(H)).astype(dtype),
            output_proj=(jax.random.normal(b, (D, H)) / jnp.sqrt(D)).astype(dtype),
            embed_sum=jax.random.normal(c, (Q, C, D)).astype(dtype),
            cluster_usage=jnp.ones((Q, C), dtype),
        )

    return {
        "encoder": seanet_encoder_init(k1, cfg.num_filters, H, dtype),
        "encoder_transformer": mimi_transformer_init(k2, cfg.transformer, dtype),
        "downsample": ConvParams(
            (jax.random.normal(k3, (4, H, H)) / jnp.sqrt(4 * H)).astype(dtype), None
        ),
        "upsample": ConvParams(
            (jax.random.normal(k4, (4, 1, H)) / 2.0).astype(dtype), None
        ),
        "decoder_transformer": mimi_transformer_init(k5, cfg.transformer, dtype),
        "decoder": seanet_decoder_init(k6, cfg.num_filters, H, dtype),
        "quantizer": SplitRVQParams(
            semantic=rvq_init(k7, cfg.num_semantic_quantizers),
            acoustic=rvq_init(k8, cfg.num_quantizers - cfg.num_semantic_quantizers),
        ),
    }
