"""Causal 1-D convolution primitives for the Mimi codec (channels-last).

Semantics match the reference codec's conv wrappers (the Mimi codec the
reference loads via ``moshi`` — src/csm/generator.py:66-70; architecture
documented in docs/reference/moshi/model_architecture.md):

  * causal Conv1d: left-pad ``(k-1)*dilation + 1 - stride`` zeros plus
    right "extra padding" so the last window is complete (the Encodec
    ``pad_for_conv1d`` rule);
  * causal ConvTranspose1d: full transposed conv, then trim
    ``k - stride`` samples from the right (``trim_right_ratio=1.0``).

Layout is (batch, time, channels) — channels-last keeps the channel dim on
TPU lanes so XLA lowers these to MXU matmuls over the kernel taps.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ConvParams(NamedTuple):
    w: jnp.ndarray  # (k, in_ch // groups, out_ch)  ('WIO' layout)
    b: Optional[jnp.ndarray]  # (out_ch,) or None


def causal_conv1d_padding(
    length: int, kernel_size: int, stride: int, dilation: int = 1
) -> tuple[int, int]:
    """(left, right) zero padding for a causal Mimi conv at static length."""
    k_eff = (kernel_size - 1) * dilation + 1
    padding_total = k_eff - stride
    n_frames = math.ceil((length - k_eff + padding_total) / stride + 1) - 1
    ideal_length = n_frames * stride + k_eff - padding_total
    extra_padding = ideal_length - length
    return padding_total, extra_padding


def conv1d_output_length(
    length: int, kernel_size: int, stride: int, dilation: int = 1
) -> int:
    left, right = causal_conv1d_padding(length, kernel_size, stride, dilation)
    k_eff = (kernel_size - 1) * dilation + 1
    return (length + left + right - k_eff) // stride + 1


def causal_conv1d(
    x: jnp.ndarray,
    p: ConvParams,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Causal conv. x: (B, T, C_in) → (B, T', C_out)."""
    k = p.w.shape[0]
    left, right = causal_conv1d_padding(x.shape[1], k, stride, dilation)
    x = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x,
        p.w.astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if p.b is not None:
        out = out + p.b.astype(out.dtype)
    return out


def causal_conv_transpose1d(
    x: jnp.ndarray,
    p: ConvParams,
    stride: int,
    groups: int = 1,
) -> jnp.ndarray:
    """Causal transposed conv with right-trim.

    x: (B, T, C_in) → (B, T*stride, C_out).  Implemented as an
    input-dilated regular conv (``lhs_dilation=stride`` + flipped kernel),
    which is what XLA lowers transposed convs to anyway and supports
    ``feature_group_count`` (needed for the depthwise 512-group upsampler).

    Weight layout: (k, C_in // groups, C_out_per_group... ) stored as
    'WIO' of the equivalent forward conv: (k, C_in//groups, C_out) with the
    kernel ALREADY flipped and axes arranged by the converter
    (see csm_tpu/codec/convert.py).
    """
    k = p.w.shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        p.w.astype(x.dtype),
        window_strides=(1,),
        padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if p.b is not None:
        out = out + p.b.astype(out.dtype)
    # full length = (T-1)*stride + k; causal trim k - stride from the right
    trim_right = k - stride
    return out[:, : out.shape[1] - trim_right, :]
