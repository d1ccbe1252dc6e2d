"""Watermark CNNs (SilentCipher architecture) in JAX.

Behavioral equivalent of src/csm/watermarking/silentcipher/model.py:
  * gated conv blocks: BN(conv(x) * sigmoid(gate(x)))  (:6-14);
  * ``Encoder`` — 3 gated 3x3 conv layers, 1→32→32 channels, plus a
    linear message embedder padded to the full frequency axis (:16-40);
  * ``CarrierDecoder`` — 96-channel gated convs → 1 channel, band-limited
    to ``message_band_size`` and RMS/SDR-normalized (:42-67);
  * ``MsgDecoder`` — 10 gated conv layers at 128 channels over the
    message band, then a linear collapse of the frequency axis (:69-95).

Inference-mode BatchNorm (running stats folded in).  Convs are
`lax.conv_general_dilated` in NCHW — XLA maps them onto the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GatedConv(NamedTuple):
    w: jnp.ndarray  # (out, in, kh, kw)
    b: jnp.ndarray  # (out,)
    gw: jnp.ndarray
    gb: jnp.ndarray
    bn_scale: jnp.ndarray  # gamma / sqrt(var + eps)
    bn_shift: jnp.ndarray  # beta - mean * bn_scale


def _conv2d(x, w, b, padding):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def gated_conv(x: jnp.ndarray, p: GatedConv, padding: int = 1) -> jnp.ndarray:
    h = _conv2d(x, p.w, p.b, padding) * jax.nn.sigmoid(
        _conv2d(x, p.gw, p.gb, padding)
    )
    return h * p.bn_scale[None, :, None, None] + p.bn_shift[None, :, None, None]


def _stack(x, layers, paddings):
    for p, pad in zip(layers, paddings):
        x = gated_conv(x, p, pad)
    return x


def encoder_apply(params: dict, carrier: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, F, T) magnitude → (B, 32, F, T) carrier features."""
    n = len(params["layers"])
    return _stack(carrier, params["layers"], [1] * n)


def transform_message(params: dict, msg: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """(B, 1, message_dim, T) one-hot → (B, 1, F, T) band-limited embed
    (reference Encoder.transform_message)."""
    # linear over the message_dim axis
    x = jnp.einsum("bcdt,de->bcet", msg, params["linear_w"]) + params[
        "linear_b"
    ][None, None, :, None]
    band = x.shape[2]
    F = n_fft // 2 + 1
    if band != F:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, F - band), (0, 0)))
    return x


def carrier_decoder_apply(
    params: dict, merged: jnp.ndarray, message_sdr: float, message_band_size: int
) -> jnp.ndarray:
    """(B, 96, F, T) → (B, 1, F, T) additive message perturbation,
    band-limited + RMS/SDR normalized (reference CarrierDecoder.forward)."""
    n = len(params["layers"])
    h = _stack(merged, params["layers"], [1] * (n - 1) + [0])
    F = h.shape[2]
    band_mask = (jnp.arange(F) < message_band_size)[None, None, :, None]
    h = h * band_mask
    rms = jnp.sqrt(jnp.mean(h * h, axis=2, keepdims=True))
    return h / jnp.maximum(rms, 1e-12) / (10.0 ** (message_sdr / 20.0))


def msg_decoder_apply(params: dict, carrier: jnp.ndarray, message_band_size: int):
    """(B, 1, F, T) magnitude → (B, 1, message_dim, T) logits."""
    x = carrier[:, :, :message_band_size, :]
    n = len(params["layers"])
    h = _stack(x, params["layers"], [1] * n)
    # linear collapse of the frequency axis
    h = jnp.einsum("bcft,f->bct", h, params["linear_w"]) + params["linear_b"]
    return h[:, None, :, :]  # (B, 1, message_dim, T)


# ---- init / import ----


def _init_gated(key, cin, cout, k, dtype=jnp.float32) -> GatedConv:
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(cin * k * k)
    return GatedConv(
        w=jax.random.normal(k1, (cout, cin, k, k), dtype) * scale,
        b=jnp.zeros((cout,), dtype),
        gw=jax.random.normal(k2, (cout, cin, k, k), dtype) * scale,
        gb=jnp.zeros((cout,), dtype),
        bn_scale=jnp.ones((cout,), dtype),
        bn_shift=jnp.zeros((cout,), dtype),
    )


def init_watermark_params(
    key: jax.Array,
    message_dim: int = 5,
    message_band_size: int = 512,
    n_fft: int = 1024,
    enc_layers: int = 3,
    dec_c_layers: int = 4,
    dec_m_layers: int = 10,
    channel_dim: int = 128,
    dtype=jnp.float32,
) -> dict:
    """Random init with the reference's layer/channel plan (for tests;
    real use imports the sony/silentcipher checkpoint)."""
    keys = jax.random.split(key, 4)
    F = n_fft // 2 + 1

    enc = [_init_gated(jax.random.fold_in(keys[0], 0), 1, 32, 3, dtype)]
    enc += [
        _init_gated(jax.random.fold_in(keys[0], i + 1), 32, 32, 3, dtype)
        for i in range(enc_layers - 1)
    ]

    dec_c = [_init_gated(jax.random.fold_in(keys[1], 0), 96, 96, 3, dtype)]
    dec_c += [
        _init_gated(jax.random.fold_in(keys[1], i + 1), 96, 96, 3, dtype)
        for i in range(dec_c_layers - 2)
    ]
    dec_c += [_init_gated(jax.random.fold_in(keys[1], 99), 96, 1, 1, dtype)]

    dec_m = [_init_gated(jax.random.fold_in(keys[2], 0), 1, channel_dim, 3, dtype)]
    dec_m += [
        _init_gated(jax.random.fold_in(keys[2], i + 1), channel_dim, channel_dim, 3, dtype)
        for i in range(dec_m_layers - 2)
    ]
    dec_m += [
        _init_gated(jax.random.fold_in(keys[2], 98), channel_dim, message_dim, 3, dtype)
    ]

    return {
        "enc_c": {
            "layers": enc,
            "linear_w": jax.random.normal(keys[3], (message_dim, message_band_size), dtype)
            / np.sqrt(message_dim),
            "linear_b": jnp.zeros((message_band_size,), dtype),
        },
        "dec_c": {"layers": dec_c},
        "dec_m": {
            "layers": dec_m,
            "linear_w": jax.random.normal(
                jax.random.fold_in(keys[3], 1), (message_band_size,), dtype
            )
            / np.sqrt(message_band_size),
            "linear_b": jnp.zeros((), dtype),
        },
    }


def convert_torch_watermark_state(enc_c: dict, dec_c: dict, dec_m: dict) -> dict:
    """Import sony/silentcipher torch state dicts (enc_c.ckpt, dec_c.ckpt,
    dec_m_0.ckpt) into this layout, folding BatchNorm running stats."""

    def _np(t):
        import torch

        return t.detach().cpu().numpy() if isinstance(t, torch.Tensor) else np.asarray(t)

    def gated(state, prefix, eps=1e-5):
        g = _np(state[f"{prefix}.bn.weight"])
        b = _np(state[f"{prefix}.bn.bias"])
        mean = _np(state[f"{prefix}.bn.running_mean"])
        var = _np(state[f"{prefix}.bn.running_var"])
        scale = g / np.sqrt(var + eps)
        return GatedConv(
            w=jnp.asarray(_np(state[f"{prefix}.conv.weight"])),
            b=jnp.asarray(_np(state[f"{prefix}.conv.bias"])),
            gw=jnp.asarray(_np(state[f"{prefix}.gate.weight"])),
            gb=jnp.asarray(_np(state[f"{prefix}.gate.bias"])),
            bn_scale=jnp.asarray(scale),
            bn_shift=jnp.asarray(b - mean * scale),
        )

    def layers(state, n):
        return [gated(state, f"main.{i}") for i in range(n)]

    def msg_layers(state):
        # MsgDecoder interleaves Dropout modules: conv layers sit at odd
        # indices 1, 3, 5, ...
        idx = sorted(
            {int(k.split(".")[1]) for k in state if k.startswith("main.") and ".conv." in k}
        )
        return [gated(state, f"main.{i}") for i in idx]

    n_enc = len({int(k.split(".")[1]) for k in enc_c if k.startswith("main.") and ".conv." in k})
    n_dec = len({int(k.split(".")[1]) for k in dec_c if k.startswith("main.") and ".conv." in k})
    return {
        "enc_c": {
            "layers": layers(enc_c, n_enc),
            "linear_w": jnp.asarray(_np(enc_c["linear.weight"]).T),
            "linear_b": jnp.asarray(_np(enc_c["linear.bias"])),
        },
        "dec_c": {"layers": layers(dec_c, n_dec)},
        "dec_m": {
            "layers": msg_layers(dec_m),
            "linear_w": jnp.asarray(_np(dec_m["linear.weight"])[0]),
            "linear_b": jnp.asarray(_np(dec_m["linear.bias"])[0]),
        },
    }
