"""Streaming Mimi decode with carried state — O(chunk) work per chunk.

``csm_tpu.codec.mimi.mimi_decode`` is a full-sequence program; calling it
on a growing code buffer makes streaming O(n²) in codec compute.  Mimi is
streaming-causal by construction (the reference's codec docs spec the
streaming design: docs/reference/moshi/model_architecture.md,
docs/reference/sesame_csm/inference.md:135), so every layer can carry
exact state across chunks:

  * stride-1 causal Conv1d: the full path left-pads ``k_eff - 1`` zeros;
    streaming carries the last ``k_eff - 1`` *inputs* instead (zeros at
    start) — identical receptive field, identical outputs;
  * causal ConvTranspose1d (stride s, kernel k): input u contributes to
    outputs [u·s, u·s + k − 1], i.e. a chunk's last inputs reach
    ``k − s`` samples past the chunk boundary.  Streaming emits the first
    ``T·s`` outputs and carries the ``k − s``-sample tail, overlap-adding
    it into the next chunk (bias applied once, on emit) — exact by
    linearity of convolution;
  * codec transformer (sliding window 250, causal): carries a per-layer
    KV ring of the last ``window`` positions with their absolute
    positions; RoPE uses absolute positions, so attention sees exactly
    the window the full-sequence mask selects.

``test_mimi_streaming.py`` proves chunked decode == full decode to 1e-4
over 30+ s of audio.  Everything here is a pure function over a state
pytree — jit the step once per chunk shape and stream forever.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.codec.convs import ConvParams
from csm_tpu.codec.mimi import CSM_MIMI_CONFIG, MimiConfig
from csm_tpu.codec.rvq import split_rvq_decode
from csm_tpu.codec.seanet import DECODER_RATIOS
from csm_tpu.codec.transformer import (
    MimiTransformerConfig,
    _apply_rope,
    _layer_norm,
    _rope_tables,
)

# Far enough below any real position that (kpos > qpos - window) is false.
_EMPTY_POS = -(2**30)
# RoPE table length. Positions REBASE before reaching it (see
# _maybe_rebase below), so streaming runs forever with a fixed table.
_MAX_STREAM_POS = 8192
_REBASE_AT = _MAX_STREAM_POS // 2


# ---------------------------------------------------------------------------
# conv primitives with carried state
# ---------------------------------------------------------------------------


def conv_stream_init(
    batch: int, p: ConvParams, dilation: int = 1, stride: int = 1,
    dtype=jnp.float32,
):
    """Zero input-history for a causal conv: (B, k_eff - stride, C_in).

    The full path left-pads ``k_eff - stride`` zeros (convs.py
    causal_conv1d_padding); streaming carries that many trailing INPUTS.
    Chunk lengths must be multiples of ``stride`` (then the full path's
    "extra right padding" is zero and outputs align exactly)."""
    k = p.w.shape[0]
    k_eff = (k - 1) * dilation + 1
    c_in = p.w.shape[1]
    return jnp.zeros((batch, k_eff - stride, c_in), dtype)


def conv_stream(
    x: jnp.ndarray, p: ConvParams, state: jnp.ndarray, dilation: int = 1,
    stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming causal conv. x: (B, Tc, C_in) → (B, Tc/stride, C_out)."""
    hist = state.shape[1]
    xin = jnp.concatenate([state.astype(x.dtype), x], axis=1)
    out = jax.lax.conv_general_dilated(
        xin,
        p.w.astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if p.b is not None:
        out = out + p.b.astype(out.dtype)
    new_state = xin[:, xin.shape[1] - hist :] if hist else state
    return out, new_state


def convt_stream_init(batch: int, p: ConvParams, stride: int, groups: int = 1,
                      dtype=jnp.float32):
    """Zero output-tail carry for a causal transposed conv: (B, k-s, C_out)."""
    k, in_pg, c_out = p.w.shape
    return jnp.zeros((batch, k - stride, c_out), dtype)


def convt_stream(
    x: jnp.ndarray, p: ConvParams, stride: int, state: jnp.ndarray, groups: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming causal transposed conv. x: (B, Tc, C_in) → (B, Tc*s, C_out).

    Raw (bias-free) transposed conv of the chunk has length
    (Tc-1)*s + k = Tc*s + (k-s); the first Tc*s samples are emitted with
    the previous chunk's tail overlap-added, the final k-s become the new
    tail.  Bias is added only on emit, so each output sample gets it once.
    """
    k = p.w.shape[0]
    y = jax.lax.conv_general_dilated(
        x,
        p.w.astype(x.dtype),
        window_strides=(1,),
        padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    t_out = x.shape[1] * stride
    emit = y[:, :t_out]
    carry_w = k - stride
    if carry_w:
        emit = emit.at[:, :carry_w].add(state.astype(emit.dtype))
        new_state = y[:, t_out:]
    else:
        new_state = state
    if p.b is not None:
        emit = emit + p.b.astype(emit.dtype)
    return emit, new_state


# ---------------------------------------------------------------------------
# codec transformer with windowed KV carry
# ---------------------------------------------------------------------------


def transformer_stream_init(
    params: dict, cfg: MimiTransformerConfig, batch: int, dtype=jnp.float32
) -> dict:
    L, W, H, D = cfg.num_layers, cfg.sliding_window, cfg.num_heads, cfg.head_dim
    return {
        "k": jnp.zeros((L, batch, W, H, D), jnp.float32),
        "v": jnp.zeros((L, batch, W, H, D), jnp.float32),
        "pos": jnp.full((W,), _EMPTY_POS, jnp.int32),
        "next": jnp.zeros((), jnp.int32),
    }


def _maybe_rebase(state: dict, cfg: MimiTransformerConfig) -> dict:
    """Shift positions down by ``next - window`` once they near the RoPE
    table's edge, counter-rotating cached K by the same delta.

    RoPE attention scores and the sliding-window mask depend only on
    position DIFFERENCES, so a uniform shift is exact; a cached slot is
    re-rotated at most once within its ``window``-frame lifetime (the
    rebase threshold is far larger than the window), keeping float error
    negligible.  This is what lets a stream run forever on a fixed table.
    """
    W, D = cfg.sliding_window, cfg.head_dim

    def rebase(st):
        delta = st["next"] - W
        inv = 1.0 / (
            cfg.rope_theta
            ** (jnp.arange(0, D, 2, dtype=jnp.float32) / jnp.float32(D))
        )
        ang = -delta.astype(jnp.float32) * inv  # (D/2,)
        cos_d = jnp.broadcast_to(jnp.cos(ang)[None], (st["k"].shape[2], D // 2))
        sin_d = jnp.broadcast_to(jnp.sin(ang)[None], (st["k"].shape[2], D // 2))
        L, B, W_, H, D_ = st["k"].shape
        k = _apply_rope(st["k"].reshape(L * B, W_, H, D_), cos_d, sin_d)
        pos = jnp.where(
            st["pos"] > _EMPTY_POS // 2, st["pos"] - delta, st["pos"]
        )
        return {
            "k": k.reshape(L, B, W_, H, D_),
            "v": st["v"],  # V carries no rotation
            "pos": pos,
            "next": jnp.full((), W, jnp.int32),
        }

    return jax.lax.cond(state["next"] >= _REBASE_AT, rebase, lambda s: s, state)


def transformer_stream(
    params: dict, cfg: MimiTransformerConfig, state: dict, h: jnp.ndarray
) -> Tuple[jnp.ndarray, dict]:
    """Chunk pass with carried window-KV. h: (B, Sc, E) → (B, Sc, E).

    Matches ``mimi_transformer_apply``'s mask — query at absolute position
    i attends keys at j with j <= i and j > i - window — because cached
    slots carry their absolute positions (empty slots sit at -2^30).
    """
    B, S, E = h.shape
    H, D, W = cfg.num_heads, cfg.head_dim, cfg.sliding_window
    state = _maybe_rebase(state, cfg)
    cos_np, sin_np = _rope_tables(D, cfg.rope_theta, _MAX_STREAM_POS)
    positions = state["next"] + jnp.arange(S, dtype=jnp.int32)
    cos = jnp.take(jnp.asarray(cos_np), positions, axis=0)
    sin = jnp.take(jnp.asarray(sin_np), positions, axis=0)

    key_pos = jnp.concatenate([state["pos"], positions])  # (W+S,)
    qpos = positions[:, None]
    mask = (key_pos[None, :] <= qpos) & (key_pos[None, :] > qpos - W)  # (S, W+S)

    def body(h, xs):
        lp, kc, vc = xs
        x = _layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], cfg.norm_eps)
        q = (x @ lp["wq"]).reshape(B, S, H, D)
        k = (x @ lp["wk"]).reshape(B, S, H, D)
        v = (x @ lp["wv"]).reshape(B, S, H, D)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        k_all = jnp.concatenate([kc, k.astype(jnp.float32)], axis=1)  # (B,W+S,H,D)
        v_all = jnp.concatenate([vc, v.astype(jnp.float32)], axis=1)
        scale = 1.0 / jnp.sqrt(jnp.float32(D))
        scores = jnp.einsum(
            "bshd,bthd->bhst", q.astype(jnp.float32) * scale, k_all
        )
        scores = jnp.where(mask[None, None], scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhst,bthd->bshd", probs, v_all)
        attn = attn.reshape(B, S, E).astype(h.dtype)
        h = h + lp["attn_scale"] * (attn @ lp["wo"])

        x = _layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], cfg.norm_eps)
        mlp = jax.nn.gelu(x @ lp["fc1"], approximate=False) @ lp["fc2"]
        h = h + lp["mlp_scale"] * mlp
        return h, (k_all[:, -W:], v_all[:, -W:])

    h, (nk, nv) = jax.lax.scan(body, h, (params["layers"], state["k"], state["v"]))
    new_state = {
        "k": nk,
        "v": nv,
        "pos": key_pos[-W:],
        "next": state["next"] + S,
    }
    return h, new_state


# ---------------------------------------------------------------------------
# full decode path state
# ---------------------------------------------------------------------------


def mimi_decode_stream_init(
    params: dict, batch: int = 1, cfg: MimiConfig = CSM_MIMI_CONFIG
) -> dict:
    """Fresh streaming-decoder state for a ``batch``-stream session."""
    dec = params["decoder"]
    blocks = []
    for blk, stride in zip(dec["blocks"], DECODER_RATIOS):
        blocks.append(
            {
                "up": convt_stream_init(batch, blk["up"], stride),
                "res1": conv_stream_init(batch, blk["res_conv1"]),
                "res2": conv_stream_init(batch, blk["res_conv2"]),
            }
        )
    return {
        "upsample": convt_stream_init(batch, params["upsample"], 2,
                                      groups=cfg.hidden_size),
        "transformer": transformer_stream_init(
            params["decoder_transformer"], cfg.transformer, batch
        ),
        "seanet": {
            "init": conv_stream_init(batch, dec["init"]),
            "blocks": blocks,
            "final": conv_stream_init(batch, dec["final"]),
        },
    }


def mimi_decode_stream_step(
    params: dict,
    state: dict,
    codes: jnp.ndarray,
    cfg: MimiConfig = CSM_MIMI_CONFIG,
) -> Tuple[jnp.ndarray, dict]:
    """Decode one chunk of RVQ codes, carrying codec state.

    Args:
        codes: (B, K, Tc) int codes — Tc new 12.5 Hz frames.
    Returns:
        (audio, new_state): audio (B, Tc*1920) — exactly the samples the
        full decode would emit for these frame positions.
    """
    latents = split_rvq_decode(params["quantizer"], codes)  # (B, Tc, 512)
    latents, up_state = convt_stream(
        latents, params["upsample"], 2, state["upsample"], groups=cfg.hidden_size
    )  # (B, 2*Tc, 512)
    latents, tr_state = transformer_stream(
        params["decoder_transformer"], cfg.transformer, state["transformer"], latents
    )

    sn = state["seanet"]
    dec = params["decoder"]
    x, s_init = conv_stream(latents, dec["init"], sn["init"])
    new_blocks = []
    for blk, bs, stride in zip(dec["blocks"], sn["blocks"], DECODER_RATIOS):
        x = jax.nn.elu(x)
        x, s_up = convt_stream(x, blk["up"], stride, bs["up"])
        y = jax.nn.elu(x)
        y, s_r1 = conv_stream(y, blk["res_conv1"], bs["res1"])
        y = jax.nn.elu(y)
        y, s_r2 = conv_stream(y, blk["res_conv2"], bs["res2"])
        x = x + y
        new_blocks.append({"up": s_up, "res1": s_r1, "res2": s_r2})
    x = jax.nn.elu(x)
    x, s_final = conv_stream(x, dec["final"], sn["final"])

    new_state = {
        "upsample": up_state,
        "transformer": tr_state,
        "seanet": {"init": s_init, "blocks": new_blocks, "final": s_final},
    }
    return x[..., 0], new_state


# ---------------------------------------------------------------------------
# full encode path state (the other streaming direction — live audio in)
# ---------------------------------------------------------------------------


def mimi_encode_stream_init(
    params: dict, batch: int = 1, cfg: MimiConfig = CSM_MIMI_CONFIG
) -> dict:
    """Fresh streaming-encoder state.

    Every encoder stage is causal (strided convs included), so carried
    input histories + the windowed transformer KV make chunked encoding
    exact — the full-duplex complement of the streaming decoder (the
    reference's codec docs spec streaming both directions,
    docs/reference/moshi/model_architecture.md)."""
    from csm_tpu.codec.seanet import ENCODER_RATIOS

    enc = params["encoder"]
    blocks = []
    for blk, stride in zip(enc["blocks"], ENCODER_RATIOS):
        blocks.append(
            {
                "res1": conv_stream_init(batch, blk["res_conv1"]),
                "res2": conv_stream_init(batch, blk["res_conv2"]),
                "down": conv_stream_init(batch, blk["down"], stride=stride),
            }
        )
    return {
        "seanet": {
            "init": conv_stream_init(batch, enc["init"]),
            "blocks": blocks,
            "final": conv_stream_init(batch, enc["final"]),
        },
        "transformer": transformer_stream_init(
            params["encoder_transformer"], cfg.transformer, batch
        ),
        "downsample": conv_stream_init(batch, params["downsample"], stride=2),
    }


def mimi_encode_stream_step(
    params: dict,
    state: dict,
    audio: jnp.ndarray,
    cfg: MimiConfig = CSM_MIMI_CONFIG,
    num_quantizers=None,
) -> Tuple[jnp.ndarray, dict]:
    """Encode one audio chunk, carrying codec state.

    Args:
        audio: (B, Tc) float 24 kHz samples; Tc must be a multiple of
            ``cfg.samples_per_frame`` (1920) so every strided stage sees a
            stride-aligned length.
    Returns:
        (codes, new_state): codes (B, K, Tc/1920) — exactly the codes the
        full encode would emit for these frame positions.
    """
    from csm_tpu.codec.rvq import split_rvq_encode
    from csm_tpu.codec.seanet import ENCODER_RATIOS

    if audio.shape[-1] % cfg.samples_per_frame:
        raise ValueError(
            f"stream chunk length {audio.shape[-1]} must be a multiple of "
            f"{cfg.samples_per_frame}"
        )
    enc = params["encoder"]
    sn = state["seanet"]
    x = audio[..., None]  # (B, Tc, 1)
    x, s_init = conv_stream(x, enc["init"], sn["init"])
    new_blocks = []
    for blk, bs, stride in zip(enc["blocks"], sn["blocks"], ENCODER_RATIOS):
        y = jax.nn.elu(x)
        y, s_r1 = conv_stream(y, blk["res_conv1"], bs["res1"])
        y = jax.nn.elu(y)
        y, s_r2 = conv_stream(y, blk["res_conv2"], bs["res2"])
        x = x + y
        x = jax.nn.elu(x)
        x, s_down = conv_stream(x, blk["down"], bs["down"], stride=stride)
        new_blocks.append({"res1": s_r1, "res2": s_r2, "down": s_down})
    x = jax.nn.elu(x)
    x, s_final = conv_stream(x, enc["final"], sn["final"])  # (B, 2*Tf, 512)

    x, tr_state = transformer_stream(
        params["encoder_transformer"], cfg.transformer, state["transformer"], x
    )
    x, ds_state = conv_stream(
        x, params["downsample"], state["downsample"], stride=2
    )  # (B, Tf, 512)
    codes = split_rvq_encode(params["quantizer"], x, num_quantizers)

    new_state = {
        "seanet": {"init": s_init, "blocks": new_blocks, "final": s_final},
        "transformer": tr_state,
        "downsample": ds_state,
    }
    return codes, new_state


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_step_jit(params, state, codes, cfg):
    return mimi_decode_stream_step(params, state, codes, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "num_quantizers"))
def _encode_step_jit(params, state, audio, cfg, num_quantizers):
    return mimi_encode_stream_step(params, state, audio, cfg, num_quantizers)


class MimiStreamEncoder:
    """Host-side convenience wrapper: feed (Tc,) audio chunks, get codes.

    The encode-side mirror of MimiStreamDecoder — one compiled program per
    distinct chunk length."""

    def __init__(self, params, cfg: MimiConfig = CSM_MIMI_CONFIG,
                 batch: int = 1, num_quantizers=None):
        self.params = params
        self.cfg = cfg
        self.batch = batch
        self.num_quantizers = num_quantizers
        self.state = mimi_encode_stream_init(params, batch, cfg)

    def reset(self):
        self.state = mimi_encode_stream_init(self.params, self.batch, self.cfg)

    def encode_chunk(self, audio: np.ndarray) -> np.ndarray:
        """(Tc,) float samples → (K, Tc/1920) int32 codes (batch=1 sugar)."""
        a = jnp.asarray(audio, jnp.float32)[None]
        codes, self.state = _encode_step_jit(
            self.params, self.state, a, self.cfg, self.num_quantizers
        )
        return np.asarray(codes[0], np.int32)


class MimiStreamDecoder:
    """Host-side convenience wrapper: feed (K, Tc) code chunks, get audio.

    One compiled program per distinct Tc (stream with a fixed chunk size
    and at most two shapes compile — steady chunks plus a final remnant,
    which callers may instead pad and slice).
    """

    def __init__(self, params, cfg: MimiConfig = CSM_MIMI_CONFIG, batch: int = 1):
        self.params = params
        self.cfg = cfg
        self.batch = batch
        self.state = mimi_decode_stream_init(params, batch, cfg)

    def reset(self):
        self.state = mimi_decode_stream_init(self.params, self.batch, self.cfg)

    def decode_chunk(self, codes: np.ndarray) -> np.ndarray:
        """(K, Tc) int codes → (Tc*1920,) float32 samples (batch=1 sugar)."""
        return np.asarray(self.decode_chunk_async(codes), np.float32)

    def decode_chunk_async(self, codes: np.ndarray):
        """Like decode_chunk but returns the (Tc*1920,) DEVICE array
        without blocking — JAX dispatch is asynchronous, so callers in a
        latency-sensitive loop (e.g. the serving stream sink) can overlap
        codec decode with the next token chunk and fetch results later."""
        c = jnp.asarray(codes)[None]
        c = jnp.minimum(c, self.cfg.codebook_size - 1)
        audio, self.state = _decode_step_jit(self.params, self.state, c, self.cfg)
        return audio[0]
