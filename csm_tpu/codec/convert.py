"""Import public Mimi checkpoint weights into the JAX codec.

Source naming follows the HuggingFace ``MimiModel`` layout (the
``kyutai/mimi`` checkpoint; the reference loads the same weights through
``moshi.models.loaders.get_mimi``, src/csm/generator.py:66-70).

Weight transforms:
  * Conv1d  (out, in, k)        → 'WIO' (k, in, out)
  * ConvTranspose1d (in, out/g, k) → equivalent-forward-conv 'WIO'
    (k, in/g, out) with the kernel flipped along time (we realize
    transposed convs as input-dilated regular convs — see
    csm_tpu/codec/convs.py)
  * Linear (out, in) → (in, out)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from csm_tpu.codec.convs import ConvParams
from csm_tpu.codec.rvq import RVQParams, SplitRVQParams


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        import torch

        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(state: Dict, name: str, bias: bool = True) -> ConvParams:
    w = _np(state[f"{name}.weight"])  # (out, in, k)
    b = _np(state[f"{name}.bias"]) if bias and f"{name}.bias" in state else None
    return ConvParams(np.transpose(w, (2, 1, 0)), b)


def _conv_transpose(state: Dict, name: str, groups: int = 1) -> ConvParams:
    """torch ConvTranspose1d (in, out/g, k) → flipped forward-conv 'WIO'."""
    w = _np(state[f"{name}.weight"])  # (in, out_per_group, k)
    cin, out_pg, k = w.shape
    in_pg = cin // groups
    # target rhs: (k, in/g, out) with out = groups * out_pg, group-major
    w = w.reshape(groups, in_pg, out_pg, k)
    w = np.flip(w, axis=-1)  # time flip
    # rhs[t, i_pg, g*out_pg + o] = w[g, i_pg, o, t]
    rhs = np.transpose(w, (3, 1, 0, 2)).reshape(k, in_pg, groups * out_pg)
    b = _np(state[f"{name}.bias"]) if f"{name}.bias" in state else None
    return ConvParams(rhs, b)


def _seanet_encoder(state: Dict) -> dict:
    # module-list indices in the HF MimiEncoder:
    # 0 init conv; per stage i: 3i+1 resnet, 3i+3 down conv; 14 final conv
    blocks = []
    for i in range(4):
        res = 3 * i + 1
        down = 3 * i + 3
        blocks.append(
            {
                "res_conv1": _conv(state, f"encoder.layers.{res}.block.1.conv"),
                "res_conv2": _conv(state, f"encoder.layers.{res}.block.3.conv"),
                "down": _conv(state, f"encoder.layers.{down}.conv"),
            }
        )
    return {
        "init": _conv(state, "encoder.layers.0.conv"),
        "blocks": blocks,
        "final": _conv(state, "encoder.layers.14.conv"),
    }


def _seanet_decoder(state: Dict) -> dict:
    # 0 init conv; per stage i: 3i+2 transpose conv, 3i+3 resnet; 14 final
    blocks = []
    for i in range(4):
        up = 3 * i + 2
        res = 3 * i + 3
        blocks.append(
            {
                "up": _conv_transpose(state, f"decoder.layers.{up}.conv"),
                "res_conv1": _conv(state, f"decoder.layers.{res}.block.1.conv"),
                "res_conv2": _conv(state, f"decoder.layers.{res}.block.3.conv"),
            }
        )
    return {
        "init": _conv(state, "decoder.layers.0.conv"),
        "blocks": blocks,
        "final": _conv(state, "decoder.layers.14.conv"),
    }


def _transformer(state: Dict, prefix: str, num_layers: int) -> dict:
    def stack(fmt, transpose=False):
        ws = [_np(state[fmt.format(i=i)]) for i in range(num_layers)]
        ws = np.stack(ws)
        return np.swapaxes(ws, 1, 2) if transpose else ws

    return {
        "layers": {
            "wq": stack(prefix + ".layers.{i}.self_attn.q_proj.weight", True),
            "wk": stack(prefix + ".layers.{i}.self_attn.k_proj.weight", True),
            "wv": stack(prefix + ".layers.{i}.self_attn.v_proj.weight", True),
            "wo": stack(prefix + ".layers.{i}.self_attn.o_proj.weight", True),
            "fc1": stack(prefix + ".layers.{i}.mlp.fc1.weight", True),
            "fc2": stack(prefix + ".layers.{i}.mlp.fc2.weight", True),
            "ln1_scale": stack(prefix + ".layers.{i}.input_layernorm.weight"),
            "ln1_bias": stack(prefix + ".layers.{i}.input_layernorm.bias"),
            "ln2_scale": stack(prefix + ".layers.{i}.post_attention_layernorm.weight"),
            "ln2_bias": stack(prefix + ".layers.{i}.post_attention_layernorm.bias"),
            "attn_scale": stack(prefix + ".layers.{i}.self_attn_layer_scale.scale"),
            "mlp_scale": stack(prefix + ".layers.{i}.mlp_layer_scale.scale"),
        }
    }


def _rvq(state: Dict, prefix: str, num_q: int) -> RVQParams:
    embed_sum = np.stack(
        [_np(state[f"{prefix}.layers.{i}.codebook.embed_sum"]) for i in range(num_q)]
    )
    usage = np.stack(
        [
            _np(state[f"{prefix}.layers.{i}.codebook.cluster_usage"])
            for i in range(num_q)
        ]
    )
    return RVQParams(
        input_proj=_np(state[f"{prefix}.input_proj.weight"])[:, :, 0].T,
        output_proj=_np(state[f"{prefix}.output_proj.weight"])[:, :, 0].T,
        embed_sum=embed_sum,
        cluster_usage=usage,
    )


def convert_mimi_state_dict(state: Dict, num_layers: int = 8, num_quantizers: int = 32) -> dict:
    """HF ``MimiModel`` state_dict → JAX Mimi parameter tree (numpy f32)."""
    return {
        "encoder": _seanet_encoder(state),
        "encoder_transformer": _transformer(state, "encoder_transformer", num_layers),
        "downsample": _conv(state, "downsample.conv", bias=False),
        "upsample": _conv_transpose(state, "upsample.conv", groups=512),
        "decoder_transformer": _transformer(state, "decoder_transformer", num_layers),
        "decoder": _seanet_decoder(state),
        "quantizer": SplitRVQParams(
            semantic=_rvq(
                state, "quantizer.semantic_residual_vector_quantizer", 1
            ),
            acoustic=_rvq(
                state,
                "quantizer.acoustic_residual_vector_quantizer",
                num_quantizers - 1,
            ),
        ),
    }


def load_mimi_checkpoint(path: str) -> dict:
    """Load a Mimi checkpoint file (.safetensors HF layout or torch .bin)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(path)
    else:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_mimi_state_dict(state)
