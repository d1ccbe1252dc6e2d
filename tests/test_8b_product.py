"""8B productization (round-4 verdict Missing #2): the 8B flavor is a
CLI-reachable product — csm-generate/csm-serve/csm-finetune-lora accept
``--flavor 8b`` wired to ``csm_8b_args`` with the leaf-streamed
quantized load path — not just a bench-script capability.

Reference contract: the original CSM is 8B backbone + 300M-class decoder
(/root/reference/docs/reference/sesame_csm/components.md:8-10).
Cheap tests only — measured 8B numbers live in scripts/bench_8b.py /
BENCHMARKS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import (
    csm_8b_args,
    csm_param_count,
    tiny_test_args,
)
from csm_tpu.models.csm import fuse_csm_params, init_csm_params
from csm_tpu.utils.quantize import (
    dequantize_weight,
    dequantize_weight_int4,
    init_csm_params_quantized,
    is_quantized,
    is_quantized_int4,
)


def test_param_count_exact():
    """csm_param_count (the streaming-load routing signal) matches the
    actual init tree leaf-for-leaf."""
    args = tiny_test_args()
    tree = init_csm_params(jax.random.key(0), args)
    actual = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
    assert csm_param_count(args) == actual
    # the 8B flavor routes to the streaming loader (> 8 GiB bf16)
    assert 2 * csm_param_count(csm_8b_args()) > (8 << 30)
    assert csm_param_count(csm_8b_args()) > 8e9


def test_load_csm_8b_requires_quantize():
    from csm_tpu.generator import load_csm

    with pytest.raises(ValueError, match="int8"):
        load_csm(args=csm_8b_args(), quantize="none")
    with pytest.raises(ValueError, match="int8"):
        load_csm(args=csm_8b_args(), quantize="int8-decoder")


def test_load_csm_8b_rejects_merge_and_orbax():
    from csm_tpu.generator import load_csm

    with pytest.raises(ValueError, match="adapter"):
        load_csm(args=csm_8b_args(), quantize="int8", lora_path="/nope")
    with pytest.raises(ValueError, match="safetensors"):
        load_csm("/some/orbax/dir", args=csm_8b_args(), quantize="int8")


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_init_csm_params_quantized_matches_layout(mode):
    """The leaf-streamed quantized init produces the init_csm_params tree
    with projections in quantized form (dequantizing to the float
    shapes)."""
    args = tiny_test_args()
    ref = init_csm_params(jax.random.key(0), args)
    q = init_csm_params_quantized(jax.random.key(0), args, mode)
    assert set(q) == set(ref)
    for comp in ("backbone", "decoder"):
        assert set(q[comp]) == set(ref[comp])
        for name in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
            leaf = q[comp][name]
            if mode == "int8":
                assert is_quantized(leaf)
                deq = dequantize_weight(leaf)
            else:
                assert is_quantized_int4(leaf)
                deq = dequantize_weight_int4(leaf)
            assert deq.shape == ref[comp][name].shape
        for name in ("sa_norm", "mlp_norm", "norm"):
            assert q[comp][name].shape == ref[comp][name].shape
    for name in ("text_embeddings", "audio_embeddings", "projection",
                 "codebook0_head", "audio_head"):
        assert q[name].shape == ref[name].shape
        assert q[name].dtype == jnp.bfloat16


def test_fuse_owned_matches_fuse_csm_params():
    """The streaming loader's incremental fuse == the standard fuse."""
    from csm_tpu.generator import _fuse_owned

    args = tiny_test_args()
    q = init_csm_params_quantized(jax.random.key(0), args, "int8")
    expect = fuse_csm_params(q)
    got = _fuse_owned({k: dict(v) if isinstance(v, dict) else v
                       for k, v in q.items()})
    for comp in ("backbone", "decoder"):
        assert set(got[comp]) == set(expect[comp])
        for name, leaf in expect[comp].items():
            if isinstance(leaf, dict):
                for f in leaf:
                    np.testing.assert_array_equal(
                        np.asarray(got[comp][name][f], np.float32),
                        np.asarray(leaf[f], np.float32),
                    )
            else:
                np.testing.assert_array_equal(
                    np.asarray(got[comp][name], np.float32),
                    np.asarray(leaf, np.float32),
                )


def test_generate_cli_8b_requires_quantize():
    from csm_tpu.cli import generate as cli_generate

    with pytest.raises(ValueError, match="int8"):
        cli_generate.main([
            "--flavor", "8b", "--text", "x", "--output", "/tmp/never.wav",
            "--no-watermark",
        ])


def test_finetune_cli_8b_requires_quantized_base(tmp_path):
    from csm_tpu.cli import finetune_lora as cli_lora

    with pytest.raises(SystemExit, match="int8-base"):
        cli_lora.main([
            "--audio-dir", str(tmp_path), "--flavor", "8b",
            "--output-dir", str(tmp_path / "out"),
        ])


def test_quantized_tiny_generate_runs():
    """A quantized streamed-init tree drives the full generate path (the
    8B product path at tiny shapes — same code, unit-test cost)."""
    from csm_tpu.generator import Generator, _fuse_owned

    args = tiny_test_args()
    q = _fuse_owned(init_csm_params_quantized(jax.random.key(0), args, "int8"))

    class _FakeMimi:
        def decode(self, codes):
            return np.zeros(codes.shape[1] * 1920, np.float32)

        def encode(self, audio):  # pragma: no cover
            raise NotImplementedError

    class _Tok:
        def encode(self, s):
            return [ord(c) % 100 for c in s]

    gen = Generator(q, args, mimi=_FakeMimi(), text_tokenizer=_Tok(),
                    compute_dtype=jnp.float32)
    out = gen.generate("hello", max_audio_length_ms=400, topk=4)
    assert out.dtype == np.float32


def test_streamed_bf16_oracle_matches_direct_forward():
    """scripts/bench_8b_quality.py's layer-streamed bf16 oracle: the
    regenerated per-layer weights + streaming forward must equal a
    direct backbone_forward over the assembled bf16 tree (tiny shape)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        from bench_8b_quality import oracle_c0_probs, regen_layer_bf16
    finally:
        sys.path.pop(0)
    from csm_tpu.models.csm import backbone_forward

    args = tiny_test_args()
    K = args.audio_num_codebooks
    pq = init_csm_params_quantized(jax.random.key(0), args, "int8")
    S = 12
    rng = np.random.default_rng(1)
    tokens = np.zeros((1, S, K + 1), np.int32)
    mask = np.zeros((1, S, K + 1), bool)
    tokens[0, :, -1] = rng.integers(1, args.text_vocab_size, S)
    mask[0, :, -1] = True
    tokens_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)

    streamed = oracle_c0_probs(args, pq, tokens_j, mask_j)

    # assemble the full bf16 tree from the SAME regenerated layers
    bb = args.backbone
    kb = jax.random.split(jax.random.key(0), 7)[0]
    layers = [regen_layer_bf16(bb, kb, l) for l in range(bb.num_layers)]
    tp = {
        name: jnp.stack([lp[name] for lp in layers])
        for name in layers[0]
    }
    tp["norm"] = pq["backbone"]["norm"]
    full = dict(pq)
    full["backbone"] = tp
    h = jax.jit(
        lambda p: backbone_forward(p, args, tokens_j, mask_j,
                                   compute_dtype=jnp.bfloat16)
    )(full)
    logits = (np.asarray(h[:, -1], np.float32)
              @ np.asarray(full["codebook0_head"], np.float32))
    direct = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))[0]
    np.testing.assert_allclose(streamed, direct, atol=2e-3)
