"""Grouped int4 weight quantization + Pallas fused-dequant matmul.

Format: csm_tpu/utils/quantize.quantize_weight_int4 (offset-binary
nibbles, split-half-per-group packing, per-(group, out-channel) scales).
Kernel: csm_tpu/ops/int4_matmul (XLA cannot fuse the nibble unpack —
measured in scripts/bench_int4_probe.py — so decode shapes need Pallas).

The kernel and the XLA reference implement the SAME math two ways, so
they must agree to float noise; the int4 end-to-end path must produce
the same tokens as running the dequantized weights densely.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import fuse_csm_params, init_csm_params
from csm_tpu.models.generation import generate_audio_tokens
from csm_tpu.ops.int4_matmul import _xla_reference, int4_matmul
from csm_tpu.utils.quantize import (
    dequantize_weight_int4,
    is_quantized_int4,
    quantize_csm_params_int4,
    quantize_transformer_int4,
    quantize_weight_int4,
)

on_tpu = jax.default_backend() not in ("cpu",)

gen_jit = jax.jit(
    generate_audio_tokens,
    static_argnames=("args", "max_frames", "topk", "compute_dtype"),
)


def test_pack_roundtrip_exact():
    """dequantize(quantize(w)) reproduces every representable value
    exactly: w already on the int4 grid must roundtrip bit-perfectly."""
    rng = np.random.default_rng(0)
    scale = 0.013
    q = rng.integers(-7, 8, (256, 128)).astype(np.float32)
    # pin every (group, column) to the same grid: scales are per
    # (group, out-channel), so each column of each 64-row group needs a
    # +-7 for the stored grid to equal the generating grid
    q[0::64] = 7.0
    q[1::64] = -7.0
    w = q * scale
    qd = quantize_weight_int4(jnp.asarray(w), group_size=64)
    assert qd["w4p"].shape == (128, 128) and qd["scale4"].shape == (4, 128)
    back = np.asarray(dequantize_weight_int4(qd))
    np.testing.assert_allclose(back, w, atol=7 * scale * 4e-3)  # bf16 scales


def test_quantize_error_bounded():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((512, 256)).astype(np.float32) * 0.02
    qd = quantize_weight_int4(jnp.asarray(w))
    back = np.asarray(dequantize_weight_int4(qd))
    # max error <= scale/2 per group; scale = groupmax/7
    grp = w.reshape(4, 128, 256)
    # half a step plus the bf16 scale-storage error (|q| <= 7, rel 2^-8)
    bound = np.abs(grp).max(axis=1, keepdims=True) / 7.0 * 0.53
    assert (np.abs(back.reshape(4, 128, 256) - grp) <= bound + 1e-6).all()


@pytest.mark.skipif(not on_tpu, reason="Pallas kernel needs a TPU backend")
@pytest.mark.parametrize(
    "M,K,N,gs",
    [(1, 2048, 3072, 128), (8, 1024, 256, 128), (4, 8192, 2048, 128),
     (64, 2048, 512, 64), (1, 1024, 16384, 128)],
)
def test_kernel_matches_xla_reference(M, K, N, gs):
    rng = np.random.default_rng(M + K + N)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.5, jnp.bfloat16)
    q = jax.jit(lambda w: quantize_weight_int4(w, gs))(w)
    y_k = np.asarray(jax.jit(int4_matmul)(x, q), np.float32)
    y_r = np.asarray(jax.jit(_xla_reference)(x, q), np.float32)
    denom = np.abs(y_r).max() + 1e-9
    assert np.abs(y_k - y_r).max() / denom < 2e-2


def test_quantize_fuse_commutes():
    """fuse(quantize_int4(p)) == quantize_int4(fuse(p)) bit-exactly: the
    out-axis concat doesn't cross groups or scale boundaries."""
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    a = fuse_csm_params(quantize_csm_params_int4(params, group_size=32))
    b = quantize_csm_params_int4(fuse_csm_params(params), group_size=32)
    for comp in ("backbone", "decoder"):
        for name in ("wqkv", "w13", "wo", "w2"):
            qa, qb = a[comp][name], b[comp][name]
            assert is_quantized_int4(qa) and is_quantized_int4(qb)
            np.testing.assert_array_equal(np.asarray(qa["w4p"]),
                                          np.asarray(qb["w4p"]))
            np.testing.assert_array_equal(
                np.asarray(qa["scale4"], np.float32),
                np.asarray(qb["scale4"], np.float32))


def _prompt(args, B=2, T=6, S_pad=8, seed=3):
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((B, S_pad, K + 1), dtype=np.int32)
    mask = np.zeros((B, S_pad, K + 1), dtype=bool)
    tokens[:, :T, -1] = rng.integers(1, args.text_vocab_size, (B, T))
    mask[:, :T, -1] = True
    return jnp.asarray(tokens), jnp.asarray(mask), jnp.full((B,), T, jnp.int32)


def test_generate_int4_matches_dequantized_dense():
    """The full generation loop with int4 params must produce exactly the
    tokens of the SAME (lossy) weights run densely — the int4 path is a
    storage format, not a different model."""
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    qparams = quantize_csm_params_int4(params, group_size=32)

    def dense(p):
        out = dict(p)
        for comp in ("backbone", "decoder"):
            cp = dict(p[comp])
            for k, v in cp.items():
                if is_quantized_int4(v):
                    cp[k] = dequantize_weight_int4(v, jnp.float32)
            out[comp] = cp
        return out

    toks, mask, lens = _prompt(args)
    kw = dict(max_frames=4, temperature=0.0, topk=1,
              compute_dtype=jnp.float32)
    r_q = gen_jit(qparams, args, jax.random.key(2), toks, mask, lens, **kw)
    r_d = gen_jit(dense(qparams), args, jax.random.key(2), toks, mask, lens,
                  **kw)
    np.testing.assert_array_equal(np.asarray(r_q.frames),
                                  np.asarray(r_d.frames))


def test_serving_int4(tmp_path):
    from csm_tpu.serving import BatchedServer, StreamRequest

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    kw = dict(max_seq_len=96, temperature=1.0, topk=1,
              compute_dtype=jnp.float32, chunk_size=2)
    srv = BatchedServer(params, args, n_slots=1, weight_dtype="int4", **kw)
    assert is_quantized_int4(srv.params["backbone"]["wqkv"])

    rng = np.random.default_rng(5)
    K = args.audio_num_codebooks
    T = 6
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
    mask[:, -1] = True
    res, _ = srv.run([StreamRequest(tokens, mask, max_frames=3,
                                    request_id=0)])
    assert res[0].frames.shape[1] == K


def test_serving_int4_rejects_mesh():
    from csm_tpu.serving import BatchedServer

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model")
    )
    with pytest.raises(ValueError, match="single-device"):
        BatchedServer(params, args, n_slots=1, weight_dtype="int4",
                      mesh=mesh, max_seq_len=96, compute_dtype=jnp.float32)


# ---- int4-base LoRA (QLoRA-style, quant_base="int4") ----


def test_int4_base_loss_matches_dequantized():
    """The int4-base loss must match the loss on the DEQUANTIZED copy of
    the same base (quantization error is real; the dequantized tree
    isolates the compute path, incl. the custom-VJP matmul)."""
    from csm_tpu.training.lora import LoRAConfig, init_lora_params
    from csm_tpu.training.losses import compute_loss
    from test_training import make_batch

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    q = quantize_csm_params_int4(params, group_size=32)
    deq = jax.tree.map(
        lambda w: dequantize_weight_int4(w, jnp.float32)
        if is_quantized_int4(w) else w,
        q, is_leaf=is_quantized_int4,
    )
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(1), args, lcfg)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    batch = make_batch(args, B=2, T=8, seed=0)
    kw = dict(lora=lora, lora_scale=lcfg.scaling, compute_dtype=jnp.float32)
    l_q, _ = compute_loss(q, args, jax.random.key(2), batch, **kw)
    l_d, _ = compute_loss(deq, args, jax.random.key(2), batch, **kw)
    np.testing.assert_allclose(float(l_q), float(l_d), rtol=2e-5)


def test_int4_base_training_reduces_loss():
    from csm_tpu.training.lora import LoRAConfig, init_lora_params
    from csm_tpu.training.optimizer import TrainState, make_lora_optimizer
    from csm_tpu.training.train_step import make_lora_train_step
    from test_training import make_batch

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    base = quantize_csm_params_int4(params, group_size=32)
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(1), args, lcfg)
    tx = make_lora_optimizer(learning_rate=5e-3)
    step = make_lora_train_step(args, tx, lcfg.scaling,
                                compute_dtype=jnp.float32)
    state = TrainState(lora, tx.init(lora), jnp.zeros((), jnp.int32))
    batch = make_batch(args, B=2, T=8, seed=0)
    w4_before = np.asarray(base["backbone"]["wq"]["w4p"]).copy()

    losses = []
    for i in range(6):
        state, m = step(state, base, jax.random.key(10 + i), batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert float(jnp.abs(state.params["backbone"]["wq"]["b"]).max()) > 0
    np.testing.assert_array_equal(
        np.asarray(base["backbone"]["wq"]["w4p"]), w4_before)


def test_int4_base_merge():
    """merge_lora on an int4 base dequantizes targeted projections and
    adds the adapter delta."""
    from csm_tpu.training.lora import (LoRAConfig, init_lora_params,
                                       merge_lora)

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    base = quantize_csm_params_int4(params, group_size=32)
    lcfg = LoRAConfig(r=4)
    lora = init_lora_params(jax.random.key(1), args, lcfg)
    lora = jax.tree.map(lambda x: x + 0.02, lora)
    merged = merge_lora(base, lora, lcfg)
    wq = merged["backbone"]["wq"]
    assert not is_quantized_int4(wq)
    ref = dequantize_weight_int4(base["backbone"]["wq"], jnp.bfloat16)
    delta = jnp.einsum(
        "lir,lro->lio", lora["backbone"]["wq"]["a"],
        lora["backbone"]["wq"]["b"]) * lcfg.scaling
    np.testing.assert_allclose(
        np.asarray(wq, np.float32),
        np.asarray(ref + delta.astype(ref.dtype), np.float32), rtol=1e-2)


def test_trainer_quant_base_int4(tmp_path):
    from csm_tpu.training.trainer import CSMLoRATrainer

    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    tr = CSMLoRATrainer(
        output_dir=str(tmp_path), args=args, params=params,
        quant_base="int4", compute_dtype=jnp.float32, remat=False,
    )
    assert is_quantized_int4(tr.params["backbone"]["wq"])
    with pytest.raises(ValueError, match="not both"):
        CSMLoRATrainer(output_dir=str(tmp_path), args=args, params=params,
                       int8_base=True, quant_base="int4",
                       compute_dtype=jnp.float32, remat=False)
