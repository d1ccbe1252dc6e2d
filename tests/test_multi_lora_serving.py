"""Multi-LoRA serving: per-slot adapters in one continuous-batching server.

The reference can serve only one fine-tune per process (a merged
checkpoint); csm-finetune-lora-multi produces one adapter PER SPEAKER.
BatchedServer(adapters={...}) loads them into one fused-layout bank
(training/lora.fuse_lora_bank) and every slot decodes with its own
adapter inside the same batched program (id 0 = base model).

Key invariant (mirrors tests/test_serving.py): a stream served in a
MIXED-adapter batch produces exactly the frames it produces served
alone with that adapter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csm_tpu.models.config import tiny_test_args
from csm_tpu.models.csm import init_csm_params
from csm_tpu.serving import BatchedServer, StreamRequest
from csm_tpu.training.lora import (
    LoRAConfig,
    fuse_lora_bank,
    init_lora_params,
    merge_lora,
)


@pytest.fixture(scope="module")
def setup():
    args = tiny_test_args()
    params = init_csm_params(jax.random.key(0), args, jnp.float32)
    cfg1 = LoRAConfig(r=4)
    cfg2 = LoRAConfig(r=2, alpha=8.0,
                      target_modules=("q_proj", "k_proj", "v_proj"))
    l1 = jax.tree.map(lambda x: x + 0.02,
                      init_lora_params(jax.random.key(1), args, cfg1))
    l2 = jax.tree.map(lambda x: x + 0.03,
                      init_lora_params(jax.random.key(2), args, cfg2))
    return args, params, [("alice", l1, cfg1), ("bob", l2, cfg2)]


def make_request(args, T, rid, seed, adapter=None, max_frames=4):
    rng = np.random.default_rng(seed)
    K = args.audio_num_codebooks
    tokens = np.zeros((T, K + 1), np.int32)
    mask = np.zeros((T, K + 1), bool)
    tokens[:, -1] = rng.integers(1, args.text_vocab_size, T)
    mask[:, -1] = True
    return StreamRequest(tokens, mask, max_frames=max_frames, request_id=rid,
                         adapter=adapter)


def adapters_arg(named):
    return {name: (lora, cfg, None) for name, lora, cfg in named}


KW = dict(max_seq_len=96, temperature=1.0, topk=1,
          compute_dtype=jnp.float32, chunk_size=2)


def test_bank_matches_merged_dense(setup):
    """The bank's low-rank fused form must equal the densely merged
    weights: same frames from a bank server and a merged-params server."""
    args, params, named = setup
    name, lora, cfg = named[0]
    bank_srv = BatchedServer(params, args, n_slots=1,
                             adapters=adapters_arg(named[:1]), **KW)
    r_bank, _ = bank_srv.run([make_request(args, 6, 0, seed=1,
                                           adapter=name)])

    merged = merge_lora(params, lora, cfg)
    dense_srv = BatchedServer(merged, args, n_slots=1, **KW)
    r_dense, _ = dense_srv.run([make_request(args, 6, 0, seed=1)])
    np.testing.assert_array_equal(r_bank[0].frames, r_dense[0].frames)


def test_mixed_batch_matches_solo(setup):
    """Streams with different adapters in ONE server must each match the
    frames they produce served alone with that adapter."""
    args, params, named = setup
    ads = adapters_arg(named)
    reqs = [
        make_request(args, 6, rid=0, seed=1, adapter=None),
        make_request(args, 7, rid=1, seed=2, adapter="alice"),
        make_request(args, 5, rid=2, seed=3, adapter="bob"),
    ]
    mixed = BatchedServer(params, args, n_slots=4, adapters=ads, **KW)
    r_mixed, _ = mixed.run(reqs)
    by_id = {r.request_id: r for r in r_mixed}

    for req in reqs:
        solo_srv = BatchedServer(params, args, n_slots=1, adapters=ads, **KW)
        solo, _ = solo_srv.run([StreamRequest(
            req.tokens, req.mask, max_frames=req.max_frames,
            request_id=req.request_id, adapter=req.adapter)])
        np.testing.assert_array_equal(
            by_id[req.request_id].frames, solo[0].frames,
            err_msg=f"adapter {req.adapter}")

    # adapters actually change the output (non-vacuous test): the SAME
    # prompt under base vs adapter must produce different frames
    base_srv = BatchedServer(params, args, n_slots=1, adapters=ads, **KW)
    r_base, _ = base_srv.run([make_request(args, 7, rid=9, seed=2,
                                           adapter=None)])
    assert not np.array_equal(r_base[0].frames, by_id[1].frames)


def test_unknown_adapter_rejected(setup):
    args, params, named = setup
    srv = BatchedServer(params, args, n_slots=1,
                        adapters=adapters_arg(named), **KW)
    with pytest.raises(ValueError, match="unknown adapter"):
        srv.submit(make_request(args, 6, 0, seed=1, adapter="nobody"))


@pytest.mark.slow  # many distinct bank shapes -> several first compiles
def test_hot_add_remove_adapter(setup):
    """add_adapter on a RUNNING server: the new fine-tune serves exactly
    like one loaded at construction; remove_adapter frees the id (and
    refuses while a stream uses it); in-flight base streams are
    unperturbed."""
    args, params, named = setup
    ads = adapters_arg(named)

    # oracle: both adapters loaded at construction
    want = {}
    for name in ("alice", "bob", None):
        srv = BatchedServer(params, args, n_slots=1, adapters=ads, **KW)
        r, _ = srv.run([make_request(args, 6, 0, seed=1, adapter=name)])
        want[name] = r[0].frames

    # start with alice only; hot-add bob mid-flight
    srv = BatchedServer(params, args, n_slots=2,
                        adapters=adapters_arg(named[:1]), **KW)
    with pytest.raises(ValueError, match="unknown adapter"):
        srv.submit(make_request(args, 6, 0, seed=1, adapter="bob"))
    long_base = make_request(args, 6, rid=0, seed=1, adapter=None,
                             max_frames=8)
    srv.submit(long_base)
    srv.step()  # base stream in flight
    nm, lora, cfg = named[1]
    assert srv.add_adapter(nm, (lora, cfg, None)) == 2
    with pytest.raises(ValueError, match="already loaded"):
        srv.add_adapter(nm, (lora, cfg, None))
    srv.submit(make_request(args, 6, rid=1, seed=1, adapter="bob"))
    res, _ = srv.run([])
    by_id = {r.request_id: r for r in res}
    np.testing.assert_array_equal(by_id[1].frames, want["bob"])
    n = want[None].shape[0]
    np.testing.assert_array_equal(by_id[0].frames[:n], want[None])

    # removal: refused while in use, allowed after; id gets reused
    srv.submit(make_request(args, 6, rid=2, seed=2, adapter="bob",
                            max_frames=8))
    with pytest.raises(ValueError, match="in use"):
        srv.remove_adapter("bob")
    srv.cancel(2)
    srv.remove_adapter("bob")
    with pytest.raises(ValueError, match="unknown adapter"):
        srv.remove_adapter("bob")
    assert srv.add_adapter("carol", (lora, cfg, None)) == 2  # id reused
    r, _ = srv.run([make_request(args, 6, 0, seed=1, adapter="carol")])
    np.testing.assert_array_equal(r[0].frames, want["bob"])
    # alice survived the churn
    r, _ = srv.run([make_request(args, 6, 0, seed=1, adapter="alice")])
    np.testing.assert_array_equal(r[0].frames, want["alice"])


def test_separate_layout_bank_matches_fused(setup):
    """The separate-projection bank (mesh layout) encodes the same math
    as the fused bank: a server forced onto separate params with a
    separate-layout bank matches the fused-layout server exactly.
    (Mesh parity itself: tests/test_multichip.py
    test_sharded_multi_lora_matches_single_device.)"""
    import os

    args, params, named = setup
    name = named[0][0]
    fused_srv = BatchedServer(params, args, n_slots=1,
                              adapters=adapters_arg(named), **KW)
    r_fused, _ = fused_srv.run([make_request(args, 6, 0, seed=1,
                                             adapter=name)])
    os.environ["CSM_TPU_NO_FUSE"] = "1"
    try:
        sep_srv = BatchedServer(params, args, n_slots=1,
                                adapters=adapters_arg(named), **KW)
        assert "wq" in sep_srv._bank["backbone"] or \
               "wqkv" not in (sep_srv._bank["backbone"] or {})
        r_sep, _ = sep_srv.run([make_request(args, 6, 0, seed=1,
                                             adapter=name)])
    finally:
        del os.environ["CSM_TPU_NO_FUSE"]
    np.testing.assert_array_equal(r_fused[0].frames, r_sep[0].frames)
