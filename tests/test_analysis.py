"""Token-parity analyzer + observability tests.

The analyzer is the TPU analogue of the reference's sampling-parity
tooling (src/csm/mlx/token_analyzer.py); the key check: our sampler's
empirical distribution matches the analytic top-k/temperature
distribution AND the torch oracle's sampler beyond the reference's own
">95% similarity" bar (README.md:217)."""

import json

import jax
import numpy as np
import pytest
import torch

from csm_tpu.ops.sampling import sample_topk
from csm_tpu.utils.observability import MetricsLogger, measure_time
from csm_tpu.utils.token_analyzer import (
    analyze_sampler,
    capture_tokens,
    distribution_similarity,
    histogram,
)


def torch_sample_topk(logits: torch.Tensor, topk: int, temperature: float, gen):
    """The reference sampler (src/csm/models/model.py:79-96) for parity."""
    x = logits / temperature
    kth = torch.topk(x, topk)[0][..., -1, None]
    x = torch.where(x < kth, torch.tensor(float("-inf")), x)
    probs = torch.nn.functional.softmax(x, dim=-1)
    q = torch.empty_like(probs).exponential_(1, generator=gen)
    return torch.argmax(probs / q, dim=-1)


@pytest.mark.slow
def test_sampler_matches_analytic_distribution():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=64).astype(np.float32) * 2
    res = analyze_sampler(logits, topk=10, temperature=0.9, n_samples=8192)
    assert res["similarity"] > 0.95, res
    assert res["top10_overlap"] >= 0.8


def test_sampler_matches_torch_oracle():
    """JAX sampler vs the torch reference sampler: >95% empirical
    distribution similarity (the reference's own parity bar)."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=64).astype(np.float32) * 2
    topk, temp, n = 10, 0.9, 8192

    jax_tokens = capture_tokens(jax.random.key(0), logits, topk, temp, n)

    gen = torch.Generator().manual_seed(0)
    lt = torch.from_numpy(logits)[None].repeat(n, 1)
    torch_tokens = torch_sample_topk(lt, topk, temp, gen).numpy()

    sim = distribution_similarity(histogram(jax_tokens, 64), histogram(torch_tokens, 64))
    assert sim > 0.95, sim


def test_guard_tokens():
    """The MIMI-safety guard forbids ids 1..31
    (reference: src/csm/mlx/components/sampling.py:57-63)."""
    logits = np.zeros(64, np.float32)
    logits[1:32] = 10.0  # strongly favor guarded tokens
    keys = jax.random.split(jax.random.key(0), 256)
    toks = np.asarray(
        jax.vmap(
            lambda k: sample_topk(k, logits, 64, 1.0, guard_tokens=(1, 31))
        )(keys)
    )
    assert not np.any((toks >= 1) & (toks <= 31))


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p)
    m.log(1, loss=2.5, note="warmup")
    m.log(2, loss=1.25)
    m.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 2.5
    assert lines[1]["loss"] == 1.25


def test_measure_time_stats():
    stats = {}

    @measure_time(stats=stats, name="op")
    def f(x):
        return x + 1

    assert f(1) == 2 and f(2) == 3
    assert stats["op_calls"] == 2 and stats["op"] >= 0
