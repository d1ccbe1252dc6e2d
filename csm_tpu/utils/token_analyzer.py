"""Token-distribution parity analyzer.

Capability equivalent of the reference's sampling-parity tooling
(src/csm/mlx/token_analyzer.py, backing the ">95% distribution
similarity" claim, README.md:217): captures sampled-token histograms
from a sampler, compares them against the exact analytic distribution or
a second sampler, and reports similarity metrics.

TPU-first: the empirical capture vmaps N draws in one program instead of
looping Python per sample.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from csm_tpu.ops.sampling import sample_topk, topk_probs


def capture_tokens(
    key: jax.Array,
    logits: jnp.ndarray,
    topk: int,
    temperature: float,
    n_samples: int = 4096,
) -> np.ndarray:
    """Draw ``n_samples`` tokens from one (vocab,) logit row in a single
    vmapped program → (n_samples,) int32."""
    keys = jax.random.split(key, n_samples)
    f = jax.jit(
        jax.vmap(lambda k: sample_topk(k, logits, topk, temperature)),
    )
    return np.asarray(f(keys))


def histogram(tokens: np.ndarray, vocab: int) -> np.ndarray:
    h = np.bincount(tokens, minlength=vocab).astype(np.float64)
    return h / h.sum()


def distribution_similarity(p: np.ndarray, q: np.ndarray) -> float:
    """1 - total-variation distance ∈ [0, 1] (the reference reports
    "distribution similarity")."""
    return float(1.0 - 0.5 * np.abs(p - q).sum())


def top_token_overlap(p: np.ndarray, q: np.ndarray, k: int = 10) -> float:
    """Fraction of top-k tokens shared between two distributions."""
    a = set(np.argsort(p)[-k:])
    b = set(np.argsort(q)[-k:])
    return len(a & b) / k


def analyze_sampler(
    logits: np.ndarray,
    topk: int = 50,
    temperature: float = 0.9,
    n_samples: int = 4096,
    seed: int = 0,
    reference_probs: Optional[np.ndarray] = None,
) -> Dict:
    """Empirical-vs-analytic (or vs external reference) sampling parity.

    Returns {similarity, top10_overlap, kl, counts} — the TPU analogue of
    the reference's histogram/Counter comparison.
    """
    logits_j = jnp.asarray(logits, jnp.float32)
    vocab = logits_j.shape[-1]
    tokens = capture_tokens(jax.random.key(seed), logits_j, topk, temperature, n_samples)
    emp = histogram(tokens, vocab)
    ref = (
        np.asarray(reference_probs, np.float64)
        if reference_probs is not None
        else np.asarray(topk_probs(logits_j, topk, temperature), np.float64)
    )
    ref = ref / ref.sum()
    nz = ref > 0
    kl = float(np.sum(emp[nz & (emp > 0)] * np.log(emp[nz & (emp > 0)] / ref[nz & (emp > 0)])))
    return {
        "similarity": distribution_similarity(emp, ref),
        "top10_overlap": top_token_overlap(emp, ref),
        "kl_empirical_vs_reference": kl,
        "n_samples": n_samples,
        "top_counts": Counter(tokens.tolist()).most_common(10),
    }


def compare_samplers(
    sample_a: Callable[[jax.Array], np.ndarray],
    sample_b: Callable[[jax.Array], np.ndarray],
    vocab: int,
    n_samples: int = 4096,
    seed: int = 0,
) -> Dict:
    """Compare two arbitrary samplers (e.g. JAX vs the torch oracle) by
    empirical histograms (reference: token_analyzer.capture_tokens)."""
    ka, kb = jax.random.split(jax.random.key(seed))
    ta = np.asarray([sample_a(jax.random.fold_in(ka, i)) for i in range(n_samples)])
    tb = np.asarray([sample_b(jax.random.fold_in(kb, i)) for i in range(n_samples)])
    ha, hb = histogram(ta.ravel(), vocab), histogram(tb.ravel(), vocab)
    return {
        "similarity": distribution_similarity(ha, hb),
        "top10_overlap": top_token_overlap(ha, hb),
    }
