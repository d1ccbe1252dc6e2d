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


def markdown_report(analyses: Dict[str, Dict], title: str = "Token-distribution parity") -> str:
    """Render analyses (name -> analyze_sampler output) as a markdown
    report with a histogram table — the inspectable artifact behind the
    parity claim (reference emits matplotlib histograms + Counter dumps,
    src/csm/mlx/token_analyzer.py:16+; this is the no-display analogue)."""
    lines = [
        f"# {title}",
        "",
        "**How to read this report.** The operative parity metric is",
        "**distribution similarity (1 − total variation)**: the sampler",
        "passes when 1 − TV > **0.95** against the analytic top-k",
        "distribution — the same bar `tests/test_analysis.py:41` enforces",
        "and `scripts/validate_real_weights.py:268` gates the real-weight",
        "validation (and any int8/int4 quality promotion) on.  KL is a",
        "secondary sharpness check.  **Top-10 overlap is diagnostic only**:",
        "under near-uniform logits (the *flat* case below) dozens of tokens",
        "tie within sampling noise of 10th place, so top-10 *membership* is",
        "a coin flip even for a perfect sampler — a low overlap there is",
        "tie-noise, not parity failure.  Each case notes how many reference",
        "tokens lie within 2 standard errors of its 10th-ranked",
        "probability; when that crowd is much larger than 10, ignore the",
        "overlap number and read the 1 − TV line.",
        "",
    ]
    for name, a in analyses.items():
        lines += [
            f"## {name}",
            "",
            f"- samples: {a['n_samples']}",
            f"- distribution similarity (1 − TV): **{a['similarity']:.4f}**",
            f"- top-10 token overlap: **{a['top10_overlap']:.2f}**",
            f"- KL(empirical ‖ reference): {a['kl_empirical_vs_reference']:.5f}",
        ]
        refp = a.get("reference_probs")
        if refp is not None:
            # how contested is 10th place? count tokens whose reference
            # probability ties p_10 within 2 empirical standard errors
            p10 = float(np.sort(np.asarray(refp))[-10])
            se = (p10 * (1 - p10) / a["n_samples"]) ** 0.5
            crowd = int(np.sum(np.abs(np.asarray(refp) - p10) <= 2 * se))
            note = " — top-10 overlap is tie-noise here; read 1 − TV" \
                if crowd > 20 else ""
            lines.append(
                f"- tokens within 2·SE of 10th place: **{crowd}**{note}"
            )
        lines += [
            "",
            "| token | count | empirical p | reference p | |",
            "|---|---|---|---|---|",
        ]
        n = a["n_samples"]
        ref = a.get("reference_probs")
        for tok, cnt in a["top_counts"]:
            p_emp = cnt / n
            p_ref = float(ref[tok]) if ref is not None else float("nan")
            bar = "█" * max(1, round(p_emp * 40))
            lines.append(
                f"| {tok} | {cnt} | {p_emp:.4f} | {p_ref:.4f} | `{bar}` |"
            )
        lines.append("")
    return "\n".join(lines)


def main(argv=None) -> int:
    """``python -m csm_tpu.utils.token_analyzer`` — run the sampling-parity
    analysis on canned logit shapes (peaked / flat / heavy-tail) and write
    a markdown report (reference: README.md:217 ">95% distribution
    similarity" tooling)."""
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--output", type=str, default="token_parity_report.md")
    p.add_argument("--n-samples", type=int, default=8192)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--temperature", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    vocab = 2051  # audio codebook size
    cases = {
        "flat (uniform-ish logits)": rng.normal(0, 0.1, vocab),
        "peaked (one dominant token)": np.where(
            np.arange(vocab) == 777, 6.0, rng.normal(0, 1.0, vocab)
        ),
        "heavy-tail (N(0,2) logits)": rng.normal(0, 2.0, vocab),
    }
    analyses = {}
    for name, logits in cases.items():
        a = analyze_sampler(
            logits, topk=args.topk, temperature=args.temperature,
            n_samples=args.n_samples, seed=args.seed,
        )
        a["reference_probs"] = np.asarray(
            topk_probs(jnp.asarray(logits, jnp.float32), args.topk,
                       args.temperature), np.float64,
        )
        analyses[name] = a
        print(f"{name}: similarity {a['similarity']:.4f} "
              f"top10 {a['top10_overlap']:.2f}")
    report = markdown_report(
        analyses,
        title=f"Token-distribution parity (topk={args.topk}, "
              f"T={args.temperature}, n={args.n_samples})",
    )
    with open(args.output, "w") as f:
        f.write(report + "\n")
    print(f"wrote {args.output}")
    return 0


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


if __name__ == "__main__":
    raise SystemExit(main())
