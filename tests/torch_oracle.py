"""Minimal PyTorch oracle of the reference CSM semantics, for parity tests.

This is a from-semantics reimplementation of what torchtune's ``llama3_2``
factory + the reference ``Model`` (src/csm/models/model.py) compute:
RMSNorm(eps 1e-5) → GQA attention with Llama-3.1 frequency-scaled RoPE in the
*interleaved* pair convention → SwiGLU MLP, and the dual-transformer frame
step with codebook-offset audio embeddings.  Everything runs in float32 on
CPU; it exists only as the ground-truth for tests (the analogue of the
reference using its PyTorch path as the oracle for MLX parity,
src/csm/mlx/token_analyzer.py).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def scaled_theta(head_dim, base=500_000.0, scale_factor=32.0, low=1.0, high=4.0,
                 old_ctx=8192):
    theta = 1.0 / (base ** (torch.arange(0, head_dim, 2, dtype=torch.float64) / head_dim))
    wavelen = 2 * math.pi / theta
    low_wl, high_wl = old_ctx / low, old_ctx / high
    smooth = (old_ctx / wavelen - low) / (high - low)
    return torch.where(
        wavelen < high_wl,
        theta,
        torch.where(
            wavelen > low_wl,
            theta / scale_factor,
            (1 - smooth) * theta / scale_factor + smooth * theta,
        ),
    )


def rope_interleaved(x: torch.Tensor, pos: torch.Tensor, theta: torch.Tensor):
    """x: (B, S, H, D); pos: (B, S) or (S,). Interleaved pairs (2j, 2j+1)."""
    if pos.dim() == 1:
        pos = pos.unsqueeze(0)
    angles = pos.to(torch.float64)[..., None] * theta  # (B, S, D/2)
    cos = angles.cos().to(torch.float32)[:, :, None, :]
    sin = angles.sin().to(torch.float32)[:, :, None, :]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out = torch.empty_like(x)
    out[..., 0::2] = x1 * cos - x2 * sin
    out[..., 1::2] = x2 * cos + x1 * sin
    return out


def rms_norm(x, scale, eps=1e-5):
    var = x.pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * scale


class OracleTransformer:
    """State-dict-driven transformer. Weights use torchtune naming."""

    def __init__(self, state, prefix, num_layers, num_heads, num_kv_heads,
                 embed_dim, norm_eps=1e-5):
        self.state = state
        self.prefix = prefix
        self.L = num_layers
        self.H = num_heads
        self.Hkv = num_kv_heads
        self.E = embed_dim
        self.D = embed_dim // num_heads
        self.eps = norm_eps
        self.theta = scaled_theta(self.D)

    def w(self, i, name):
        return self.state[f"{self.prefix}.layers.{i}.{name}"]

    def __call__(self, h, positions, mask, collect=None):
        """h: (B,S,E); positions: (B,S); mask: (B,S,S) bool (True=attend).

        ``collect`` — optional list; the (un-normed) hidden state after each
        layer is appended (layerwise activation-parity validation,
        scripts/validate_real_weights.py)."""
        B, S, E = h.shape
        for i in range(self.L):
            x = rms_norm(h, self.w(i, "sa_norm.scale"), self.eps)
            q = (x @ self.w(i, "attn.q_proj.weight").T).view(B, S, self.H, self.D)
            k = (x @ self.w(i, "attn.k_proj.weight").T).view(B, S, self.Hkv, self.D)
            v = (x @ self.w(i, "attn.v_proj.weight").T).view(B, S, self.Hkv, self.D)
            q = rope_interleaved(q, positions, self.theta)
            k = rope_interleaved(k, positions, self.theta)
            # GQA: expand kv heads
            rep = self.H // self.Hkv
            k = k.repeat_interleave(rep, dim=2)
            v = v.repeat_interleave(rep, dim=2)
            scores = torch.einsum("bshd,bthd->bhst", q, k) / math.sqrt(self.D)
            scores = scores.masked_fill(~mask[:, None, :, :], float("-inf"))
            probs = F.softmax(scores, dim=-1)
            attn = torch.einsum("bhst,bthd->bshd", probs, v).reshape(B, S, E)
            h = h + attn @ self.w(i, "attn.output_proj.weight").T
            x = rms_norm(h, self.w(i, "mlp_norm.scale"), self.eps)
            gate = F.silu(x @ self.w(i, "mlp.w1.weight").T)
            up = x @ self.w(i, "mlp.w3.weight").T
            h = h + (gate * up) @ self.w(i, "mlp.w2.weight").T
            if collect is not None:
                collect.append(h.clone())
        return rms_norm(h, self.state[f"{self.prefix}.norm.scale"], self.eps)


def make_random_state_dict(args, seed=0):
    """Random torchtune-named f32 state dict for a CSM of the given ModelArgs
    (analogue of the reference's tiny-model fixture,
    tests/create_test_model.py:42-301)."""
    g = torch.Generator().manual_seed(seed)
    bb, dec = args.backbone, args.decoder
    state = {}

    def rand(*shape, fan_in):
        return torch.randn(*shape, generator=g) / math.sqrt(fan_in)

    for prefix, cfg in (("backbone", bb), ("decoder", dec)):
        E, I = cfg.embed_dim, cfg.intermediate_dim
        qd = cfg.num_heads * cfg.head_dim
        kvd = cfg.num_kv_heads * cfg.head_dim
        for i in range(cfg.num_layers):
            p = f"{prefix}.layers.{i}"
            state[f"{p}.attn.q_proj.weight"] = rand(qd, E, fan_in=E)
            state[f"{p}.attn.k_proj.weight"] = rand(kvd, E, fan_in=E)
            state[f"{p}.attn.v_proj.weight"] = rand(kvd, E, fan_in=E)
            state[f"{p}.attn.output_proj.weight"] = rand(E, qd, fan_in=qd)
            state[f"{p}.mlp.w1.weight"] = rand(I, E, fan_in=E)
            state[f"{p}.mlp.w2.weight"] = rand(E, I, fan_in=I)
            state[f"{p}.mlp.w3.weight"] = rand(I, E, fan_in=E)
            state[f"{p}.sa_norm.scale"] = torch.ones(E) + 0.1 * torch.randn(E, generator=g)
            state[f"{p}.mlp_norm.scale"] = torch.ones(E) + 0.1 * torch.randn(E, generator=g)
        state[f"{prefix}.norm.scale"] = torch.ones(cfg.embed_dim) + 0.1 * torch.randn(
            cfg.embed_dim, generator=g
        )

    Eb, Ed = bb.embed_dim, dec.embed_dim
    state["text_embeddings.weight"] = rand(args.text_vocab_size, Eb, fan_in=Eb)
    state["audio_embeddings.weight"] = rand(
        args.audio_vocab_size * args.audio_num_codebooks, Eb, fan_in=Eb
    )
    state["projection.weight"] = rand(Ed, Eb, fan_in=Eb)
    state["codebook0_head.weight"] = rand(args.audio_vocab_size, Eb, fan_in=Eb)
    state["audio_head"] = rand(
        args.audio_num_codebooks - 1, Ed, args.audio_vocab_size, fan_in=Ed
    )
    return state


class OracleCSM:
    """Reference-semantics CSM with full-recompute (cacheless) forward and a
    deterministic (argmax / topk=1) frame step, mirroring
    src/csm/models/model.py:140-195."""

    def __init__(self, state, args):
        self.state = state
        self.args = args
        bb, dec = args.backbone, args.decoder
        self.backbone = OracleTransformer(
            state, "backbone", bb.num_layers, bb.num_heads, bb.num_kv_heads, bb.embed_dim
        )
        self.decoder = OracleTransformer(
            state, "decoder", dec.num_layers, dec.num_heads, dec.num_kv_heads,
            dec.embed_dim,
        )

    def embed_tokens(self, tokens):
        K = self.args.audio_num_codebooks
        text = (self.state["text_embeddings.weight"][tokens[:, :, -1]]).unsqueeze(-2)
        offsets = self.args.audio_vocab_size * torch.arange(K)
        audio = self.state["audio_embeddings.weight"][tokens[:, :, :K] + offsets]
        return torch.cat([audio, text], dim=-2)

    def backbone_h(self, tokens, tokens_mask):
        """Full-sequence backbone pass; returns (B, S, E)."""
        embeds = self.embed_tokens(tokens)
        h = (embeds * tokens_mask.unsqueeze(-1).float()).sum(2)
        B, S, _ = h.shape
        pos = torch.arange(S).unsqueeze(0).expand(B, S)
        mask = torch.tril(torch.ones(S, S, dtype=torch.bool)).unsqueeze(0).expand(B, S, S)
        return self.backbone(h, pos, mask)

    def generate_frame_argmax(self, tokens, tokens_mask):
        """Deterministic frame generation by full recompute (no KV caches —
        mathematically identical to the reference's cached incremental path)."""
        args = self.args
        K = args.audio_num_codebooks
        h = self.backbone_h(tokens, tokens_mask)
        last_h = h[:, -1, :]
        c0_logits = last_h @ self.state["codebook0_head.weight"].T
        c0 = c0_logits.argmax(-1)
        samples = [c0]

        c0_embed = self.state["audio_embeddings.weight"][c0 + 0]
        dec_inputs = [last_h, c0_embed]
        for i in range(1, K):
            x = torch.stack(dec_inputs, dim=1) @ self.state["projection.weight"].T
            B, S, _ = x.shape
            pos = torch.arange(S).unsqueeze(0).expand(B, S)
            mask = torch.tril(torch.ones(S, S, dtype=torch.bool)).unsqueeze(0).expand(B, S, S)
            dh = self.decoder(x, pos, mask)
            ci_logits = dh[:, -1, :] @ self.state["audio_head"][i - 1]
            ci = ci_logits.argmax(-1)
            samples.append(ci)
            dec_inputs.append(
                self.state["audio_embeddings.weight"][ci + i * args.audio_vocab_size]
            )
        return torch.stack(samples, dim=1)  # (B, K)
