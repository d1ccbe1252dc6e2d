"""Centered STFT / iSTFT in JAX (hann window).

Behavioral equivalent of the reference's torch-based STFT module
(src/csm/watermarking/silentcipher/stft.py): input is right-padded to a
window multiple, transformed with a centered (reflect-padded) hann STFT;
magnitude is zero-safe (sqrt(x^2+eps)-sqrt(eps) at exact zeros); the
inverse recombines magnitude+phase and normalizes by the squared-window
overlap-add (torch.istft semantics), then trims the pad.

TPU-first: frames are gathered with a strided reshape and the DFT is ONE
matmul against a precomputed (win, 2F) real/imag basis — the MXU does the
transform; no FFT-op dependence, fully jittable and differentiable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _basis(n_fft: int):
    """Real-DFT analysis basis (n_fft, F), F = n_fft//2 + 1 (host numpy)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _hann(win: int):
    # periodic hann, matching torch.hann_window
    n = np.arange(win)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win)).astype(np.float32)


def _frame(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, T) → (B, n_frames, n_fft) overlapping frames."""
    B, T = x.shape
    n_frames = 1 + (T - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[:, idx]


def stft(x: jnp.ndarray, n_fft: int = 1024, hop: int = 512):
    """(B, T) → (magnitude, phase), each (B, F, n_frames).

    Matches the reference: right-pad to a window multiple, centered
    reflect padding, hann window, zero-safe magnitude.
    """
    B, T = x.shape
    pad_tail = n_fft - (T % n_fft)
    x = jnp.pad(x, ((0, 0), (0, pad_tail)))
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")

    frames = _frame(x, n_fft, hop) * jnp.asarray(_hann(n_fft))
    cos_b, sin_b = _basis(n_fft)
    real = frames @ jnp.asarray(cos_b)  # (B, n_frames, F)
    imag = frames @ jnp.asarray(sin_b)

    sq = real * real + imag * imag
    eps = jnp.where(sq == 0, 1e-24, 0.0)
    mag = jnp.sqrt(sq + eps) - jnp.sqrt(eps)
    phase = jnp.arctan2(imag, real)
    return mag.transpose(0, 2, 1), phase.transpose(0, 2, 1)


def istft(
    mag: jnp.ndarray, phase: jnp.ndarray, num_samples: int,
    n_fft: int = 1024, hop: int = 512,
):
    """(B, F, n_frames) magnitude+phase → (B, num_samples) waveform.

    Overlap-add with squared-window normalization (torch.istft), then the
    reference's pad-trim: drop the right padding added by ``stft`` and
    return exactly ``num_samples`` samples.
    """
    B, F, N = mag.shape
    real = (mag * jnp.cos(phase)).transpose(0, 2, 1)  # (B, N, F)
    imag = (mag * jnp.sin(phase)).transpose(0, 2, 1)

    cos_b, sin_b = _basis(n_fft)
    # inverse real DFT: x_n = (1/n_fft) * sum_k w_k (re_k cos - im_k sin)
    w = np.ones(n_fft // 2 + 1, np.float32) * 2.0
    w[0] = 1.0
    w[-1] = 1.0 if n_fft % 2 == 0 else 2.0
    # x_n = (1/N) Σ_k w_k (Re_k cos θ - Im_k sin θ); sin_b already holds
    # -sin, so the Im term enters with a plus.
    frames = (
        (real * w) @ jnp.asarray(cos_b.T) + (imag * w) @ jnp.asarray(sin_b.T)
    ) / n_fft  # (B, N, n_fft)

    win = jnp.asarray(_hann(n_fft))
    frames = frames * win

    T_pad = n_fft + (N - 1) * hop
    idx = jnp.arange(N)[:, None] * hop + jnp.arange(n_fft)[None, :]
    out = jnp.zeros((B, T_pad), mag.dtype).at[:, idx].add(frames)
    wsum = jnp.zeros((T_pad,), mag.dtype).at[idx].add(win * win)
    out = out / jnp.maximum(wsum, 1e-11)

    out = out[:, n_fft // 2 :]  # remove centering pad
    return out[:, :num_samples]
