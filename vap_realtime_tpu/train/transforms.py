"""Waveform augmentations for noise-robust ("MC") training.

Reference contract (train/transforms.py:11-144 `Augmentation`): Gaussian
noise, frequency masking applied through a complex STFT, and pitch shift
(+-2 semitones).  The reference wires these via AudioAugmentationCallback
(train/callbacks.py) — commented out of the default callback list but
used to produce the published noise-robust `*_MC` checkpoints
(README.md:343-347).

JAX implementations; all pure functions of (waveform, rng).  Pitch shift
uses phase-vocoder time-stretch + resample (torchaudio's approach),
simplified to linear-interp resampling of the STFT-stretched signal.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AugmentConfig:
    noise_prob: float = 0.5
    noise_scale: float = 0.005
    freq_mask_prob: float = 0.5
    freq_mask_param: int = 80       # mel-agnostic bin count on 400-bin STFT
    pitch_shift_prob: float = 0.0   # expensive; off by default
    pitch_steps: int = 2            # +- semitones
    n_fft: int = 400
    hop: int = 160


def add_noise(wav: jax.Array, rng: jax.Array,
              scale: float = 0.005) -> jax.Array:
    """Gaussian additive noise (transforms.py Gaussian branch)."""
    return wav + scale * jax.random.normal(rng, wav.shape, wav.dtype)


def freq_mask(wav: jax.Array, rng: jax.Array, n_fft: int = 400,
              hop: int = 160, mask_param: int = 80) -> jax.Array:
    """Frequency masking through a complex STFT (transforms.py:94-123).

    wav: (..., L).  A contiguous band of frequency bins is zeroed and the
    signal re-synthesized by overlap-add ISTFT.
    """
    L = wav.shape[-1]
    window = jnp.hanning(n_fft).astype(wav.dtype)
    n_frames = 1 + (L - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = wav[..., idx] * window                      # (..., F, n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)                 # (..., F, bins)

    bins = spec.shape[-1]
    k1, k2 = jax.random.split(rng)
    width = jax.random.randint(k1, (), 0, mask_param + 1)
    start = jax.random.randint(k2, (), 0, jnp.maximum(bins - width, 1))
    bin_idx = jnp.arange(bins)
    keep = (bin_idx < start) | (bin_idx >= start + width)
    spec = spec * keep

    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    out = jnp.zeros_like(wav)
    norm = jnp.zeros(L, wav.dtype)
    # overlap-add (scatter-add over the same index grid)
    out = out.at[..., idx].add(frames)
    norm = norm.at[idx.reshape(-1)].add(
        jnp.tile(window ** 2, (n_frames,)))
    # where window coverage is negligible (signal edges) keep the input:
    # dividing masked-spectrum leakage by a vanishing norm explodes
    ola = out / jnp.maximum(norm, 1e-2)
    return jnp.where(norm >= 1e-1, ola, wav)


def pitch_shift(wav: jax.Array, steps: float, n_fft: int = 400,
                hop: int = 100) -> jax.Array:
    """Phase-vocoder pitch shift by `steps` semitones, duration preserved
    (the torchaudio PitchShift recipe the reference uses: STFT
    time-stretch by 1/rate, then resample by rate).

    NOTE: the reference disables determinism around pitch_shift
    (train/transforms.py:102-107); this version is deterministic.
    wav: (..., L).
    """
    rate = 2.0 ** (steps / 12.0)
    L = wav.shape[-1]
    window = jnp.hanning(n_fft).astype(wav.dtype)

    # analysis STFT
    F = 1 + (L - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(F)[:, None]
    spec = jnp.fft.rfft(wav[..., idx] * window, axis=-1)  # (..., F, K)
    mags = jnp.abs(spec)
    phis = jnp.angle(spec)
    K = spec.shape[-1]
    omega = 2 * jnp.pi * hop * jnp.arange(K) / n_fft      # per-hop advance

    # 1) phase-vocoder time-STRETCH by `rate` (pitch unchanged): synthesis
    # frames step through the analysis timeline at stride 1/rate, so for
    # rate > 1 the stretched signal is LONGER (duration L*rate).
    M = max(int((F - 1) * rate), 2)
    pos = jnp.arange(M) / rate
    i0 = jnp.clip(pos.astype(jnp.int32), 0, F - 2)
    frac = (pos - i0)[..., None]
    mag_m = (1 - frac) * mags[..., i0, :] + frac * mags[..., i0 + 1, :]
    dphi = phis[..., i0 + 1, :] - phis[..., i0, :] - omega
    dphi = dphi - 2 * jnp.pi * jnp.round(dphi / (2 * jnp.pi))  # wrap
    advance = omega + dphi                                 # (..., M, K)

    # accumulate phase over synthesis frames
    phase = jnp.cumsum(advance, axis=-2) - advance + phis[..., 0:1, :]
    frames = jnp.fft.irfft(mag_m * jnp.exp(1j * phase), n=n_fft,
                           axis=-1).real * window

    # overlap-add at the same hop -> time-stretched signal y (length ~L*rate)
    Ly = (M - 1) * hop + n_fft
    idx_y = jnp.arange(n_fft)[None, :] + hop * jnp.arange(M)[:, None]
    y = jnp.zeros(wav.shape[:-1] + (Ly,), wav.dtype)
    y = y.at[..., idx_y].add(frames.astype(wav.dtype))
    norm = jnp.zeros((Ly,), wav.dtype).at[idx_y.reshape(-1)].add(
        jnp.tile(window ** 2, (M,)))
    y = jnp.where(norm >= 1e-1, y / jnp.maximum(norm, 1e-2), 0.0)

    # 2) resample: read y at step `rate` -> length L, duration restored,
    # pitch multiplied by `rate`.
    pos_s = jnp.arange(L) * rate
    i0s = jnp.clip(pos_s.astype(jnp.int32), 0, Ly - 2)
    fr = (pos_s - i0s).astype(wav.dtype)
    return y[..., i0s] * (1 - fr) + y[..., i0s + 1] * fr


def augment_batch(wav: jax.Array, rng: jax.Array,
                  cfg: Optional[AugmentConfig] = None) -> jax.Array:
    """Per-sample randomized augmentation of (B, 2, L) waveforms."""
    cfg = cfg or AugmentConfig()
    B = wav.shape[0]
    keys = jax.random.split(rng, B * 3).reshape(B, 3, 2)

    def one(w, ks):
        w = jax.lax.cond(
            jax.random.uniform(ks[0]) < cfg.noise_prob,
            lambda w: add_noise(w, ks[0], cfg.noise_scale), lambda w: w, w)
        w = jax.lax.cond(
            jax.random.uniform(ks[1]) < cfg.freq_mask_prob,
            lambda w: freq_mask(w, ks[1], cfg.n_fft, cfg.hop,
                                cfg.freq_mask_param),
            lambda w: w, w)
        return w

    return jax.vmap(one)(wav, keys)
