"""Waveform augmentations for noise-robust ("MC") training.

Reference contract (train/transforms.py:11-144 `Augmentation`): with
probability 0.5 per train batch, apply ONE of {pitch shift, additive
noise, waveform frequency masking} (p=0.25 each) or all three in
sequence (p=0.25).  These perturbations produced the published
noise-robust `*_MC` checkpoints (README.md:343-347).

Faithful recipes:

- Pitch shift (reference transforms.py:93-107 -> torchaudio
  `functional.pitch_shift`): STFT (n_fft=512, hop=128, centered hann)
  -> phase vocoder time-stretch by 1/rate -> iSTFT at length
  round(L/rate) -> windowed-sinc resample int(sr/rate) -> sr
  (`sinc_interp_hann`, lowpass_filter_width=6, rolloff=0.99), cropped
  or zero-padded back to L.  rate = 2**(-n_steps/12), n_steps drawn
  from {-2,-1,1,2}.  torchaudio is not installable in this image, so
  the algorithm is re-implemented from its published definition and
  golden-pinned against an independent float64 torch/numpy rendering
  of the same formulas (tools/generate_golden.py).
- Additive noise (reference transforms.py:74-90 `AddGaussianNoise`):
  Gaussian noise rescaled to a peak-to-peak band of 2*max_amplitude
  and re-centered (noise -= min; noise *= 2a/max; noise -= max/2).
- Frequency masking (reference transforms.py:110-141
  `WaveformFrequencyMasking`): complex STFT with n_fft = 0.05*sr = 800,
  hop = 0.02*sr = 320; a random band of width U[0, 100) bins starting
  at U[0, n_freq - width) is zeroed in the REAL part only (the
  reference masks `spec.real` and keeps the imaginary part — quirk
  preserved), iid per (batch, channel); then inverse STFT.

All pure functions of (waveform, rng); everything jit-compatible (the
data-dependent branch/step choices use `lax.switch` over static-shape
branches).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AugmentConfig:
    """Reference Augmentation defaults (train/transforms.py:13-21)."""

    probability: float = 0.5
    noise_amplitude: float = 0.01
    pitch_steps: Tuple[int, ...] = (-2, -1, 1, 2)
    freq_mask_param: int = 100
    sample_rate: int = 16000


# ---------------------------------------------------------------------------
# STFT / iSTFT with torch semantics (center=True, reflect pad, hann)
# ---------------------------------------------------------------------------

def _stft(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """(..., L) -> complex (..., n_freq, frames), torch.stft semantics
    (center=True reflect padding, hann window, onesided)."""
    pad = n_fft // 2
    x = jnp.concatenate(
        [wav[..., 1:pad + 1][..., ::-1], wav, wav[..., -pad - 1:-1][..., ::-1]],
        axis=-1)
    L = x.shape[-1]
    frames = 1 + (L - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(frames)[:, None]
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], wav.dtype)  # periodic
    seg = x[..., idx] * window                     # (..., frames, n_fft)
    return jnp.swapaxes(jnp.fft.rfft(seg, axis=-1), -1, -2)


def _istft(spec: jax.Array, n_fft: int, hop: int, length: int) -> jax.Array:
    """complex (..., n_freq, frames) -> (..., length), torch.istft
    semantics (window-square overlap-add normalization, center crop)."""
    dtype = jnp.zeros((), spec.dtype).real.dtype
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], dtype)
    frames = spec.shape[-1]
    seg = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    seg = (seg * window).astype(dtype)             # (..., frames, n_fft)
    Ly = (frames - 1) * hop + n_fft
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(frames)[:, None]
    y = jnp.zeros(spec.shape[:-2] + (Ly,), dtype).at[..., idx].add(seg)
    norm = jnp.zeros((Ly,), dtype).at[idx.reshape(-1)].add(
        jnp.tile(window ** 2, (frames,)))
    y = y / jnp.maximum(norm, 1e-11)
    pad = n_fft // 2
    return y[..., pad:pad + length]


def phase_vocoder(spec: jax.Array, rate: float, hop: int,
                  n_fft: int) -> jax.Array:
    """Time-stretch a complex STFT by `rate` (torchaudio
    `functional.phase_vocoder` formulas).

    spec: (..., n_freq, frames) -> (..., n_freq, ceil(frames/rate)).
    """
    n_freq, F = spec.shape[-2], spec.shape[-1]
    dtype = jnp.zeros((), spec.dtype).real.dtype
    phase_advance = jnp.linspace(0, math.pi * hop, n_freq,
                                 dtype=dtype)[:, None]
    steps = np.arange(0, F, rate, dtype=np.float64)      # static length
    alphas = jnp.asarray(steps % 1.0, dtype)
    i0 = jnp.asarray(steps.astype(np.int64))
    specp = jnp.concatenate(
        [spec, jnp.zeros(spec.shape[:-1] + (2,), spec.dtype)], axis=-1)
    s0 = specp[..., i0]
    s1 = specp[..., i0 + 1]

    phase0 = jnp.angle(spec[..., :1])
    phase = jnp.angle(s1) - jnp.angle(s0) - phase_advance
    phase = phase - 2 * math.pi * jnp.round(phase / (2 * math.pi))
    phase = phase + phase_advance
    phase = jnp.concatenate([phase0, phase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(phase, axis=-1)
    mag = alphas * jnp.abs(s1) + (1 - alphas) * jnp.abs(s0)
    return mag * jnp.exp(1j * phase_acc)


# ---------------------------------------------------------------------------
# Windowed-sinc resampling (torchaudio sinc_interp_hann)
# ---------------------------------------------------------------------------

def _resample_table(orig_freq: int, new_freq: int,
                    lowpass_filter_width: int = 6, rolloff: float = 0.99
                    ) -> Tuple[np.ndarray, np.ndarray, int, int, int]:
    """Per-output-phase sinc kernel table (numpy, float64).

    torchaudio materializes a dense (new_freq, orig_freq + 2*width)
    conv kernel whose taps are zero outside |t| < lowpass_filter_width;
    this builds only the non-zero window per phase.  Mathematically
    identical (the gather/dense equivalence is asserted in
    tools/generate_golden.py).  Returns (kernels (new, taps),
    start (new,), orig, new, width) with orig/new gcd-reduced.
    """
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    base = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base))
    taps = 2 * width + 2
    k = np.arange(new, dtype=np.float64)[:, None]         # output phase
    start = np.floor(k * orig / new).astype(np.int64) - width  # (new, 1)
    n = start + np.arange(taps, dtype=np.int64)[None, :]  # input index
    u = n / orig - k / new
    t = np.clip(u * base, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    tpi = t * math.pi
    kern = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1, tpi))
    kern = kern * window * (base / orig)
    return kern, start[:, 0], orig, new, width


def sinc_resample(wav: jax.Array, orig_freq: int, new_freq: int) -> jax.Array:
    """(..., L) at orig_freq -> (..., ceil(L*new/orig)) at new_freq,
    matching torchaudio `functional.resample` defaults
    (sinc_interp_hann, lowpass_filter_width=6, rolloff=0.99)."""
    kern, start, orig, new, _w = _resample_table(orig_freq, new_freq)
    L = wav.shape[-1]
    target = int(math.ceil(new * L / orig))
    m = np.arange(target, dtype=np.int64)
    block, phase = m // new, m % new
    n0 = block * orig + start[phase]                      # first tap per out
    taps = kern.shape[1]
    idx = jnp.asarray(n0)[:, None] + jnp.arange(taps)[None, :]
    valid = (idx >= 0) & (idx < L)
    gathered = jnp.where(valid, wav[..., jnp.clip(idx, 0, L - 1)], 0.0)
    weights = jnp.asarray(kern[phase], wav.dtype)         # (target, taps)
    return jnp.sum(gathered * weights, axis=-1)


def pitch_shift(wav: jax.Array, n_steps: int, sample_rate: int = 16000,
                n_fft: int = 512, bins_per_octave: int = 12) -> jax.Array:
    """Duration-preserving pitch shift by `n_steps` semitones — the exact
    torchaudio `functional.pitch_shift` pipeline used by the reference
    (train/transforms.py:102-107; hop = n_fft//4, centered hann STFT).

    `n_steps` must be a static Python int (the stretch length is shape-
    determining); randomized selection happens via `lax.switch` in
    `augment_batch`.  NOTE: the reference disables torch determinism
    around this op; this version is deterministic.
    """
    hop = n_fft // 4
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    L = wav.shape[-1]
    spec = _stft(wav, n_fft, hop)
    stretched = phase_vocoder(spec, rate, hop, n_fft)
    len_stretch = int(round(L / rate))
    y = _istft(stretched, n_fft, hop, len_stretch)
    z = sinc_resample(y, int(sample_rate / rate), sample_rate)
    if z.shape[-1] >= L:
        return z[..., :L]
    return jnp.concatenate(
        [z, jnp.zeros(z.shape[:-1] + (L - z.shape[-1],), z.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# Noise + frequency masking
# ---------------------------------------------------------------------------

def add_noise(wav: jax.Array, rng: jax.Array,
              max_amplitude: float = 0.01) -> jax.Array:
    """Reference AddGaussianNoise (transforms.py:74-90): Gaussian noise
    rescaled so its peak-to-peak span is 2*max_amplitude, re-centered by
    half its max."""
    noise = jax.random.normal(rng, wav.shape, wav.dtype)
    noise = noise - noise.min()
    noise = 2 * max_amplitude * noise / noise.max()
    noise = noise - noise.max() / 2
    return wav + noise


def freq_mask(wav: jax.Array, rng: jax.Array, sample_rate: int = 16000,
              mask_param: int = 100) -> jax.Array:
    """Reference WaveformFrequencyMasking (transforms.py:110-141):
    complex STFT (n_fft=0.05*sr, hop=0.02*sr), zero a random band of the
    REAL part only (iid per leading axes), inverse STFT.

    wav: (..., L); the mask is iid over all leading axes (torchaudio
    `iid_masks=True` on (B, C, F, T))."""
    n_fft = int(0.05 * sample_rate)
    hop = int(0.02 * sample_rate)
    L = wav.shape[-1]
    spec = _stft(wav, n_fft, hop)                  # (..., n_freq, T)
    n_freq = spec.shape[-2]
    lead = spec.shape[:-2]
    k1, k2 = jax.random.split(rng)
    value = jax.random.uniform(k1, lead) * mask_param
    vmin = jax.random.uniform(k2, lead) * (n_freq - value)
    f = jnp.arange(n_freq, dtype=jnp.float32)
    band = ((f >= vmin[..., None]) & (f < (vmin + value)[..., None]))
    masked_real = jnp.where(band[..., None], 0.0, spec.real)
    spec = jax.lax.complex(masked_real, spec.imag)
    return _istft(spec, n_fft, hop, L)


# ---------------------------------------------------------------------------
# Batch augmentation (reference Augmentation.forward branch structure)
# ---------------------------------------------------------------------------

def augment_batch(wav: jax.Array, rng: jax.Array,
                  cfg: Optional[AugmentConfig] = None) -> jax.Array:
    """One train-batch augmentation draw (reference transforms.py:58-71):
    with probability `cfg.probability`, apply ONE of pitch / noise /
    freq-mask (p=0.25 each) or all three (p=0.25) to the WHOLE batch
    (batch-level branch draws, like the reference's callback).

    wav: (B, 2, L).
    """
    cfg = cfg or AugmentConfig()
    k_gate, k_branch, k_step, k_noise, k_mask = jax.random.split(rng, 5)
    B, C, L = wav.shape
    flat = wav.reshape(B * C, L)

    def _pitch(x):
        branches = [partial(pitch_shift, n_steps=s,
                            sample_rate=cfg.sample_rate)
                    for s in cfg.pitch_steps]
        i = jax.random.randint(k_step, (), 0, len(cfg.pitch_steps))
        return jax.lax.switch(i, branches, x)

    def _noise(x):
        return add_noise(x, k_noise, cfg.noise_amplitude)

    def _mask(x):
        return freq_mask(x, k_mask, cfg.sample_rate, cfg.freq_mask_param)

    def _all(x):
        # reference apply_all order: pitch -> freq mask -> noise
        return _noise(_mask(_pitch(x)))

    def _apply(x):
        r = jax.random.uniform(k_branch)
        branch = (jnp.int32(r >= 0.25) + jnp.int32(r >= 0.5)
                  + jnp.int32(r >= 0.75))
        return jax.lax.switch(branch, [_pitch, _noise, _mask, _all], x)

    gate = jax.random.uniform(k_gate) <= cfg.probability
    return jax.lax.cond(gate, _apply, lambda x: x, flat).reshape(B, C, L)
