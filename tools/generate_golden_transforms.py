"""Golden generator for the MC-recipe augmentations (pitch shift,
frequency masking) — an INDEPENDENT float64 torch-core rendering of the
torchaudio pipeline the reference uses (train/transforms.py:93-141).

torchaudio itself is not installable in this image, so this renders its
published algorithm (`functional.pitch_shift`: STFT -> phase_vocoder ->
iSTFT -> sinc_interp_hann resample) from the definitions, using
torch.stft/torch.istft as the ground-truth STFT pair.  The resample
uses a per-phase gather table; its equivalence to torchaudio's dense
(new_freq, orig_freq + 2*width) conv kernel is asserted below
(`check_gather_vs_dense`) on small coprime/gcd cases before goldens are
written.

Writes tests/golden/transforms.npz.

Run: python tools/generate_golden_transforms.py
"""

import math
import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

LOWPASS_WIDTH = 6
ROLLOFF = 0.99


def t_window(n_fft):
    return torch.hann_window(n_fft, periodic=True, dtype=torch.float64)


def t_stft(x, n_fft, hop):
    return torch.stft(x, n_fft, hop, win_length=n_fft, window=t_window(n_fft),
                      center=True, pad_mode="reflect", return_complex=True)


def t_istft(spec, n_fft, hop, length):
    return torch.istft(spec, n_fft, hop, win_length=n_fft,
                       window=t_window(n_fft), center=True, length=length)


def t_phase_vocoder(spec, rate, hop):
    """torchaudio.functional.phase_vocoder formulas (float64)."""
    n_freq, F = spec.shape[-2], spec.shape[-1]
    phase_advance = torch.linspace(0, math.pi * hop, n_freq,
                                   dtype=torch.float64)[:, None]
    time_steps = torch.arange(0, F, rate, dtype=torch.float64)
    alphas = time_steps % 1.0
    phase_0 = spec[..., :1].angle()
    specp = torch.nn.functional.pad(spec, [0, 2])
    s0 = specp[..., time_steps.long()]
    s1 = specp[..., time_steps.long() + 1]
    phase = s1.angle() - s0.angle() - phase_advance
    phase = phase - 2 * math.pi * torch.round(phase / (2 * math.pi))
    phase = phase + phase_advance
    phase = torch.cat([phase_0, phase[..., :-1]], dim=-1)
    phase_acc = torch.cumsum(phase, dim=-1)
    mag = alphas * s1.abs() + (1 - alphas) * s0.abs()
    return torch.polar(mag, phase_acc)


def dense_resample_kernel(orig, new):
    """torchaudio _get_sinc_resample_kernel (sinc_interp_hann), verbatim
    formulas, gcd-reduced inputs assumed.  Returns (kernel (new, 1, W),
    width)."""
    base = min(orig, new) * ROLLOFF
    width = math.ceil(LOWPASS_WIDTH * orig / base)
    idx = torch.arange(-width, width + orig, dtype=torch.float64)[None] / orig
    t = torch.arange(0, -new, -1, dtype=torch.float64)[:, None] / new + idx
    t = t * base
    t = t.clamp_(-LOWPASS_WIDTH, LOWPASS_WIDTH)
    window = torch.cos(t * math.pi / LOWPASS_WIDTH / 2) ** 2
    t = t * math.pi
    scale = base / orig
    kern = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64),
                       t.sin() / t) * window * scale
    return kern[:, None, :], width


def t_resample_dense(x, orig_freq, new_freq):
    """torchaudio _apply_sinc_resample_kernel, verbatim (float64)."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = orig_freq // g, new_freq // g
    kern, width = dense_resample_kernel(orig, new)
    L = x.shape[-1]
    xpad = torch.nn.functional.pad(x, (width, width + orig))
    out = torch.nn.functional.conv1d(xpad[:, None], kern, stride=orig)
    out = out.transpose(1, 2).reshape(x.shape[0], -1)
    target = int(math.ceil(new * L / orig))
    return out[..., :target]


def t_resample_gather(x, orig_freq, new_freq):
    """Gather-form equivalent (only the non-zero taps per output phase)."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = orig_freq // g, new_freq // g
    base = min(orig, new) * ROLLOFF
    width = math.ceil(LOWPASS_WIDTH * orig / base)
    taps = 2 * width + 2
    k = np.arange(new, dtype=np.float64)[:, None]
    start = np.floor(k * orig / new).astype(np.int64) - width
    n = start + np.arange(taps, dtype=np.int64)[None]
    u = n / orig - k / new
    t = np.clip(u * base, -LOWPASS_WIDTH, LOWPASS_WIDTH)
    window = np.cos(t * math.pi / LOWPASS_WIDTH / 2) ** 2
    tpi = t * math.pi
    kern = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1, tpi))
    kern = kern * window * (base / orig)

    xn = x.numpy()
    L = xn.shape[-1]
    target = int(math.ceil(new * L / orig))
    m = np.arange(target, dtype=np.int64)
    block, phase = m // new, m % new
    n0 = block * orig + start[phase, 0]
    idx = n0[:, None] + np.arange(taps)[None]
    valid = (idx >= 0) & (idx < L)
    gathered = np.where(valid[None], xn[:, np.clip(idx, 0, L - 1)], 0.0)
    return torch.from_numpy(np.sum(gathered * kern[phase][None], axis=-1))


def check_gather_vs_dense():
    rs = np.random.RandomState(0)
    x = torch.from_numpy(rs.randn(2, 3000))
    for orig, new in [(147, 160), (161, 160), (7127, 8000), (160, 147)]:
        a = t_resample_dense(x, orig, new)
        b = t_resample_gather(x, orig, new)
        err = (a - b).abs().max().item()
        assert err < 1e-12, (orig, new, err)
        print(f"  gather==dense resample {orig}->{new}: max err {err:.2e}")


def t_pitch_shift(x, n_steps, sample_rate=16000, n_fft=512,
                  bins_per_octave=12):
    """torchaudio.functional.pitch_shift pipeline (float64)."""
    hop = n_fft // 4
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    L = x.shape[-1]
    spec = t_stft(x, n_fft, hop)
    stretched = t_phase_vocoder(spec, rate, hop)
    y = t_istft(stretched, n_fft, hop, length=int(round(L / rate)))
    z = t_resample_gather(y, int(sample_rate / rate), sample_rate)
    if z.shape[-1] >= L:
        return z[..., :L]
    return torch.nn.functional.pad(z, (0, L - z.shape[-1]))


def main():
    print("self-check: gather vs torchaudio dense resample kernel")
    check_gather_vs_dense()

    rs = np.random.RandomState(7)
    t = np.arange(8000) / 16000.0
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 520 * t + 0.3)
           + 0.05 * rs.randn(8000))
    wav = np.stack([wav, np.roll(wav, 1234) * 0.8]).astype(np.float64)
    x = torch.from_numpy(wav)

    out = {"input": wav}
    for steps in (-2, -1, 1, 2):
        y = t_pitch_shift(x, steps)
        out[f"pitch_{steps}"] = y.numpy()
        print(f"  pitch n_steps={steps}: out {tuple(y.shape)} "
              f"rms {y.pow(2).mean().sqrt():.4f}")

    # frequency-mask golden with a FIXED band (randomness is framework-
    # specific): zero REAL part of bins [50, 120) on the 800/320 STFT
    n_fft, hop = 800, 320
    spec = t_stft(x, n_fft, hop)
    masked = spec.clone()
    masked.real[:, 50:120, :] = 0.0
    out["freqmask_fixed"] = t_istft(masked, n_fft, hop, x.shape[-1]).numpy()

    # raw stft/istft roundtrip goldens for the 512/128 pair
    s = t_stft(x, 512, 128)
    out["stft_512_real"] = s.real.numpy()
    out["stft_512_imag"] = s.imag.numpy()
    out["istft_512"] = t_istft(s, 512, 128, x.shape[-1]).numpy()

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, "transforms.npz")
    np.savez(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main())
