"""Augmentation transforms: golden parity vs the float64 torch rendering
of torchaudio's pipeline (tools/generate_golden_transforms.py) plus
behavioral checks and the augmented train step."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import GOLDEN_DIR
from vap_realtime_tpu.train.transforms import (
    AugmentConfig, _istft, _stft, add_noise, augment_batch, freq_mask,
    pitch_shift,
)


@pytest.fixture(scope="module")
def golden():
    path = os.path.join(GOLDEN_DIR, "transforms.npz")
    if not os.path.exists(path):
        pytest.skip("run tools/generate_golden_transforms.py")
    return np.load(path)


def test_stft_istft_match_torch(golden):
    """Our centered STFT/iSTFT pair == torch.stft/istft (float64)."""
    with jax.enable_x64(True):
        x = jnp.asarray(golden["input"])
        s = _stft(x, 512, 128)
        np.testing.assert_allclose(np.asarray(s.real),
                                   golden["stft_512_real"], atol=1e-10)
        np.testing.assert_allclose(np.asarray(s.imag),
                                   golden["stft_512_imag"], atol=1e-10)
        y = _istft(s, 512, 128, x.shape[-1])
        np.testing.assert_allclose(np.asarray(y), golden["istft_512"],
                                   atol=1e-10)


@pytest.mark.parametrize("steps", [-2, -1, 1, 2])
def test_pitch_shift_matches_torchaudio_pipeline(golden, steps):
    """Full pitch-shift pipeline == the torchaudio-formula golden at
    float64 (exact algorithm translation), and close at float32."""
    with jax.enable_x64(True):
        x64 = jnp.asarray(golden["input"])
        y64 = pitch_shift(x64, steps)
        np.testing.assert_allclose(np.asarray(y64),
                                   golden[f"pitch_{steps}"], atol=1e-8)
    x32 = jnp.asarray(golden["input"].astype(np.float32))
    y32 = np.asarray(pitch_shift(x32, steps))
    # fp32 phase accumulation drifts; demand close tracking, not equality
    ref = golden[f"pitch_{steps}"]
    assert np.abs(y32 - ref).max() < 2e-2
    corr = np.corrcoef(y32.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_freq_mask_fixed_band_matches_torch(golden):
    """STFT -> zero REAL part of a fixed band -> iSTFT == torch golden
    (pins the n_fft=800/hop=320 geometry and the real-only quirk)."""
    with jax.enable_x64(True):
        x = jnp.asarray(golden["input"])
        s = _stft(x, 800, 320)
        masked = jax.lax.complex(
            s.real.at[:, 50:120, :].set(0.0), s.imag)
        y = _istft(masked, 800, 320, x.shape[-1])
        np.testing.assert_allclose(np.asarray(y), golden["freqmask_fixed"],
                                   atol=1e-10)


def test_pitch_shift_changes_frequency():
    t = np.arange(16000) / 16000.0
    w = jnp.asarray(np.sin(2 * np.pi * 220 * t).astype(np.float32))[None]
    up = np.asarray(pitch_shift(w, 2))    # +2 semitones ~ x1.122
    down = np.asarray(pitch_shift(w, -2))
    f0 = lambda x: np.abs(np.fft.rfft(x[0, 2000:14000])).argmax()
    base = f0(np.asarray(w))
    assert f0(up) > base * 1.09 and f0(up) < base * 1.15
    assert f0(down) < base / 1.09 and f0(down) > base / 1.15


def test_add_noise_reference_recipe():
    """Noise peak-to-peak == 2*max_amplitude, roughly centered
    (AddGaussianNoise, reference transforms.py:74-90)."""
    rng = jax.random.PRNGKey(0)
    w = jnp.zeros((2, 4000))
    out = np.asarray(add_noise(w, rng, max_amplitude=0.01))
    assert abs((out.max() - out.min()) - 0.02) < 1e-6
    assert abs(out.mean()) < 0.005


def test_freq_mask_random_band():
    rng = jax.random.PRNGKey(1)
    rs = np.random.RandomState(0)
    w = jnp.asarray(0.2 * rs.randn(2, 2, 8000).astype(np.float32))
    out = freq_mask(w, rng)
    assert out.shape == w.shape
    e_in = float(jnp.mean(w ** 2))
    e_out = float(jnp.mean(out ** 2))
    assert 0.05 * e_in < e_out <= 1.5 * e_in  # masked but not destroyed


def test_augment_batch_branches():
    """Batch-level gate + branch draws; gated-off leaves input intact."""
    rs = np.random.RandomState(0)
    w = jnp.asarray(0.1 * rs.randn(2, 2, 4000).astype(np.float32))
    changed = same = False
    for seed in range(8):
        out = augment_batch(w, jax.random.PRNGKey(seed),
                            AugmentConfig(probability=0.5))
        assert out.shape == w.shape
        d = float(jnp.max(jnp.abs(out - w)))
        changed |= d > 1e-4
        same |= d == 0.0
    assert changed and same


def test_augmented_train_step_runs(tmp_path):
    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.train.trainer import make_train_step, make_tx, OptConfig
    from vap_realtime_tpu.models.vap import init_vap_params

    cfg = VapConfig(frame_hz=20)
    rng = jax.random.PRNGKey(0)
    params = init_vap_params(rng, cfg)
    tx = make_tx(params, OptConfig())
    opt_state = tx.init(params)
    step = make_train_step(tx, cfg, augment=True)

    rs = np.random.RandomState(0)
    batch = {
        "waveform": jnp.asarray(0.1 * rs.randn(2, 2, 16000)
                                .astype(np.float32)),
        "vad": jnp.asarray((rs.rand(2, 60, 2) > 0.5).astype(np.float32)),
    }
    params, opt_state, metrics = step(params, opt_state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
