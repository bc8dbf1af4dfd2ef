"""Augmentation transforms + augmented training step."""

import jax
import jax.numpy as jnp
import numpy as np

from vap_realtime_tpu.train.transforms import (
    AugmentConfig, add_noise, augment_batch, freq_mask, pitch_shift,
)


def test_add_noise():
    rng = jax.random.PRNGKey(0)
    w = jnp.zeros((2, 1600))
    out = add_noise(w, rng, scale=0.01)
    assert float(jnp.std(out)) > 0.005
    assert float(jnp.std(out)) < 0.02


def test_freq_mask_preserves_shape_and_energy():
    rng = jax.random.PRNGKey(1)
    rs = np.random.RandomState(0)
    w = jnp.asarray(0.2 * rs.randn(2, 4000).astype(np.float32))
    out = freq_mask(w, rng)
    assert out.shape == w.shape
    e_in = float(jnp.mean(w ** 2))
    e_out = float(jnp.mean(out ** 2))
    assert 0.05 * e_in < e_out <= 1.5 * e_in  # masked but not destroyed


def test_pitch_shift_changes_frequency():
    t = np.arange(16000) / 16000.0
    w = jnp.asarray(np.sin(2 * np.pi * 200 * t).astype(np.float32))[None]
    up = pitch_shift(w, steps=12)  # one octave up = 2x rate resample
    # zero crossings double (within edge effects)
    zc = lambda x: int(np.sum(np.abs(np.diff(np.sign(np.asarray(x[0]))))) // 2)
    assert zc(up) > 1.7 * zc(w) / 1.0 or zc(up) > zc(w) * 1.5


def test_augment_batch_randomized_per_sample():
    rng = jax.random.PRNGKey(2)
    rs = np.random.RandomState(0)
    w = jnp.asarray(0.1 * rs.randn(4, 2, 4000).astype(np.float32))
    out = augment_batch(w, rng, AugmentConfig(noise_prob=1.0,
                                              freq_mask_prob=0.0))
    assert out.shape == w.shape
    assert float(jnp.max(jnp.abs(out - w))) > 1e-4


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
