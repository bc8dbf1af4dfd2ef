"""Incremental KV-cache step vs parity-exact full recompute.

Contract: exact equivalence while the context window is still growing
(causal attention + distance-only AliBi make appends non-retroactive);
bounded deviation after the window slides (cached upper-layer K/V keep
their as-computed values while the reference recomputes without dropped
frames — see runtime/incremental.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.runtime.incremental import (
    init_kv_state, run_frames_kv,
)
from vap_realtime_tpu.runtime.streaming import (
    frame_audio, init_stream_state, run_frames,
)
from vap_realtime_tpu.weights.synthetic import synthetic_audio, synthetic_params


def _outputs(cfg, seconds, batch=1):
    params = synthetic_params(frame_hz=cfg.frame_hz)
    audio = synthetic_audio(16000 * seconds)
    frames = jnp.asarray(frame_audio(audio, cfg)[:, None])
    if batch > 1:
        frames = jnp.tile(frames, (1, batch, 1, 1))

    run_full = jax.jit(run_frames, static_argnums=3)
    _, full = run_full(params, init_stream_state(cfg, batch), frames, cfg)
    run_kv = jax.jit(run_frames_kv, static_argnums=3)
    _, kv = run_kv(params, init_kv_state(cfg, batch), frames, cfg)
    return full, kv, frames.shape[0]


def test_exact_while_growing():
    # 2.5 s context at 20 Hz = 50 frames; run 40 frames -> window never slides
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    full, kv, F = _outputs(cfg, seconds=2)
    assert F < cfg.context_frames
    for key in ("p_now", "p_future", "vad"):
        np.testing.assert_allclose(np.asarray(kv[key]),
                                   np.asarray(full[key]), atol=2e-5,
                                   err_msg=key)


def test_bounded_after_slide():
    # 1 s context at 20 Hz = 20 frames; run 4 s -> window slides for 59 frames
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    full, kv, F = _outputs(cfg, seconds=4)
    assert F > 2 * cfg.context_frames
    # exact until the first slide
    g = cfg.context_frames
    np.testing.assert_allclose(np.asarray(kv["p_now"][:g]),
                               np.asarray(full["p_now"][:g]), atol=2e-5)
    # bounded deviation afterwards (regression bound, not a parity claim)
    dev = np.abs(np.asarray(kv["p_now"]) - np.asarray(full["p_now"])).max()
    assert dev < 0.05, f"sliding-window deviation too large: {dev}"


def test_batch_consistency():
    # batched streams produce identical results to batch=1
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    full1, kv1, _ = _outputs(cfg, seconds=1, batch=1)
    _, kv3, _ = _outputs(cfg, seconds=1, batch=3)
    np.testing.assert_allclose(np.asarray(kv3["p_now"][:, 2]),
                               np.asarray(kv1["p_now"][:, 0]), atol=1e-6)
