"""Numerical parity vs the reference PyTorch implementation.

Golden files are produced by tools/generate_golden.py, which runs the
ACTUAL reference code (/root/reference) with deterministic synthetic
weights/audio.  Contract: p_now/p_future allclose atol 1e-4 frame-by-frame
(BASELINE.md), plus unit-level intermediates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import load_golden_stream
from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.models.encoder import cpc_conv_stack, encode_chunk
from vap_realtime_tpu.models.vap import forward_context, probs_from_outputs
from vap_realtime_tpu.models import objective as obj
from vap_realtime_tpu.runtime.streaming import (
    frame_audio, init_stream_state, run_frames, stream_step,
)
from vap_realtime_tpu.weights.synthetic import synthetic_params

ATOL = 1e-4


@pytest.fixture(scope="module")
def params20():
    return synthetic_params(frame_hz=20)


def test_conv_stack(golden_unit, params20):
    chunk = jnp.asarray(golden_unit["chunk"])[None]        # (1, 1120)
    out = cpc_conv_stack(params20["encoder"], chunk)       # (1, 7, 256)
    ref = golden_unit["conv_out"].T                        # (7, 256)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=ATOL)


def test_encode_chunk(golden_unit, params20):
    chunk = jnp.asarray(golden_unit["chunk"])[None]
    h = jnp.zeros((1, 256))
    c = jnp.zeros((1, 256))
    emb, _, _ = encode_chunk(params20["encoder"], chunk, h, c, 5)
    np.testing.assert_allclose(np.asarray(emb[0]), golden_unit["emb"],
                               atol=ATOL)


def test_trunk_and_heads(golden_unit, params20):
    cfg = VapConfig(frame_hz=20)
    e1 = jnp.asarray(golden_unit["e1"])
    e2 = jnp.asarray(golden_unit["e2"])
    outs = forward_context(params20, e1, e2, cfg)
    np.testing.assert_allclose(np.asarray(outs["logits"]),
                               golden_unit["logits"], atol=ATOL)
    probs = probs_from_outputs(outs, cfg)
    np.testing.assert_allclose(np.asarray(probs["p_now"]),
                               golden_unit["p_now"], atol=ATOL)
    np.testing.assert_allclose(np.asarray(probs["p_future"]),
                               golden_unit["p_future"], atol=ATOL)


def test_labels(golden_unit):
    cfg = VapConfig(frame_hz=50)  # reference objective defaults to 50 Hz
    va = jnp.asarray(golden_unit["vad_in"])
    labels = obj.get_labels(va, cfg.bin_frames())
    np.testing.assert_array_equal(np.asarray(labels), golden_unit["labels"])


def _run_stream(golden, cfg, mode="vap"):
    params = synthetic_params(frame_hz=cfg.frame_hz, mode=mode)
    frames = frame_audio(golden["audio"], cfg)[:, None]  # (F, 1, 2, S)
    state = init_stream_state(cfg, batch=1)
    run = jax.jit(run_frames, static_argnums=3)
    _, outs = run(params, state, jnp.asarray(frames), cfg)
    F = frames.shape[0]
    return [{k: np.asarray(v[f, 0]) for k, v in outs.items()}
            for f in range(F)]


@pytest.mark.parametrize("hz,ctx", [(20, 2.5), (10, 5.0), (50, 1.0)])
def test_stream_parity_vap(hz, ctx):
    golden = load_golden_stream(f"stream_vap_{hz}hz.npz")
    cfg = VapConfig(frame_hz=hz, context_len_sec=ctx)
    results = _run_stream(golden, cfg)
    assert len(results) == golden["p_now"].shape[0]
    p_now = np.stack([r["p_now"] for r in results])
    p_fut = np.stack([r["p_future"] for r in results])
    vad = np.stack([r["vad"] for r in results])
    np.testing.assert_allclose(p_now, golden["p_now"], atol=ATOL)
    np.testing.assert_allclose(p_fut, golden["p_future"], atol=ATOL)
    np.testing.assert_allclose(vad, golden["vad"], atol=ATOL)


def test_stream_parity_bc():
    golden = load_golden_stream("stream_bc_10hz.npz")
    cfg = VapConfig(frame_hz=10, context_len_sec=5.0, mode="bc")
    results = _run_stream(golden, cfg, mode="bc")
    react = np.stack([r["p_bc_react"] for r in results])
    emo = np.stack([r["p_bc_emo"] for r in results])
    np.testing.assert_allclose(react, golden["p_bc_react"], atol=ATOL)
    np.testing.assert_allclose(emo, golden["p_bc_emo"], atol=ATOL)


def test_stream_parity_nod():
    golden = load_golden_stream("stream_nod_10hz.npz")
    cfg = VapConfig(frame_hz=10, context_len_sec=5.0, mode="nod")
    results = _run_stream(golden, cfg, mode="nod")
    for key in ("p_bc", "p_nod_short", "p_nod_long", "p_nod_long_p"):
        got = np.stack([r[key] for r in results])
        np.testing.assert_allclose(got, golden[key], atol=ATOL, err_msg=key)
