"""Static stateless-step formulation — the `VAPRealTimeStatic` analogue.

Reference contract (tools/vap_static.py:170-304): a traceable, stateless
graph ``forward(x1, x2, e1_context, e2_context) -> (p_now_last,
p_future_last, vad1, vad2, e1, e2)`` where the embedding ring buffer is
externalized — the caller re-feeds the concatenated context each frame.
The reference exports this to ONNX with a fixed 99-frame context for
wasm/tflite (tools/export_vap_onnx.py:77-90).

Here the same formulation is a pure JAX function, exportable to StableHLO
via `jax.export` (tools/export_static.py) for serving outside this
process (IFRT/PJRT runtimes, TF via jax2tf where available).

NOTE: the LSTM hidden state is ALSO external state; the reference static
graph simply re-runs the encoder per chunk with `keepHidden` semantics
broken at export boundaries — we expose (h, c) explicitly instead, which
is strictly more faithful to streaming behaviour.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.models.encoder import encode_chunk
from vap_realtime_tpu.models.vap import (
    forward_context, probs_from_outputs,
)

Params = Dict


def static_step(params: Params, x1: jax.Array, x2: jax.Array,
                e1_context: jax.Array, e2_context: jax.Array,
                h: jax.Array, c: jax.Array, cfg: VapConfig) -> Tuple:
    """One frame with fully external state.

    x1, x2:             (1, frame_samples) audio chunks
    e1_context/e2_...:  (1, T_CTX, D) previous embeddings (zero-padded on
                        the LEFT for cold start, like the reference's
                        zero-initialized deque, tools/vap_offline_onnx.py)
    h, c:               (2, D) LSTM state for the two channel encoders

    Returns (p_now, p_future, vad1, vad2, e1, e2, h_new, c_new) where
    p_* are the LAST frame's (2,) probabilities and e1/e2 are this
    frame's new embeddings for the caller to append.
    """
    wav = jnp.concatenate([x1, x2], axis=0)             # (2, S)
    e, h_new, c_new = encode_chunk(params["encoder"], wav, h, c,
                                   cfg.downsample_kernel)
    e1 = e[0:1][:, None, :]                             # (1, 1, D)
    e2 = e[1:2][:, None, :]
    ctx1 = jnp.concatenate([e1_context, e1], axis=1)[:, 1:]
    ctx2 = jnp.concatenate([e2_context, e2], axis=1)[:, 1:]
    outs = forward_context(params, ctx1, ctx2, cfg)
    probs = probs_from_outputs(outs, cfg)
    return (probs["p_now"][0, -1], probs["p_future"][0, -1],
            probs["vad"][0, :, 0], probs["vad"][0, :, 1],
            e1[0], e2[0], h_new, c_new)


def make_static_fn(cfg: VapConfig, context_frames: int | None = None):
    """Bind shapes and return (fn, example_args) for export/AOT.

    context_frames defaults to CALC_PROCESS_TIME_INTERVAL - 1 = 99, the
    reference's static export size (tools/export_vap_onnx.py:77-79).
    """
    T = context_frames if context_frames is not None else 99
    D = cfg.dim
    S = cfg.frame_samples

    def fn(params, x1, x2, e1_context, e2_context, h, c):
        return static_step(params, x1, x2, e1_context, e2_context, h, c,
                           cfg)

    example = (
        jnp.zeros((1, S), jnp.float32), jnp.zeros((1, S), jnp.float32),
        jnp.zeros((1, T, D), jnp.float32), jnp.zeros((1, T, D),
                                                     jnp.float32),
        jnp.zeros((2, D), jnp.float32), jnp.zeros((2, D), jnp.float32),
    )
    return fn, example
