"""Streaming engine — stateless step over a per-stream state pytree.

Reference behaviour being reproduced (rvap/vap_main/vap_main.py:249-335):
each model frame (16000//frame_hz + 320 samples with 320-sample overlap)
is encoded to ONE embedding per channel, appended to a context buffer of
at most `context_len_sec*frame_hz` embeddings, and the full transformer
re-runs over the buffered context; outputs are the last frame's
p_now / p_future / vad.  Cold start attends only over the frames seen so
far (the buffer grows 1 -> Tmax), which the fixed-shape implementation
reproduces with a validity mask.

TPU-first design (SURVEY.md §7.1):
- state is a pytree with static shapes -> one jit, `lax.scan`-able
- the embedding buffer is right-aligned (newest at index Tmax-1) so
  "append" is a roll + write and window order equals buffer order
- a leading stream axis batches thousands of concurrent dialogues; all
  ops are batched, nothing is per-stream Python
- `stream_step` (full recompute, parity-exact) and the incremental
  KV-cache step in runtime/incremental.py produce identical outputs
  while the context window is still growing; after it slides the KV
  path deviates boundedly (StreamingLLM-style) — see
  runtime/incremental.py's docstring for the exact contract.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.models.encoder import encode_chunk
from vap_realtime_tpu.models.transformer import alibi_bias, combinator
from vap_realtime_tpu.models.vap import heads_forward, probs_from_outputs

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclass
class StreamState:
    """Per-stream carried state (leading axis = streams).

    lstm_h / lstm_c: (B, D) CPC context-net state per channel is NOT
    per-channel — both channels run through weight-shared encoders, so the
    state is stored stacked as (B, 2, D).
    e_ctx: (B, 2, Tmax, D) right-aligned embedding context buffer.
    count: (B,) int32 — frames seen so far (saturates at INT32_MAX safely).
    """

    lstm_h: jax.Array
    lstm_c: jax.Array
    e_ctx: jax.Array
    count: jax.Array


def init_stream_state(cfg: VapConfig, batch: int = 1,
                      dtype=jnp.float32) -> StreamState:
    D = cfg.encoder_dim
    T = cfg.context_frames
    return StreamState(
        lstm_h=jnp.zeros((batch, 2, D), dtype),
        lstm_c=jnp.zeros((batch, 2, D), dtype),
        e_ctx=jnp.zeros((batch, 2, T, D), dtype),
        count=jnp.zeros((batch,), jnp.int32),
    )


def _encode_and_append(params: Params, state: StreamState, chunk: jax.Array,
                       cfg: VapConfig) -> StreamState:
    """chunk: (B, 2, frame_samples) -> new state with embeddings appended."""
    B = chunk.shape[0]
    flat = chunk.reshape(B * 2, -1)
    h = state.lstm_h.reshape(B * 2, -1)
    c = state.lstm_c.reshape(B * 2, -1)
    e, h_new, c_new = encode_chunk(params["encoder"], flat, h, c,
                                   cfg.downsample_kernel)
    e = e.reshape(B, 2, -1)
    # append right-aligned: shift left, write newest at Tmax-1
    e_ctx = jnp.roll(state.e_ctx, -1, axis=2).at[:, :, -1, :].set(e)
    return StreamState(
        lstm_h=h_new.reshape(B, 2, -1),
        lstm_c=c_new.reshape(B, 2, -1),
        e_ctx=e_ctx,
        count=state.count + 1,
    )


def _masked_bias(cfg: VapConfig, valid: jax.Array,
                 dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """AliBi+causal bias and per-stream key mask, kept FACTORED as
    (base (H, T, T), key_ok (B, T)) — materializing the combined
    (B, H, T, T) tensor would add ~T^2*H*4 bytes of HBM traffic per
    stream per frame for what is really rank-1 information.

    valid: (B,) number of real frames in the right-aligned buffer; slot j
    is a real frame iff j >= T - valid.  Using slot indices for the AliBi
    ramp is exact: per query row it differs from window positions by a
    constant, which softmax cancels.

    The diagonal is kept allowed for invalid (pre-history) query rows so
    their softmax has one finite entry — otherwise all -inf rows produce
    NaN and 0 * NaN from masked weights would poison valid rows
    downstream.  (Applied inside the attention via `key_ok | eye`.)
    """
    T = cfg.context_frames
    base = alibi_bias(T, cfg.num_heads, cfg.context_limit, dtype)  # (H,T,T)
    j = jnp.arange(T)
    key_ok = j[None, :] >= (T - valid)[:, None]                    # (B, T)
    return base, key_ok


def trunk_full(params: Params, e1: jax.Array, e2: jax.Array,
               bias: Tuple[jax.Array, jax.Array],
               cfg: VapConfig) -> Dict[str, jax.Array]:
    """Stereo trunk over fixed-size buffers with factored masking
    (base (H,T,T) bias + per-stream (B,T) key mask).

    Same math as models.vap.trunk_forward but with per-stream validity
    masking for the growing-context cold start.
    """
    B = e1.shape[0]
    base, key_ok = bias
    both = jnp.concatenate([e1, e2], axis=0)
    key_ok2 = jnp.concatenate([key_ok, key_ok], axis=0)
    x = both
    for layer in params["ar_channel"]["layers"]:
        x = _masked_layer(layer, x, base, key_ok2, cfg)
    o1, o2 = x[:B], x[B:]

    x1, x2 = o1, o2
    for layer in params["ar"]["layers"]:
        n1 = _masked_layer(layer, x1, base, key_ok, cfg, src=x2)
        n2 = _masked_layer(layer, x2, base, key_ok, cfg, src=x1)
        x1, x2 = n1, n2
    xc = combinator(params["ar"]["combinator"], x1, x2)
    return {"x": xc, "x1": x1, "x2": x2, "o1": o1, "o2": o2}


def _masked_layer(layer: Params, x: jax.Array, base: jax.Array,
                  key_ok: jax.Array, cfg: VapConfig,
                  src: Optional[jax.Array] = None):
    """transformer_layer with factored (H,T,T) bias + (B,T) key mask."""
    from vap_realtime_tpu.ops.basic import layer_norm, linear, gelu

    T = x.shape[1]
    eye = jnp.eye(T, dtype=bool)
    allowed = key_ok[:, None, None, :] | eye[None, None]   # (B,1,T,T)
    neg = jnp.asarray(-jnp.inf, x.dtype)

    def attn(p, q_in, kv_in):
        B, T, D = q_in.shape
        H = cfg.num_heads
        Dh = D // H
        split = lambda t: t.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        q = split(linear(q_in, p["q"]))
        k = split(linear(kv_in, p["k"]))
        v = split(linear(kv_in, p["v"]))
        s = jnp.einsum("bhid,bhjd->bhij", q, k) * (1.0 / math.sqrt(D))
        s = jnp.where(allowed, s + base[None], neg)
        a = jax.nn.softmax(s, axis=-1)
        y = jnp.einsum("bhij,bhjd->bhid", a, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, D)
        return linear(y, p["proj"])

    z = layer_norm(x, layer["ln_self"]["w"], layer["ln_self"]["b"])
    x = x + attn(layer["attn"], z, z)
    if src is not None:
        z = layer_norm(x, layer["ln_src"]["w"], layer["ln_src"]["b"])
        x = x + attn(layer["attn_cross"], z, src)
    h = layer_norm(x, layer["ln_ffn"]["w"], layer["ln_ffn"]["b"])
    f = gelu(linear(h, layer["ffn"]["w1"]))
    return x + linear(f, layer["ffn"]["w2"])


def stream_step(params: Params, state: StreamState,
                chunk: jax.Array, cfg: VapConfig,
                active: Optional[jax.Array] = None
                ) -> Tuple[StreamState, Dict[str, jax.Array]]:
    """One streaming frame for a batch of streams (full-recompute path).

    chunk: (B, 2, frame_samples).  Returns (new_state, results) where every
    result entry has leading dim B and carries the LAST frame's value,
    matching VAPRealTime.process_vap's `result_*` fields
    (vap_main.py:295-320).

    active: optional (B,) bool — streams with no fresh frame this tick
    are FROZEN (state unchanged, outputs garbage / to be ignored).
    """
    new = _encode_and_append(params, state, chunk, cfg)
    if active is not None:
        a = active[:, None, None]
        new = StreamState(
            lstm_h=jnp.where(a, new.lstm_h, state.lstm_h),
            lstm_c=jnp.where(a, new.lstm_c, state.lstm_c),
            e_ctx=jnp.where(a[..., None], new.e_ctx, state.e_ctx),
            count=jnp.where(active, new.count, state.count),
        )
    state = new
    T = cfg.context_frames
    valid = jnp.minimum(state.count, T)
    bias = _masked_bias(cfg, valid, state.e_ctx.dtype)

    e1 = state.e_ctx[:, 0]
    e2 = state.e_ctx[:, 1]
    trunk = trunk_full(params, e1, e2, bias, cfg)
    outs = heads_forward(params, trunk, cfg)
    probs = probs_from_outputs(outs, cfg)
    # keep only the newest frame (buffer is right-aligned)
    return state, {k: v[:, -1] for k, v in probs.items()}


def run_frames(params: Params, state: StreamState, frames: jax.Array,
               cfg: VapConfig) -> Tuple[StreamState, Dict[str, jax.Array]]:
    """Scan `stream_step` over pre-framed audio.

    frames: (F, B, 2, frame_samples) — overlapping model frames in time
    order (use `frame_audio` to build them).  Returns the final state and
    results stacked over frames: each value (F, B, ...).

    One jit compilation covers any number of frames; this is the offline /
    throughput path (reference analogue: rvap/vap_main/vap_offline.py:51-63).
    """

    def body(st, chunk):
        st, out = stream_step(params, st, chunk, cfg)
        return st, out

    return jax.lax.scan(body, state, frames)


def frame_audio(audio, cfg: VapConfig):
    """(C, N) waveform -> (F, C, frame_samples) overlapping frames.

    Frames advance by `frame_shift` and overlap by 320 samples, exactly the
    reference windowing (vap_offline.py:47-63).  numpy in/out (host-side
    prep).
    """
    import numpy as np

    frame, shift = cfg.frame_samples, cfg.frame_shift
    n = audio.shape[-1]
    starts = [i for i in range(0, n, shift) if i + frame <= n]
    return np.stack([audio[..., i:i + frame] for i in starts])
