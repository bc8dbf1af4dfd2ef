"""CPC waveform encoder — TPU-native functional implementation.

Behavioural contract (what, not how) from the reference:

- 5-layer strided conv stack 1->256->...->256 with ChannelNorm+ReLU after
  each conv, 160x total downsample to 100 Hz
  (reference: rvap/vap_main/encoder_components.py:73-104).
- transpose to (B, T, C), trim the first and last frame ``z[:, 1:-1]``
  (reference: rvap/vap_main/encoder.py:74-77).
- 1-layer LSTM context network (the reference's ``load_CPC`` default
  ``arMode="LSTM"``, encoder_components.py:326-329 — NOT a GRU; the 60k
  CPC checkpoint carries (1024, 256) i/f/g/o gate weights), hidden state
  (h, c) carried across chunks in streaming mode (``keepHidden``,
  encoder_components.py:140-159).
- learned downsample conv (kernel = stride = 100//frame_hz, fixed by the
  checkpoint; reference train/encoder.py:33-34) + LayerNorm + GELU
  (reference: encoder_components.py:496-511).

Design deltas for TPU: pure functions over a params pytree; the GRU input
projection is hoisted out of the sequential scan; chunk processing is
batch-parallel over (streams x 2 channels) so the conv matmuls tile onto
the MXU.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vap_realtime_tpu.config import CPC_DOWNSAMPLE
from vap_realtime_tpu.ops.basic import (
    channel_norm, conv1d, gelu, layer_norm, lstm,
)

# (kernel, stride, padding) for the 5 CPC convs
# (reference: encoder_components.py:83-92).
CPC_CONV_SPECS = ((10, 5, 3), (8, 4, 2), (4, 2, 1), (4, 2, 1), (4, 2, 1))

Params = Dict[str, Any]


def init_cpc_encoder_params(rng: jax.Array, dim: int = 256,
                            downsample_kernel: int = 5,
                            dtype=jnp.float32) -> Params:
    """Random init with torch-default distributions (U(+-1/sqrt(fan_in)))."""
    keys = iter(jax.random.split(rng, 32))

    def unif(key, shape, fan_in):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    p: Params = {}
    in_ch = 1
    for i, (k, _s, _p) in enumerate(CPC_CONV_SPECS):
        fan = in_ch * k
        p[f"conv{i}"] = {"w": unif(next(keys), (dim, in_ch, k), fan),
                         "b": unif(next(keys), (dim,), fan)}
        p[f"norm{i}"] = {"w": jnp.ones((dim, 1), dtype),
                         "b": jnp.zeros((dim, 1), dtype)}
        in_ch = dim
    p["lstm"] = {
        "w_ih": unif(next(keys), (4 * dim, dim), dim),
        "w_hh": unif(next(keys), (4 * dim, dim), dim),
        "b_ih": unif(next(keys), (4 * dim,), dim),
        "b_hh": unif(next(keys), (4 * dim,), dim),
    }
    kd = downsample_kernel
    p["down_conv"] = {"w": unif(next(keys), (dim, dim, kd), dim * kd),
                      "b": unif(next(keys), (dim,), dim * kd)}
    p["down_ln"] = {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}
    return p


def cpc_conv_stack(params: Params, wav: jax.Array) -> jax.Array:
    """Strided conv stack: (B, L) waveform -> (B, N, C) features at 100 Hz.

    Each chunk is zero-padded at its own edges (torch conv padding), which
    is part of the reference's chunked-streaming numerics — chunk results
    differ from a seamless full-sequence conv near the edges, and the
    1:-1 trim removes exactly those frames.
    """
    x = wav[:, None, :]  # (B, 1, L)
    for i, (k, s, pad) in enumerate(CPC_CONV_SPECS):
        c, n = params[f"conv{i}"], params[f"norm{i}"]
        x = conv1d(x, c["w"], c["b"], stride=s, padding=pad)
        x = channel_norm(x, n["w"], n["b"])
        x = jax.nn.relu(x)
    return jnp.swapaxes(x, 1, 2)  # (B, N, C)


def cpc_context(params: Params, z: jax.Array, h0: jax.Array, c0: jax.Array):
    """LSTM context network over (B, T, C); returns (y (B,T,C), h_T, c_T)."""
    g = params["lstm"]
    return lstm(z, h0, c0, g["w_ih"], g["w_hh"], g["b_ih"], g["b_hh"])


def downsample(params: Params, z: jax.Array, kernel: int) -> jax.Array:
    """Learned downsample: conv(k=s=kernel) + LayerNorm + GELU.

    z: (B, T, C) -> (B, T//kernel, C).
    """
    d = params["down_conv"]
    x = jnp.swapaxes(z, 1, 2)  # (B, C, T)
    x = conv1d(x, d["w"], d["b"], stride=kernel, padding=0)
    x = jnp.swapaxes(x, 1, 2)  # (B, T', C)
    ln = params["down_ln"]
    x = layer_norm(x, ln["w"], ln["b"])
    return gelu(x)


def encode_chunk(params: Params, wav: jax.Array, h0: jax.Array,
                 c0: jax.Array, downsample_kernel: int):
    """Encode one model frame of audio into exactly ONE embedding.

    wav: (B, frame_samples) where frame_samples = 16000//frame_hz + 320.
    h0, c0: (B, C) carried LSTM state.

    Returns (emb (B, C), h_new, c_new).

    Pipeline = conv stack -> trim first/last frame -> LSTM -> downsample,
    matching the reference per-chunk path (rvap/vap_main/encoder.py:58-80);
    the chunk yields 100//frame_hz CPC frames which the downsample conv
    (kernel=stride=100//frame_hz) collapses to a single embedding.
    """
    z = cpc_conv_stack(params, wav)                  # (B, n, C)
    z = z[:, 1:-1, :]                                # edge trim (encoder.py:76)
    y, h_new, c_new = cpc_context(params, z, h0, c0)  # (B, n-2, C)
    e = downsample(params, y, downsample_kernel)     # (B, 1, C)
    return e[:, 0, :], h_new, c_new


# ---------------------------------------------------------------------------
# Seamless streaming conv (fast serving path)
# ---------------------------------------------------------------------------
# The reference recomputes a 320-sample left-context overlap through the
# conv stack every frame and trims the chunk-edge garbage (28% of the
# conv FLOPs, SURVEY §7.1 item 1).  The fast path instead carries each
# conv layer's last (kernel - stride) inputs across frames and runs a
# VALID convolution over only the NEW samples: mathematically identical
# to one seamless valid conv over the whole stream (ChannelNorm is
# per-time-step across channels, encoder_components.py:62-70, so it
# streams exactly).  Numerics differ from the reference's per-chunk
# zero-pad+trim recipe only near the stream start (zero carries ~ a
# k-s left pad) and by the 320-sample look-back alignment; the chunked
# path remains the parity oracle.

CPC_CONV_CARRY = tuple(k - s for k, s, _ in CPC_CONV_SPECS)  # (5,4,2,2,2)


def init_conv_stream_state(batch: int, dim: int = 256,
                           dtype=jnp.float32) -> Params:
    """Per-layer input tails for the seamless streaming conv stack.

    batch counts CHANNEL-streams (B*2 when called per stereo stream).

    Layout: c0 (batch, 1, 5) (single input channel); c1..c4 CHANNELS-
    LAST (batch, k-s, C).  The r4 NCW carries ((batch, C, 2)) put the
    2-element time dim on the LANE axis — XLA pads every lane tile to
    128, a 64x HBM expansion that cost ~8 GB at B=16,384 streams and
    set the measured serving capacity wall (r5 OOM dump).  Channels-
    last rows are padding-free; the NCW conv transposes these small
    tails in-step (micro-tensors).
    """
    st: Params = {"c0": jnp.zeros((batch, 1, CPC_CONV_CARRY[0]), dtype)}
    for i, c in enumerate(CPC_CONV_CARRY[1:], start=1):
        st[f"c{i}"] = jnp.zeros((batch, c, dim), dtype)
    return st


def cpc_conv_stack_streaming(params: Params, new: jax.Array,
                             state: Params):
    """Seamless strided conv over the NEW samples only.

    new: (B, L_new) with stride-aligned L_new (one frame's fresh samples,
    16000//frame_hz).  Returns ((B, L_new/160, C) features, new_state).
    """
    x = new[:, None, :]
    new_state: Params = {}
    for i, (k, s, _pad) in enumerate(CPC_CONV_SPECS):
        carry = state[f"c{i}"].astype(x.dtype)
        if i > 0:
            carry = jnp.swapaxes(carry, 1, 2)   # channels-last -> NCW
        x = jnp.concatenate([carry, x], axis=-1)
        tail = x[..., x.shape[-1] - (k - s):]
        new_state[f"c{i}"] = (tail if i == 0
                              else jnp.swapaxes(tail, 1, 2))
        c, n = params[f"conv{i}"], params[f"norm{i}"]
        x = conv1d(x, c["w"], c["b"], stride=s, padding=0)
        x = channel_norm(x, n["w"], n["b"])
        x = jax.nn.relu(x)
    return jnp.swapaxes(x, 1, 2), new_state  # (B, L_new/160, C)


def cpc_conv_stack_streaming_blocked(params: Params, new: jax.Array,
                                     state: Params):
    """Seamless strided conv over the NEW samples, channels-last blocked
    matmul formulation — numerically the same map as
    `cpc_conv_stack_streaming` (same f32-accumulated sums), shaped for
    the MXU.

    Every CPC conv has kernel = 2*stride (CPC_CONV_SPECS), so each
    output frame is the sum of exactly TWO (s*C_in, C_out) matmuls over
    adjacent stride-blocks.  Activations stay (B, T, C) channels-last
    throughout: the contraction dims (s, C_in) are the two minor dims,
    so no im2col patch materialization and no NCW<->NWC transposes —
    XLA's NCW conv lowering reached only ~60 TFLOP/s here (PERF.md r3).

    State layout is shared with the NCW path ((B, C_in, k-s) carries).
    """
    new_state: Params = {}

    def norm_relu_last(y, n):
        # single-stats-pass unbiased ChannelNorm over the channel axis
        # (= last dim here); see ops/basic.channel_norm
        C = y.shape[-1]
        s1 = jnp.sum(y, axis=-1, keepdims=True)
        s2 = jnp.sum(jnp.square(y), axis=-1, keepdims=True)
        mean = s1 / C
        var = jnp.maximum((s2 - C * jnp.square(mean)) / (C - 1), 0.0)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * n["w"][:, 0] + n["b"][:, 0]
        return jax.nn.relu(y)

    # layer 0 stays an NCW XLA conv: its channels-last form would put
    # C_in = 1 on the LANE dim, and TPU pads every lane tile to 128 —
    # a 128x memory blowup on the longest activation (the in-step
    # blocked stack measured 97.7 ms vs 6.9 before this split; the
    # one (B, 160, 256) transpose below is ~0.3 ms)
    k0, s0, _ = CPC_CONV_SPECS[0]
    xc0 = jnp.concatenate([state["c0"].astype(new.dtype),
                           new[:, None, :]], axis=-1)     # (B, 1, L0)
    new_state["c0"] = xc0[..., xc0.shape[-1] - (k0 - s0):]
    c0, n0 = params["conv0"], params["norm0"]
    y0 = conv1d(xc0, c0["w"], c0["b"], stride=s0, padding=0)
    y0 = jnp.swapaxes(y0, 1, 2).astype(jnp.float32)       # (B, T0, C)
    x = norm_relu_last(y0, n0).astype(new.dtype)

    for i, (k, s, _pad) in enumerate(CPC_CONV_SPECS):
        if i == 0:
            continue
        assert k == 2 * s, "blocked formulation assumes kernel = 2*stride"
        carry = state[f"c{i}"]                        # (B, k-s, C_in)
        xc = jnp.concatenate([carry.astype(x.dtype), x], axis=1)
        new_state[f"c{i}"] = xc[:, -(k - s):, :]
        B, L, Cin = xc.shape
        n_blk = L // s
        n_out = n_blk - 1
        xb = xc[:, :n_blk * s].reshape(B, n_blk, s * Cin)
        c, n = params[f"conv{i}"], params[f"norm{i}"]
        wt = jnp.transpose(c["w"], (2, 1, 0))         # (K, C_in, C_out)
        w0 = wt[:s].reshape(s * Cin, -1)
        w1 = wt[s:].reshape(s * Cin, -1)
        # Both matmuls run over the FULL contiguous block tensor and the
        # one-block shift happens on their narrow (C_out) OUTPUTS —
        # r3's version shifted the (s*C_in)-wide INPUT slices instead,
        # which XLA materialized as two near-full copies of the widest
        # activation (the 16.4 ms negative in PERF.md r3).
        # explicit 2-D dot_general: the 3-D einsum form let XLA assign
        # B-minormost layouts to the whole chain and lower the matmuls
        # as (20x slower) fusions instead of MXU dots (r4 trace)
        xb2 = xb.reshape(B * n_blk, s * Cin)
        dn = (((1,), (0,)), ((), ()))
        z0 = jax.lax.dot_general(
            xb2, w0, dn,
            preferred_element_type=jnp.float32).reshape(B, n_blk, -1)
        z1 = jax.lax.dot_general(
            xb2, w1, dn,
            preferred_element_type=jnp.float32).reshape(B, n_blk, -1)
        y = z0[:, :n_out] + z1[:, 1:] + c["b"].astype(jnp.float32)
        x = norm_relu_last(y, n).astype(xc.dtype)
    return x, new_state                               # (B, L/160, C)


def cpc_conv_stack_streaming_normk(params: Params, new: jax.Array,
                                   state: Params):
    """`cpc_conv_stack_streaming` with the ChannelNorm + ReLU between
    convs fused into ONE HBM pass each (ops/pallas/channorm.py) — the
    r5 device trace pinned XLA's separate stats/apply norm passes at
    ~6.3 ms/step at B=4096 streams, most of the encoder cost.  Convs
    stay XLA NCW; numerics identical to the "conv" impl."""
    from vap_realtime_tpu.ops.pallas.channorm import channel_norm_relu

    x = new[:, None, :]
    new_state: Params = {}
    for i, (k, s, _pad) in enumerate(CPC_CONV_SPECS):
        carry = state[f"c{i}"].astype(x.dtype)
        if i > 0:
            carry = jnp.swapaxes(carry, 1, 2)
        x = jnp.concatenate([carry, x], axis=-1)
        tail = x[..., x.shape[-1] - (k - s):]
        new_state[f"c{i}"] = (tail if i == 0
                              else jnp.swapaxes(tail, 1, 2))
        c, n = params[f"conv{i}"], params[f"norm{i}"]
        x = conv1d(x, c["w"], c["b"], stride=s, padding=0)
        x = channel_norm_relu(x, n["w"], n["b"])
    return jnp.swapaxes(x, 1, 2), new_state  # (B, L_new/160, C)


def encode_chunk_streaming(params: Params, new: jax.Array, conv_state: Params,
                           h0: jax.Array, c0: jax.Array,
                           downsample_kernel: int,
                           conv_impl: str = "conv"):
    """Fast-path chunk encoder: ONLY the frame's fresh samples.

    new: (B, 16000//frame_hz); h0, c0: (B, C) LSTM state.
    Returns (emb (B, C), new_conv_state, h_new, c_new).

    vs `encode_chunk`: no overlap recompute, no per-chunk zero-pad
    edges, no 1:-1 trim (there are no edges to trim) — each frame costs
    ~72% of the chunked conv FLOPs and its embedding summarizes audio
    ending at the frame boundary (the chunked path's embedding ends 320
    samples later; one-off alignment, documented fast-path semantics).

    conv_impl: "conv" (XLA NCW convs), "blocked" (channels-last
    stride-block matmuls — same math/state, MXU-shaped; see
    `cpc_conv_stack_streaming_blocked`), or "fused" (the whole stack in
    ONE Pallas kernel, channels-last carries — ops/pallas/encoder.py;
    state from init_conv_stream_state_fused).
    """
    if conv_impl == "fused":
        from vap_realtime_tpu.ops.pallas.encoder import (
            cpc_conv_stack_streaming_fused,
        )
        z, conv_state = cpc_conv_stack_streaming_fused(
            params, new, conv_state)
    else:
        stack = {"blocked": cpc_conv_stack_streaming_blocked,
                 "normk": cpc_conv_stack_streaming_normk,
                 }.get(conv_impl, cpc_conv_stack_streaming)
        z, conv_state = stack(params, new, conv_state)
    y, h_new, c_new = cpc_context(params, z, h0, c0)
    e = downsample(params, y, downsample_kernel)
    return e[:, 0, :], conv_state, h_new, c_new


def encode_sequence_streaming_oracle(params: Params, wav: jax.Array,
                                     downsample_kernel: int) -> jax.Array:
    """Reference implementation of the streaming-conv numerics: ONE
    seamless valid conv over the whole stream with a (k-s) zero left pad
    per layer (== running `encode_chunk_streaming` frame by frame).
    Test oracle only.
    """
    x = wav[:, None, :]
    for i, (k, s, _pad) in enumerate(CPC_CONV_SPECS):
        pad = jnp.zeros(x.shape[:-1] + (k - s,), x.dtype)
        x = jnp.concatenate([pad, x], axis=-1)
        c, n = params[f"conv{i}"], params[f"norm{i}"]
        x = conv1d(x, c["w"], c["b"], stride=s, padding=0)
        x = channel_norm(x, n["w"], n["b"])
        x = jax.nn.relu(x)
    z = jnp.swapaxes(x, 1, 2)
    zeros = jnp.zeros((wav.shape[0], z.shape[-1]), z.dtype)
    y, _, _ = cpc_context(params, z, zeros, zeros)
    return downsample(params, y, downsample_kernel)


def encode_sequence_limited(params: Params, wav: jax.Array,
                            downsample_kernel: int,
                            limit_sec: float,
                            sample_rate: int = 16000) -> jax.Array:
    """Truncated-context encoding (train/encoder.py:119-247
    `lim_context_sec` mode): each output frame's embedding is recomputed
    from only the trailing `limit_sec` of audio, so the CPC context never
    sees further back than the limit.

    wav: (B, L) -> (B, T_frames, C).  T_frames matches `encode_sequence`.
    Implemented as a scan over frame-aligned windows (the reference loops
    in Python with a disk cache; here one compiled scan).
    """
    hop = CPC_DOWNSAMPLE * downsample_kernel          # samples per frame
    L = wav.shape[1]
    n_frames = (L // CPC_DOWNSAMPLE - 2) // downsample_kernel
    win = int(limit_sec * sample_rate)
    win = max((win // hop) * hop, hop * 2)            # frame-aligned
    pad = jnp.zeros((wav.shape[0], win), wav.dtype)
    wav_p = jnp.concatenate([pad, wav], axis=1)

    def body(_, t):
        # window ending at the audio consumed by frame t
        end = win + (t + 1) * hop + 2 * CPC_DOWNSAMPLE
        start = end - win - 2 * CPC_DOWNSAMPLE
        chunk = jax.lax.dynamic_slice_in_dim(
            wav_p, start, win + 2 * CPC_DOWNSAMPLE, axis=1)
        e = encode_sequence(params, chunk, downsample_kernel)
        return None, e[:, -1, :]

    _, es = jax.lax.scan(body, None, jnp.arange(n_frames))
    return jnp.swapaxes(es, 0, 1)                     # (B, T, C)


def encode_sequence(params: Params, wav: jax.Array,
                    downsample_kernel: int) -> jax.Array:
    """Full-sequence (training/offline-batch) encoding.

    wav: (B, L) -> (B, T_frames, C) with the train-side arithmetic
    (reference: train/encoder.py / train/model.py): one seamless conv over
    the whole waveform, trim, LSTM from zero state, strided downsample.
    """
    z = cpc_conv_stack(params, wav)
    z = z[:, 1:-1, :]
    zeros = jnp.zeros((wav.shape[0], z.shape[-1]), z.dtype)
    y, _, _ = cpc_context(params, z, zeros, zeros)
    return downsample(params, y, downsample_kernel)
