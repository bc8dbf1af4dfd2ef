"""Fused CPC streaming conv stack — ONE Pallas TPU kernel for conv0..4.

The fast serving path's encoder (models/encoder.py
`cpc_conv_stack_streaming`, behavioural contract
rvap/vap_main/encoder_components.py:73-104) runs five strided convs each
followed by ChannelNorm + ReLU.  As XLA NCW HLOs every layer round-trips
its activations through HBM and the channel-dim norm reductions land on
the sublane axis — the r5 device trace pins the five norm stats/apply
passes alone at ~6.3 ms/step at B=4096 (norm0 apply 2.0 ms, norm1 stats
1.8 ms, ...), most of the 7.2 ms encoder.

This kernel runs the WHOLE stack per batch block inside VMEM:

- conv0 (k10 s5, 1 input channel) becomes one (Bb*T0, 10) x (10, 256)
  MXU matmul over patch rows built OUTSIDE the kernel (two reshapes of
  the raw (B, L+5) waveform — 20x smaller than the conv0 OUTPUT, which
  never touches HBM here);
- conv1..4 (k = 2s) are tap-decomposed: out[t] = sum_j x[s*t + j] @ W_j,
  each tap a stride-s slice followed by a clean (Bb*T_out, 256) x
  (256, 256) MXU matmul with f32 accumulation;
- ChannelNorm (single-stats-pass, UNBIASED variance, clamped — same
  formulation as ops/basic.channel_norm) + ReLU run on the VPU over
  CHANNELS-LAST (lane-axis) activations, so the stats are lane
  reductions, and no intermediate activation ever leaves VMEM;
- the per-layer streaming carries (the (k-s)-frame input tails,
  models/encoder.py CPC_CONV_CARRY) ride in channels-last (B, k-s, C)
  and the new tails come back as extra kernel outputs.

Numerics vs the NCW streaming stack: identical math with HIGHER
intermediate precision (bias-add and tap accumulation in f32 where the
XLA path rounds each conv output to bf16 before bias/norm) — exact on
f32, <= ~1e-2 absolute on bf16 activations
(tests/test_pallas.py::test_fused_encoder_*).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (kernel, stride) of conv0..conv4 (encoder_components.py:83-92)
CONV0_K, CONV0_S = 10, 5
TAIL_KS = ((8, 4), (4, 2), (4, 2), (4, 2))
C = 256

Params = Dict[str, Any]


def tail_lens(T0: int):
    """Per-layer (T_in, T_out) of the tail given conv0's output length
    (T_in includes the (k-s)-row carry; valid conv, stride s)."""
    lens = []
    T = T0
    for k, s in TAIL_KS:
        T_in = T + (k - s)
        assert T_in % s == 0, (T0, T_in, s)
        T = T_in // s - 1
        lens.append((T_in, T))
    return lens


def _cnorm_relu(y, w, b, dt):
    """ChannelNorm over the lane axis (UNBIASED variance, clamped,
    matching ops/basic.channel_norm) + ReLU.  y (Bb, T, C) f32;
    w/b (1, 1, C) already cast to dt.  Returns dt."""
    n = y.shape[-1]
    s1 = jnp.sum(y, axis=-1, keepdims=True)
    s2 = jnp.sum(y * y, axis=-1, keepdims=True)
    mean = s1 / n
    var = jnp.maximum((s2 - n * mean * mean) / (n - 1), 0.0)
    z = ((y - mean) * jax.lax.rsqrt(var + 1e-5)).astype(dt) * w + b
    return jnp.maximum(z, jnp.zeros((), dt))


def _kernel(P_ref, c1_ref, c2_ref, c3_ref, c4_ref, w0_ref, wt_ref,
            aux_ref, z_ref, n1_ref, n2_ref, n3_ref, n4_ref, *, T0: int):
    dt = P_ref.dtype
    f32 = jnp.float32
    Bb, _, K0 = P_ref.shape

    def aux(i):
        # (1, 1, C) row of the packed f32 aux table
        return aux_ref[i:i + 1][:, None, :]

    # conv0: one (Bb*T0, 10) x (10, 256) matmul, f32 accumulation
    a = jax.lax.dot_general(
        P_ref[:].reshape(Bb * T0, K0), w0_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(Bb, T0, C)
    a = _cnorm_relu(a + aux(0), aux(1).astype(dt), aux(2).astype(dt), dt)

    carries_in = (c1_ref, c2_ref, c3_ref, c4_ref)
    carries_out = (n1_ref, n2_ref, n3_ref, n4_ref)
    x = a
    tap = 0
    for li, (k, s) in enumerate(TAIL_KS):
        x = jnp.concatenate([carries_in[li][:], x], axis=1)
        carries_out[li][:] = x[:, -(k - s):, :]
        T_in = x.shape[1]
        G = T_in // s
        T_out = G - 1
        # phase view: x4[:, u, p, :] = x[:, s*u + p, :] — Mosaic supports
        # the second-minor split + unit slices; stride-s slices it does
        # not (vector.extract_strided_slice is stride<2 only)
        x4 = x.reshape(Bb, G, s, C)
        acc = None
        for j in range(k):
            ph, blk = j % s, j // s
            seg = x4[:, blk:blk + T_out, ph, :]      # (Bb, T_out, C)
            t = jax.lax.dot_general(
                seg.reshape(Bb * T_out, C), wt_ref[tap + j],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            acc = t if acc is None else acc + t
        tap += k
        y = acc.reshape(Bb, T_out, C) + aux(3 * (li + 1))
        x = _cnorm_relu(y, aux(3 * (li + 1) + 1).astype(dt),
                        aux(3 * (li + 1) + 2).astype(dt), dt)
    z_ref[:] = x


@functools.partial(jax.jit,
                   static_argnames=("block_b", "interpret"))
def conv_stack_fused_call(P: jax.Array, carries: Tuple[jax.Array, ...],
                          w0: jax.Array, wt: jax.Array, aux: jax.Array,
                          block_b: int = 16, interpret: bool = False):
    """pallas_call wrapper: P (B, T0, 10) conv0 patches; carries
    (c1 (B, 4, C), c2/c3/c4 (B, 2, C)) channels-last input tails;
    w0 (10, C); wt (20, C, C) tap-major packed conv1..4 weights;
    aux (15, C) f32 = [b0, nw0, nb0, b1, nw1, nb1, ...].

    Returns (z (B, T4, C), new c1..c4)."""
    B, T0, K0 = P.shape
    lens = tail_lens(T0)
    T4 = lens[-1][1]
    Bb = min(block_b, B)
    while B % Bb:
        Bb //= 2
    interpret = interpret or jax.default_backend() == "cpu"
    dt = P.dtype

    grid = (B // Bb,)
    bspec = lambda t: pl.BlockSpec((Bb, t, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((Bb, T0, K0), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),            # P
        bspec(4), bspec(2), bspec(2), bspec(2),           # carries
        pl.BlockSpec((K0, C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # w0
        pl.BlockSpec((20, C, C), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),            # wt
        pl.BlockSpec((15, C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # aux
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, T4, C), dt),
        jax.ShapeDtypeStruct((B, 4, C), dt),
        jax.ShapeDtypeStruct((B, 2, C), dt),
        jax.ShapeDtypeStruct((B, 2, C), dt),
        jax.ShapeDtypeStruct((B, 2, C), dt),
    ]
    out_specs = [bspec(T4), bspec(4), bspec(2), bspec(2), bspec(2)]
    z, n1, n2, n3, n4 = pl.pallas_call(
        functools.partial(_kernel, T0=T0),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(P, *carries, w0, wt, aux)
    return z, (n1, n2, n3, n4)


def pack_fused_params(enc: Params):
    """Encoder params pytree -> (w0, wt, aux) kernel operands.

    w0: conv0 weight (C_out, 1, 10) -> (10, C); wt: conv1..4 weights
    (C_out, C_in, k) -> tap-major (k, C_in, C_out) stacked to (20, C, C)
    in the params dtype; aux (15, C) f32 = per-layer [bias, norm w,
    norm b] rows (ChannelNorm affine stored (C, 1))."""
    w0 = jnp.transpose(enc["conv0"]["w"][:, 0, :], (1, 0))      # (10, C)
    wt = jnp.concatenate(
        [jnp.transpose(enc[f"conv{i}"]["w"], (2, 1, 0))
         for i in range(1, 5)], axis=0)                         # (20, C, C)
    rows = []
    for i in range(5):
        rows += [enc[f"conv{i}"]["b"],
                 enc[f"norm{i}"]["w"][:, 0], enc[f"norm{i}"]["b"][:, 0]]
    aux = jnp.stack([jnp.asarray(r, jnp.float32) for r in rows])  # (15, C)
    return w0, wt, aux


def conv0_patches(xc0: jax.Array):
    """(B, L+5) carry-prefixed waveform -> (B, L/5, 10) conv0 patch rows
    (P[b, t, :] = xc0[b, 5t : 5t+10]) via two reshapes + one concat —
    cheap XLA ops on the raw waveform."""
    B, Lp = xc0.shape
    T0 = (Lp - CONV0_S) // CONV0_S
    xr = xc0.reshape(B, T0 + 1, CONV0_S)
    return jnp.concatenate([xr[:, :T0], xr[:, 1:]], axis=-1)


def cpc_conv_stack_streaming_fused(params: Params, new: jax.Array,
                                   state: Params, block_b: int = 16):
    """Drop-in replacement for models/encoder.cpc_conv_stack_streaming
    with the fused kernel: new (B, L) fresh samples, state carries
    channels-last ({"c0": (B, 1, 5)} + {"c1": (B, 4, C), "c2".."c4":
    (B, 2, C)}).  Returns ((B, L/160, C) features, new_state)."""
    dt = new.dtype
    xc0 = jnp.concatenate([state["c0"][:, 0, :].astype(dt), new], axis=-1)
    P = conv0_patches(xc0)
    w0, wt, aux = pack_fused_params(params)
    z, tails = conv_stack_fused_call(
        P, tuple(state[f"c{i}"].astype(dt) for i in range(1, 5)),
        w0.astype(dt), wt.astype(dt), aux, block_b=block_b)
    new_state = {"c0": xc0[:, None, -CONV0_S:]}
    for i, t in enumerate(tails):
        new_state[f"c{i + 1}"] = t
    return z, new_state


def init_conv_stream_state_fused(batch: int, dim: int = C,
                                 dtype=jnp.float32) -> Params:
    """Channels-last streaming carries for the fused kernel (same
    information as models/encoder.init_conv_stream_state, transposed)."""
    st: Params = {"c0": jnp.zeros((batch, 1, CONV0_S), dtype)}
    for i, (k, s) in enumerate(TAIL_KS):
        st[f"c{i + 1}"] = jnp.zeros((batch, k - s, dim), dtype)
    return st
