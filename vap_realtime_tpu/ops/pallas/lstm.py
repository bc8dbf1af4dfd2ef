"""Pallas TPU kernel: fused short-sequence LSTM scan.

The CPC context net runs a 1-layer LSTM for only 100//frame_hz steps per
chunk (5 at 20 Hz).  As XLA HLOs the 5 tiny recurrent matmuls
((B, 256) x (256, 1024)) are dispatch/layout dominated; this kernel keeps
(h, c) and the recurrent weights in VMEM for the whole scan — one fused
pass per stream block.

The input projection ``x @ W_ih + b_ih`` is still done OUTSIDE (one big
MXU-friendly (B*T, 256) x (256, 1024) matmul); the kernel consumes the
precomputed gates, matching `ops.basic.lstm`'s hoisting.

Gate order i, f, g, o (torch convention — encoder_components.py LSTM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(gi_ref, h0_ref, c0_ref, whh_ref, bhh_ref,
                 ys_ref, h_ref, c_ref, *, T: int, H: int):
    h = h0_ref[:].astype(jnp.float32)
    c = c0_ref[:].astype(jnp.float32)
    w = whh_ref[:].astype(jnp.float32)        # (H, 4H) pre-transposed
    b = bhh_ref[:].astype(jnp.float32)        # (1, 4H)

    for t in range(T):  # static unroll: T is 2..20
        g = gi_ref[:, t, :].astype(jnp.float32) + b
        g = g + jnp.dot(h, w, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        ys_ref[:, t, :] = h.astype(ys_ref.dtype)
    h_ref[:] = h.astype(h_ref.dtype)
    c_ref[:] = c.astype(c_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def lstm_scan(gi_seq: jax.Array, h0: jax.Array, c0: jax.Array,
              w_hh_t: jax.Array, b_hh: jax.Array,
              block_b: int = 128, interpret: bool = False):
    """Fused LSTM over precomputed input gates.

    gi_seq: (B, T, 4H) = x @ W_ih.T + b_ih;  h0, c0: (B, H);
    w_hh_t: (H, 4H) — TRANSPOSED recurrent weights; b_hh: (4H,).
    Returns (ys (B, T, H), h_T, c_T).
    """
    B, T, H4 = gi_seq.shape
    H = H4 // 4
    block_b = min(block_b, B)
    grid = (-(-B // block_b),)

    ys, h_t, c_t = pl.pallas_call(
        functools.partial(_lstm_kernel, T=T, H=H),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, H), gi_seq.dtype),
            jax.ShapeDtypeStruct((B, H), h0.dtype),
            jax.ShapeDtypeStruct((B, H), c0.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, T, H4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, T, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(gi_seq, h0, c0, w_hh_t, b_hh.reshape(1, H4))
    return ys, h_t, c_t


def lstm_pallas(x: jax.Array, h0: jax.Array, c0: jax.Array,
                w_ih: jax.Array, w_hh: jax.Array, b_ih: jax.Array,
                b_hh: jax.Array, interpret: bool = False):
    """Drop-in replacement for ops.basic.lstm using the fused kernel."""
    gi = jnp.matmul(x, w_ih.T) + b_ih
    return lstm_scan(gi, h0, c0, jnp.asarray(w_hh).T, b_hh,
                     interpret=interpret)
