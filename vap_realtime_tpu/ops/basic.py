"""Functional building-block ops with exact PyTorch numerical semantics.

These are the numerical contracts the parity tests pin down (SURVEY.md §7.3):

- `channel_norm`: per-timestep norm over the channel axis with *unbiased*
  variance (torch ``x.var`` default), eps 1e-5
  (reference: rvap/vap_main/encoder_components.py:62-70).
- `gelu`: exact erf formulation (torch ``nn.GELU`` default), NOT the tanh
  approximation (jax.nn.gelu's default).
- `gru_cell`: PyTorch gate order (r, z, n) and update
  ``h' = (1-z)*n + z*h`` (reference uses ``nn.GRU``,
  encoder_components.py:129-131).
- `linear`: torch layout ``y = x @ W.T + b`` with W of shape (out, in).
- `conv1d`: torch NCW / OIW layout.

All functions are shape-polymorphic over leading batch dims where noted and
contain no Python control flow on traced values, so they jit/vmap/shard
cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """x: (..., in), w: (out, in) torch layout, b: (out,) or None."""
    y = jnp.matmul(x, w.T)
    if b is not None:
        y = y + b
    return y


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — matches torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis; biased variance (torch LayerNorm)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * w + b


def channel_norm(x: jax.Array, w: jax.Array, b: jax.Array,
                 eps: float = 1e-5) -> jax.Array:
    """ChannelNorm over axis -2 (channels) of (..., C, T) with UNBIASED
    variance — the reference uses ``x.var(dim=1)`` whose default is the
    N-1 normalizer (encoder_components.py:62-70).

    w, b: (C, 1) affine parameters (stored torch-style as (1, C, 1); pass
    any shape broadcastable against (..., C, T)).
    """
    n = x.shape[-2]
    # single-stats-pass formulation: sum and sum-of-squares come out of
    # ONE read of x (XLA fuses the two reductions), vs mean-then-
    # centered-variance's two.  The norm passes over the big early conv
    # activations are bandwidth-bound (~4 ms/step of the serving
    # encoder at B=4096, PERF.md r3), so one fewer pass matters.
    # E[x^2] - E[x]^2 cancellation is benign here: activations are O(1)
    # and stats accumulate in f32 (golden parity stays at 1e-4).
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=-2, keepdims=True)
    s2 = jnp.sum(jnp.square(xf), axis=-2, keepdims=True)
    mean = s1 / n
    # unbiased variance: (sum(x^2) - n*mean^2) / (N - 1)
    var = (s2 - n * jnp.square(mean)) / max(n - 1, 1)
    # cancellation can push the single-pass variance slightly negative on
    # near-constant channel vectors; clamp so rsqrt(var+eps) can't NaN
    var = jnp.maximum(var, 0.0)
    rstd = lax.rsqrt(var + eps)
    return ((xf - mean) * rstd).astype(x.dtype) * w + b


def conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None,
           stride: int, padding: int) -> jax.Array:
    """1-D convolution, torch semantics.

    x: (B, C_in, L); w: (C_out, C_in, K); b: (C_out,) or None.
    Returns (B, C_out, L_out), L_out = floor((L + 2p - K)/s) + 1.
    """
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def gru_cell(x: jax.Array, h: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
             b_ih: jax.Array, b_hh: jax.Array) -> jax.Array:
    """One PyTorch-convention GRU step.

    x: (..., in), h: (..., hidden).
    w_ih: (3H, in), w_hh: (3H, H), biases (3H,) — rows ordered [r; z; n].
    """
    H = h.shape[-1]
    gi = jnp.matmul(x, w_ih.T) + b_ih
    gh = jnp.matmul(h, w_hh.T) + b_hh
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru(x: jax.Array, h0: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
        b_ih: jax.Array, b_hh: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Single-layer batch-first GRU over a sequence via `lax.scan`.

    x: (B, T, in), h0: (B, H). Returns (outputs (B, T, H), h_T (B, H)).

    The time axis is scanned (sequential dependence); the input projection
    ``x @ W_ih.T`` is hoisted out of the scan so the big matmul runs as one
    MXU-friendly (B*T, in) x (in, 3H) contraction and only the small
    recurrent matmul stays sequential.
    """
    gi_seq = jnp.matmul(x, w_ih.T) + b_ih  # (B, T, 3H)
    H = h0.shape[-1]

    def step(h, gi):
        gh = jnp.matmul(h, w_hh.T) + b_hh
        i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
        h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    # scan over time: move T to the front
    h_t, ys = lax.scan(step, h0, jnp.swapaxes(gi_seq, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_t


def lstm_cell(gi: jax.Array, h: jax.Array, c: jax.Array, w_hh: jax.Array,
              b_hh: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One PyTorch-convention LSTM step given the precomputed input gates.

    gi: (..., 4H) = x @ W_ih.T + b_ih; gates ordered [i; f; g; o]
    (torch nn.LSTM convention).  Returns (h', c').
    """
    H = h.shape[-1]
    g = gi + jnp.matmul(h, w_hh.T) + b_hh
    i = jax.nn.sigmoid(g[..., :H])
    f = jax.nn.sigmoid(g[..., H:2 * H])
    gg = jnp.tanh(g[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(g[..., 3 * H:])
    c_new = f * c + i * gg
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm(x: jax.Array, h0: jax.Array, c0: jax.Array, w_ih: jax.Array,
         w_hh: jax.Array, b_ih: jax.Array, b_hh: jax.Array
         ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Single-layer batch-first LSTM via `lax.scan` (torch gate order i,f,g,o).

    x: (B, T, in); h0, c0: (B, H).  Returns (ys (B, T, H), h_T, c_T).
    The input projection is hoisted out of the scan (one MXU contraction).
    """
    gi_seq = jnp.matmul(x, w_ih.T) + b_ih  # (B, T, 4H)

    def step(carry, gi):
        h, c = carry
        h_new, c_new = lstm_cell(gi, h, c, w_hh, b_hh)
        return (h_new, c_new), h_new

    (h_t, c_t), ys = lax.scan(step, (h0, c0), jnp.swapaxes(gi_seq, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_t, c_t


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x, axis=axis)
