"""Pallas TPU kernel: fused CPC conv-stack tail (conv1..conv4).

The CPC encoder's conv1..conv4 (256ch, k8s4 / k4s2 x3, each followed by
ChannelNorm + ReLU; reference encoder_components.py:85-104) dominate the
encoder FLOPs.  As separate XLA HLOs each conv round-trips its
activations through HBM; this kernel keeps the whole tail in VMEM.

Key reformulation — conv as a PHASE-DECOMPOSED sum of dense matmuls:
for stride s and kernel k, pad the input to length s*ceil((L+2p)/s),
reshape (B, L', C) -> (B, L'/s, s, C) so that row t, phase j holds input
position s*t + j.  Output position t needs inputs s*t + (i - p) for tap
i; writing i - p = s*a + j splits each tap into a block-shift `a` and a
phase `j`, so

    out[t] = sum_{a, j} x_r[:, t+a, j, :] @ W[s*a + j + p]

— every term is a static slice followed by a clean (B*T, 256) x
(256, 256) MXU matmul.  No gathers, no strided access, no im2col
materialization.

ChannelNorm (over the 256-lane axis, UNBIASED variance, eps 1e-5 —
encoder_components.py:62-70) and ReLU run on the VPU between matmuls.

Layout contract: activations here are (B, T, C) with C=256 lanes — the
transpose of the reference's (B, C, T).  The wrapper `cpc_conv_tail`
takes/returns (B, T, C).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (kernel, stride, padding) of conv1..conv4 (encoder_components.py:85-92)
TAIL_SPECS = ((8, 4, 2), (4, 2, 1), (4, 2, 1), (4, 2, 1))


def tail_out_len(L0: int) -> List[int]:
    """Output lengths after each tail conv given conv0's output length."""
    lens = []
    L = L0
    for k, s, p in TAIL_SPECS:
        L = (L + 2 * p - k) // s + 1
        lens.append(L)
    return lens


def _phase_conv(x: jax.Array, w_taps: jax.Array, b: jax.Array,
                k: int, s: int, p: int, L_out: int) -> jax.Array:
    """One phase-decomposed conv inside the kernel.

    x: (B, L, C) f32 VMEM value; w_taps: (k, C, C); b: (C,).
    Returns (B, L_out, C) f32.
    """
    B, L, C = x.shape
    Lp = L + 2 * p
    groups = -(-Lp // s)  # ceil
    pad_total = groups * s - Lp
    # left pad p, right pad p + alignment
    x = jnp.pad(x, ((0, 0), (p, p + pad_total), (0, 0)))
    x_r = x.reshape(B, groups, s, C)

    out = jnp.zeros((B, L_out, C), jnp.float32) + b[None, None, :]
    for i in range(k):
        a, j = divmod(i, s)
        term = jax.lax.dot_general(
            x_r[:, a:a + L_out, j, :], w_taps[i],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + term
    return out


def _channel_norm_relu(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """ChannelNorm over the lane axis (unbiased var) + ReLU."""
    C = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    cent = x - mean
    var = jnp.sum(cent * cent, axis=-1, keepdims=True) / (C - 1)
    y = cent * jax.lax.rsqrt(var + 1e-5) * w[None, None, :] + b[None, None, :]
    return jnp.maximum(y, 0.0)


def _tail_kernel(x_ref, *refs, L0: int, n_layers: int = 4):
    """refs = [w1..w4, b1..b4, nw1..nw4, nb1..nb4, out_ref]."""
    ws = refs[0:n_layers]
    bs = refs[n_layers:2 * n_layers]
    nws = refs[2 * n_layers:3 * n_layers]
    nbs = refs[3 * n_layers:4 * n_layers]
    out_ref = refs[4 * n_layers]

    x = x_ref[:].astype(jnp.float32)
    lens = tail_out_len(L0)
    for li, (k, s, p) in enumerate(TAIL_SPECS):
        x = _phase_conv(x, ws[li][:].astype(jnp.float32),
                        bs[li][:].astype(jnp.float32), k, s, p, lens[li])
        x = _channel_norm_relu(x, nws[li][:].astype(jnp.float32),
                               nbs[li][:].astype(jnp.float32))
    out_ref[:] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def cpc_conv_tail(x0: jax.Array, tail_params: Tuple[jax.Array, ...],
                  block_b: int = 8, interpret: bool = False) -> jax.Array:
    """conv1..conv4 (+ChannelNorm+ReLU each) fused in one Pallas kernel.

    x0: (B, L0, C) — conv0's normalized/ReLU'd output, time-major.
    tail_params: flat tuple (w1..w4, b1..b4, nw1..nw4, nb1..nb4) with
    w_i of shape (k_i, C, C) (tap-major; see `pack_tail_params`).
    Returns (B, L4, C).
    """
    B, L0, C = x0.shape
    L4 = tail_out_len(L0)[-1]
    grid = (-(-B // block_b),)

    in_specs = [pl.BlockSpec((block_b, L0, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    # weights: full arrays, replicated across grid
    for p in tail_params:
        nd = p.ndim
        in_specs.append(pl.BlockSpec(
            p.shape, (lambda i, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM))

    return pl.pallas_call(
        functools.partial(_tail_kernel, L0=L0),
        out_shape=jax.ShapeDtypeStruct((B, L4, C), x0.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, L4, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x0, *tail_params)


def pack_tail_params(enc_params: Dict[str, Any]) -> Tuple[jax.Array, ...]:
    """Encoder params pytree -> flat tail tuple for `cpc_conv_tail`.

    Conv weights stored torch-style (C_out, C_in, k) become tap-major
    (k, C_in, C_out) so each tap is a clean (C_in, C_out) matmul operand.
    ChannelNorm affine params stored (C, 1) become (C,).
    """
    ws, bs, nws, nbs = [], [], [], []
    for li in range(1, 5):
        w = jnp.asarray(enc_params[f"conv{li}"]["w"])   # (Co, Ci, k)
        ws.append(jnp.transpose(w, (2, 1, 0)))           # (k, Ci, Co)
        bs.append(jnp.asarray(enc_params[f"conv{li}"]["b"]))
        nws.append(jnp.asarray(enc_params[f"norm{li}"]["w"])[:, 0])
        nbs.append(jnp.asarray(enc_params[f"norm{li}"]["b"])[:, 0])
    return tuple(ws + bs + nws + nbs)
