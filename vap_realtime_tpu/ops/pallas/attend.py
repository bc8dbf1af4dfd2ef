"""Fused single-query KV-step attention — Pallas TPU kernel.

The incremental serving step (runtime/incremental.py `_kv_core`) issues
14 single-query attentions per frame over slices of the fused
(B, T, 28*D) cache.  XLA's lowering of the per-head einsums
("bhd,bthd->bht" with head_dim 64) relayouts to 64-lane tiles and runs
~4x slower than the raw cache-read bound (measured r2: 30 ms for the 14
attends at B=4096 vs 8.5 ms to stream the same bytes).

This kernel keeps every tensor at the native 256-lane width and reduces
over heads with tiny one-hot "group" matmuls instead of reshaping to
(H, Dh):

    s[b,t,h]   = (sum_d q[b,d] k[b,t,d] G[d,h]) * scale - age[b,t] m_h
    w          = softmax over the T cached rows + the current position
    out[b,d]   = sum_t w[b,t,head(d)] v[b,t,d]  (+ current-position term)

All reads (k, v blocks) stream HBM->VMEM once; softmax runs in fp32;
no intermediate ever round-trips HBM.  One `pallas_call` handles one
k/v slot pair; the caller loops over the 14 pairs (they are chained by
the transformer anyway).

Matches the semantics of `_kv_core.attend` exactly (age bias, dead-row
masking, distance-only AliBi, deferred current-position write);
reference attention contract: rvap/vap_main/modules.py:113-212.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEAD = 1e9  # age marker for invalid cache rows (bias -> -inf)


def _attend_math(q, k, v, kc, vc, age, *, H: int, scale: float,
                 out_dtype):
    """Single-set fused attend math (shared by both kernel bodies).

    q/kc/vc: (Bb, D); k/v: (Bb, T, D); age: (Bb, T) f32.  Head-group
    reductions ride tiny one-hot matmuls so every tensor keeps the
    native 256-lane width (no (H, Dh) relayouts).
    """
    Bb, T, D = k.shape
    f32 = jnp.float32

    # one-hot head-group matrix (D, H): G[d, h] = 1 iff d in head h
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    G = (d_ids // (D // H) == h_ids).astype(f32)
    # AliBi slopes, closed form for power-of-2 H: m_h = 2^(-8(h+1)/H)
    # (ofirpress/attention_with_linear_biases; modules.py:126-159) —
    # computed in-kernel (pallas kernels cannot capture constant arrays)
    hh = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)
    m = jnp.exp2(-8.0 * (hh.astype(f32) + 1.0) / H)        # (1, 1, H)

    # scores over cached rows: P = q*k elementwise, reduce per head group
    # (P stays in the cache dtype to keep VMEM pressure low; the group
    # reduction accumulates in f32 on the MXU)
    P = k * q[:, None, :]                                  # (Bb, T, D)
    s = jax.lax.dot_general(
        P.reshape(Bb * T, D), G.astype(P.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(Bb, T, H)      # (Bb, T, H)
    # dead rows carry age = DEAD (1e9): the -age*m_h bias is <= -3.9e6,
    # which underflows to exactly 0 after the max-subtracted exp — no
    # boolean mask needed (Mosaic cannot insert minor dims on i1).
    s = s * scale - age[:, :, None] * m

    # current position (age 0, bias 0)
    Pc = kc.astype(f32) * q.astype(f32)                    # (Bb, D)
    s_cur = jax.lax.dot_general(
        Pc, G, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) * scale                # (Bb, H)

    # fp32 softmax over T cached rows + current position
    mx = jnp.maximum(jnp.max(s, axis=1), s_cur)            # (Bb, H)
    w = jnp.exp(s - mx[:, None, :])                        # (Bb, T, H)
    w_cur = jnp.exp(s_cur - mx)                            # (Bb, H)
    denom = jnp.sum(w, axis=1) + w_cur                     # (Bb, H)

    # back to D lanes: wfull[b,t,d] = w[b,t,head(d)] — in the cache
    # dtype, matching the einsum path's w.astype(dtype) cast
    wfull = jax.lax.dot_general(
        w.astype(v.dtype).reshape(Bb * T, H), G.astype(v.dtype).T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).astype(v.dtype).reshape(Bb, T, D)
    out = jnp.sum(wfull * v, axis=1, dtype=f32)            # (Bb, D)
    out = out + jax.lax.dot_general(
        w_cur, G.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) * vc.astype(f32)
    dfull = jax.lax.dot_general(
        denom, G.T, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                        # (Bb, D)
    return (out / dfull).astype(out_dtype)


def _kernel(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref,
            *, H: int, scale: float):
    """One k/v slot pair: kv block (Bb, T, 2D) = [k | v] columns."""
    D = kv_ref.shape[-1] // 2
    o_ref[:] = _attend_math(
        q_ref[:], kv_ref[:, :, :D], kv_ref[:, :, D:], kc_ref[:], vc_ref[:],
        age_ref[:], H=H, scale=scale, out_dtype=o_ref.dtype)


def _kernel_pair(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref,
                 *, H: int, scale: float):
    """TWO adjacent k/v slot pairs in one invocation: kv block
    (Bb, T, 4D) = [k0 | v0 | k1 | v1] columns, q/kc/vc/o (Bb, 2D) with
    set s in columns [s*D:(s+1)*D].  The twin sets are unrolled in one
    body so the whole phase is a single kernel launch over ONE
    contiguous cache read."""
    D = kv_ref.shape[-1] // 4
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _attend_math(
            q_ref[:, s * D:(s + 1) * D],
            kv_ref[:, :, 2 * s * D:(2 * s + 1) * D],
            kv_ref[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, scale=scale, out_dtype=o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("slot_k", "slot_v", "num_heads",
                                             "block", "interpret"))
def fused_attend(cache: jax.Array, q: jax.Array, k_cur: jax.Array,
                 v_cur: jax.Array, age: jax.Array, *, slot_k: int,
                 slot_v: int, num_heads: int = 4, block: int = 64,
                 interpret: bool = False) -> jax.Array:
    """Single-query attention over one k/v slot pair of the fused cache.

    cache: (B, T, n_slots*D); q, k_cur, v_cur: (B, D);
    age: (B, T) float32 — query-key distance in the stream's own frame
    timeline, >= DEAD/2 for invalid rows.  Returns (B, D).
    """
    B, T, nD = cache.shape
    D = q.shape[-1]
    H = num_heads
    assert H & (H - 1) == 0, "in-kernel AliBi slopes need power-of-2 heads"
    scale = 1.0 / math.sqrt(D)
    Bb = min(block, B)
    if B % Bb:
        Bb = math.gcd(B, Bb)
    # CPU backend (tests) runs the kernel in interpreter mode
    interpret = interpret or jax.default_backend() == "cpu"

    assert slot_v == slot_k + 1, "cache_layout stores k/v adjacently"
    assert slot_k % 2 == 0
    kern = functools.partial(_kernel, H=H, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # q
            pl.BlockSpec((Bb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # k_cur
            pl.BlockSpec((Bb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # v_cur
            pl.BlockSpec((Bb, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # age
            pl.BlockSpec((Bb, T, 2 * D),
                         lambda i: (i, 0, slot_k // 2),
                         memory_space=pltpu.VMEM),          # k+v pair
        ],
        out_specs=pl.BlockSpec((Bb, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
        interpret=interpret,
    )(q, k_cur, v_cur, age, cache)


@functools.partial(jax.jit, static_argnames=("pair_base", "num_heads",
                                             "block", "interpret"))
def fused_attend_pair(cache: jax.Array, q2: jax.Array, k_cur2: jax.Array,
                      v_cur2: jax.Array, age: jax.Array, *, pair_base: int,
                      num_heads: int = 4, block: int = 32,
                      interpret: bool = False) -> jax.Array:
    """TWO single-query attentions (the independent channel/tower twins of
    one layer phase) in ONE pallas_call over ONE contiguous cache block.

    cache_layout stores each phase's twin pairs adjacently, so the twin
    attends read the single (Bb, T, 4D) block at pair index `pair_base`
    — one kernel launch per phase (vs 2 for per-pair `fused_attend`)
    and 2x the HBM burst length (2048 B vs 1024 B per cache row), the
    two effects that dominate the dispatch-bound serving step
    (PERF.md r3).

    cache: (B, T, n_slots*D); q2/k_cur2/v_cur2: (B, 2, D) with set s at
    [:, s]; age: (B, T) f32 shared by both sets.  Set s reads the cache
    k/v pair `pair_base + s` (pair p = slots 2p, 2p+1).
    Returns (B, 2, D).
    """
    B, T, nD = cache.shape
    D = q2.shape[-1]
    H = num_heads
    assert H & (H - 1) == 0, "in-kernel AliBi slopes need power-of-2 heads"
    assert 2 * (pair_base + 2) * D <= nD
    # the (Bb, T, 4D) block is indexed at 4D granularity on the last dim
    assert pair_base % 2 == 0, "twin pairs must start 4D-block-aligned"
    scale = 1.0 / math.sqrt(D)
    Bb = min(block, B)
    if B % Bb:
        Bb = math.gcd(B, Bb)
    interpret = interpret or jax.default_backend() == "cpu"

    kern = functools.partial(_kernel_pair, H=H, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(B // Bb,),
        in_specs=[
            pl.BlockSpec((Bb, 2 * D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # q (both sets)
            pl.BlockSpec((Bb, 2 * D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # k_cur
            pl.BlockSpec((Bb, 2 * D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # v_cur
            pl.BlockSpec((Bb, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # age
            pl.BlockSpec((Bb, T, 4 * D),
                         lambda i: (i, 0, pair_base // 2),
                         memory_space=pltpu.VMEM),          # 2 k/v pairs
        ],
        out_specs=pl.BlockSpec((Bb, 2 * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * D), q2.dtype),
        interpret=interpret,
    )(q2.reshape(B, 2 * D), k_cur2.reshape(B, 2 * D),
      v_cur2.reshape(B, 2 * D), age, cache)
    return out.reshape(B, 2, D)


def _alibi_slopes(n: int):
    from vap_realtime_tpu.models.transformer import alibi_slopes

    return [float(s) for s in alibi_slopes(n)]


def attend_reference(cache, q, k_cur, v_cur, age, *, slot_k, slot_v,
                     num_heads=4):
    """NumPy-style einsum reference (mirrors _kv_core.attend) for tests."""
    B, T, _ = cache.shape
    D = q.shape[-1]
    H = num_heads
    Dh = D // H
    k_old = cache[:, :, slot_k * D:(slot_k + 1) * D]
    v_old = cache[:, :, slot_v * D:(slot_v + 1) * D]
    qh = q.reshape(B, H, Dh)
    kh = k_old.reshape(B, T, H, Dh)
    scale = 1.0 / math.sqrt(D)
    slopes = jnp.asarray(_alibi_slopes(H), jnp.float32)
    s_old = jnp.einsum("bhd,bthd->bht", qh, kh,
                       preferred_element_type=jnp.float32) * scale
    bias = jnp.where((age < DEAD / 2)[:, None, :],
                     -age[:, None, :] * slopes[None, :, None], -jnp.inf)
    s_old = s_old + bias
    s_cur = jnp.sum((qh * k_cur.reshape(B, H, Dh)).astype(jnp.float32),
                    axis=-1, keepdims=True) * scale
    s_all = jnp.concatenate([s_old, s_cur], axis=-1)
    w = jax.nn.softmax(s_all, axis=-1)
    vh = v_old.reshape(B, T, H, Dh)
    out = (jnp.einsum("bht,bthd->bhd", w.astype(cache.dtype)[:, :, :T], vh,
                      preferred_element_type=jnp.float32)
           + w[:, :, T:] * v_cur.reshape(B, H, Dh).astype(jnp.float32))
    return out.reshape(B, D).astype(q.dtype)
