"""Fused single-query KV-step attention — Pallas TPU kernel.

The incremental serving step (runtime/incremental.py `_kv_core`) issues
14 single-query attentions per frame over the phase-major
(B, P, T, 4*D) cache.  XLA's lowering of the per-head einsums
("bhd,bthd->bht" with head_dim 64) relayouts to 64-lane tiles and runs
~4x slower than the raw cache-read bound (measured r2: 30 ms for the 14
attends at B=4096 vs 8.5 ms to stream the same bytes).

This kernel keeps every tensor at the native 256-lane width and sums
over heads by multiplying with a block-diagonal (D, D) head-BROADCAST
matrix M (M[d,d'] = 1 iff head(d) == head(d')):

    s[b,t,d]   = (sum_d' q[b,d'] k[b,t,d'] M[d',d]) * scale - age[b,t] m_d
    w          = softmax over the T cached rows + current pos, per lane
    out[b,d]   = sum_t w[b,t,d] v[b,t,d]  (+ current-position term)

Scores land broadcast on every lane of their head, so the softmax runs
in broadcast form and NO head-expansion matmuls are needed afterwards:
2 MXU matmuls per set, both N=256.  (r2's one-hot (D, H) reduction
needed 4 matmuls per set with N=4/K=4 — shapes that cost like N=128 on
the 128x128 systolic array; the trace showed those kernels at 16.2 ms
of the 29 ms step.  A matmul-free per-head VPU variant was also tried
and measured slower, 37 ms/step, from per-head (Bb, T) layout changes.
PERF.md r3.)

All reads (k, v blocks) stream HBM->VMEM once; softmax runs in fp32;
no intermediate ever round-trips HBM.  One `pallas_call` handles one
PHASE — both twin k/v pairs of a layer phase, one contiguous
(Bb, 1, T, 4D) block of the phase-major cache — so the serving step
issues 7 launches over 7 sequential reads (see `fused_attend_pair`).

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


LOG2E = 1.4426950408889634  # scores are kept in log2 units (native exp2)


def _attend_math(q, k, v, kc, vc, age, *, H: int, out_dtype,
                 row_scale=None, staged=None):
    """Single-set fused attend math (shared by both kernel bodies).

    q/kc/vc: (Bb, D); k/v: (Bb, T, D); age: (Bb, T) f32.  q MUST be
    PRE-SCALED by 1/sqrt(D) * log2(e) (folded outside the kernel).

    Head-group reductions ride one-hot matmuls so every tensor keeps
    the native 256-lane width (no (H, Dh) relayouts).

    v4 softmax (r4 ablation lab, tools/attend_lab.py): the r3 kernel's
    max-subtracted softmax cost 4.2 ms/step in the T-axis max REDUCE +
    broadcast subtract alone (bcast 14.05 vs bcast_nomax 9.87 ms, DMA
    floor 4.45).  Here scores shift by the CURRENT position's score
    instead of the max:

        w_t   = exp2(min(s_t - s_cur, 86))     w_cur = exp2(0) = 1
        out   = (sum_t w_t v_t + v_cur) / (sum_t w_t + 1)

    - mathematically identical to softmax (shift invariance); the 86
      clamp only engages when a cached score beats the current one by
      2^86 — where the softmax is one-hot to ~1e-26 anyway;
    - NO reduce before the exp, and the current position's exp/weight
      passes vanish (w_cur == 1 exactly);
    - denom >= 1 by construction: strictly no-NaN, unlike max-shift
      which divides by a sum of underflowable exps;
    - exp2 is the VPU-native transcendental; the log2(e) factor folds
      into the q prescale and the AliBi slopes.

    row_scale: (Bb, T) f32 dequant scales when k/v are int8-quantized
    (one scale per cached row) — scores and value sums are rescaled per
    row, so dequant never materializes a full bf16 copy of the block.

    staged: optional (k_st, v_st, age_st, st_scale) for the "staged"
    slot policy — k_st/v_st (S, Bb, D) frame-major staged rows,
    age_st (S, Bb) f32 DEAD-encoded ages, st_scale (S, Bb) f32 dequant
    scales or None.  The staged contribution is computed in the stage's
    native (S, Bb, ·) layout (no transposes) and folded into the same
    denominator.
    """
    Bb, T, D = k.shape
    Dh = D // H
    f32 = jnp.float32
    if k.dtype != q.dtype:
        # int8 codes ride up to the compute dtype.  With row_scale the
        # scores/weights are rescaled per row below; WITHOUT row_scale
        # the caller owns the dequant (quant="global": scales folded
        # into q / k_cur / v_cur / the output — incremental.attend_pair)
        # and this body is exactly the bf16 math on code values.
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)

    # block-diagonal head-broadcast-sum matrix (D, D):
    # M[d, d'] = 1 iff head(d) == head(d').  P @ M puts every head's
    # score on ALL of that head's lanes at once, so the softmax runs in
    # broadcast form and the weighted value sum needs NO head-expansion
    # matmuls afterwards.  (The r2 one-hot (D, H) design needed 4 MXU
    # matmuls per set — N=4/K=4 shapes that cost like N=128 ones on the
    # 128x128 array: the trace showed the 7 attend kernels at 16.2 ms
    # of the 29 ms step.  This form needs 2, both N=256.  A matmul-free
    # per-head VPU variant was also tried: slower, 37 ms/step, from
    # (Bb, T)-shaped layout changes.  PERF.md r3.  The r4 lab adds:
    # the matmuls cost only ~1.1 ms/step on top of the 4.45 DMA floor —
    # compact (Bb, T, H) softmax relocation measured SLOWER, 15.8 ms.)
    di = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    dj = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    M = (di // Dh == dj // Dh).astype(k.dtype)
    # per-lane AliBi slope m[d] = 2^(-8(head(d)+1)/H) * log2(e), closed
    # form for power-of-2 H (ofirpress/attention_with_linear_biases;
    # modules.py:126-159) — computed in-kernel (pallas kernels cannot
    # capture constant arrays)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
    m = jnp.exp2(-8.0 * ((lane // Dh).astype(f32) + 1.0) / H) * LOG2E

    # scores over cached rows, head-summed by M.  In the unquantized
    # case the s_cur shift FOLDS INTO the matmul (M is linear):
    # ((k - k_cur) * q) @ M == s - s_cur — the current-position matmul
    # and the (Bb, T, D) broadcast subtract both vanish.  With an int8
    # cache the dequant scale applies to the cached score only, so the
    # explicit form stays.
    if row_scale is not None:
        P = k * q[:, None, :]                              # (Bb, T, D)
        s = jax.lax.dot_general(
            P.reshape(Bb * T, D), M,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(Bb, T, D)  # broadcast
        s = s * row_scale[:, :, None]      # per-row int8 dequant
        Pc = kc * q                                        # (Bb, D)
        s_cur = jax.lax.dot_general(
            Pc, M, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)                    # (Bb, D)
        arg = s - age[:, :, None] * m - s_cur[:, None, :]
    else:
        P = (k - kc[:, None, :]) * q[:, None, :]           # (Bb, T, D)
        s_shift = jax.lax.dot_general(
            P.reshape(Bb * T, D), M,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(Bb, T, D)  # s - s_cur
        s_cur = None
        arg = s_shift - age[:, :, None] * m

    # dead rows carry age = DEAD (1e9): the -age*m_h bias is <= -5.6e6,
    # so exp2 underflows to exactly 0 — no boolean mask needed (Mosaic
    # cannot insert minor dims on i1).
    w = jnp.exp2(jnp.minimum(arg, 86.0))                   # (Bb, T, D)
    denom = jnp.sum(w, axis=1) + 1.0                       # (Bb, D)

    if row_scale is not None:
        w = w * row_scale[:, :, None]      # fold dequant into the weights
    out = jnp.sum((w.astype(v.dtype) * v).astype(f32), axis=1)
    out = out + vc.astype(f32)             # current weight == 1 exactly

    if staged is not None:
        # age_st / st_scale arrive LANE-BROADCAST to (S, Bb, D): Mosaic
        # requires kernel blocks' last two dims (8, 128)-divisible or
        # array-equal, which an (S, Bb) block is not — the caller pads
        # them to full lane width instead (cheap: S*B*D bf16/f32)
        k_st, v_st, age_st, st_scale = staged
        if k_st.dtype != q.dtype:       # int8 stage (see cast note above)
            k_st = k_st.astype(q.dtype)
            v_st = v_st.astype(q.dtype)
        S = k_st.shape[0]
        if st_scale is not None:        # quantized: explicit s_cur form
            P2 = k_st * q[None, :, :]                      # (S, Bb, D)
            s2 = jax.lax.dot_general(
                P2.reshape(S * Bb, D), M,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(S, Bb, D)
            s2 = s2 * st_scale
            arg2 = s2 - age_st.astype(f32) * m - s_cur[None, :, :]
        else:                           # same s_cur fold as the ring
            P2 = (k_st - kc[None, :, :]) * q[None, :, :]
            s2 = jax.lax.dot_general(
                P2.reshape(S * Bb, D), M,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32).reshape(S, Bb, D)
            arg2 = s2 - age_st.astype(f32) * m
        w2 = jnp.exp2(jnp.minimum(arg2, 86.0))             # (S, Bb, D)
        denom = denom + jnp.sum(w2, axis=0)
        if st_scale is not None:
            w2 = w2 * st_scale
        out = out + jnp.sum((w2.astype(v.dtype) * v_st).astype(f32),
                            axis=0)
    return (out / denom).astype(out_dtype)


def _attend_math_compact(q, k, v, kc, vc, age, *, H: int,
                         out_dtype, row_scale=None):
    """v3 single-set attend math: COMPACT (Bb, T, H) scores/softmax.

    The broadcast form (`_attend_math`) replicates every head's score on
    all Dh of its lanes, so the f32 softmax (bias, max, exp, sum, div)
    does 64x redundant VPU work on (Bb, T, D) tensors — the r3 trace
    pinned the 7 attends at 13.8 ms vs a 4.8 ms DMA floor, and the gap
    is exactly this VPU redundancy (PERF.md lever 3).  Here:

      s_c   = (k * q) @ G            (D, H) one-hot head-sum — N=H
              matmul, HALF the tile count of the (D, D) broadcast one
      softmax + AliBi bias + dequant + 1/denom ALL on (Bb, T, H)
      w_b   = (w_c / denom) @ E      (H, D) one-hot expand — K=H matmul
      out   = sum_t w_b * v          the only remaining big VPU pass

    vs r2's compact attempt (4 small matmuls, separate w/denom
    expansions, all softmax ops on 4-lane tensors): here only TWO small
    matmuls remain and the denominator folds into w_c BEFORE expansion,
    so no (Bb, T, D)-shaped division or denominator expansion exists.
    q must be PRE-SCALED by 1/sqrt(D) (folded outside the kernel).
    """
    Bb, T, D = k.shape
    Dh = D // H
    f32 = jnp.float32
    if k.dtype != q.dtype:              # int8 codes (see _attend_math)
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)

    # one-hot head-sum (D, H) and expand (H, D) matrices (in-kernel:
    # pallas kernels cannot capture constant arrays)
    di = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    hj = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    G = (di // Dh == hj).astype(k.dtype)                   # (D, H)
    hi = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    dj = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1)
    E = (hi == dj // Dh).astype(k.dtype)                   # (H, D)
    # per-head AliBi slope m[h] = 2^(-8(h+1)/H) for power-of-2 H
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)
    m = jnp.exp2(-8.0 * (lane.astype(f32) + 1.0) / H)      # (1, 1, H)

    P = k * q[:, None, :]                                  # (Bb, T, D)
    s = jax.lax.dot_general(
        P.reshape(Bb * T, D), G,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(Bb, T, H)      # compact
    if row_scale is not None:
        s = s * row_scale[:, :, None]                      # k dequant
    # dead rows carry age = DEAD (1e9): bias <= -3.9e6 underflows the
    # max-subtracted exp to exactly 0 (same contract as _attend_math)
    s = s - age[:, :, None] * m
    Pc = kc * q                                            # (Bb, D)
    s_cur = jax.lax.dot_general(
        Pc, G, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                        # (Bb, H)

    mx = jnp.maximum(jnp.max(s, axis=1), s_cur)            # (Bb, H)
    w = jnp.exp(s - mx[:, None, :])                        # (Bb, T, H)
    w_cur = jnp.exp(s_cur - mx)                            # (Bb, H)
    denom = jnp.sum(w, axis=1) + w_cur                     # (Bb, H)
    if row_scale is not None:
        w = w * row_scale[:, :, None]                      # v dequant
    w = w / denom[:, None, :]
    w_cur = w_cur / denom
    # expand the normalized weights to full lane width and weight V
    # (Mosaic requires 32-bit matmul accumulators, so the expand comes
    # out f32; the w*v mult then runs f32 x promoted-v — same pass
    # count as casting w down first)
    wb = jax.lax.dot_general(
        w.astype(v.dtype).reshape(Bb * T, H), E,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(Bb, T, D)
    wc = jax.lax.dot_general(
        w_cur.astype(v.dtype), E,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                        # (Bb, D)
    out = jnp.sum(wb * v.astype(f32), axis=1)
    out = out + wc * vc.astype(f32)
    return out.astype(out_dtype)


def _kernel_pair_c(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref,
                   *, H: int):
    """Compact-softmax twin-pair kernel (q pre-scaled by 1/sqrt(D))."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _attend_math_compact(
            q_ref[:, s * D:(s + 1) * D],
            kv[:, :, 2 * s * D:(2 * s + 1) * D],
            kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, out_dtype=o_ref.dtype)


def _kernel_pair_cq(q_ref, kc_ref, vc_ref, age_ref, sc_ref, kv_ref,
                    o_ref, *, H: int):
    """`_kernel_pair_c` with an int8 kv block + (Bb, T) dequant scales."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    rs = sc_ref[:]
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _attend_math_compact(
            q_ref[:, s * D:(s + 1) * D],
            kv[:, :, 2 * s * D:(2 * s + 1) * D],
            kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, out_dtype=o_ref.dtype, row_scale=rs)


def _kernel(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref,
            *, H: int):
    """One k/v slot pair: kv block (Bb, 1, T, 2D) = [k | v] columns of
    one phase of the phase-major cache.  q pre-scaled (see wrapper)."""
    D = kv_ref.shape[-1] // 2
    kv = kv_ref[:, 0]
    o_ref[:] = _attend_math(
        q_ref[:], kv[:, :, :D], kv[:, :, D:], kc_ref[:], vc_ref[:],
        age_ref[:], H=H, out_dtype=o_ref.dtype)


def _kernel_pair_q(q_ref, kc_ref, vc_ref, age_ref, sc_ref, kv_ref,
                   o_ref, *, H: int):
    """`_kernel_pair` with an int8 kv block + (Bb, T) dequant scales."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    rs = sc_ref[:]
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _attend_math(
            q_ref[:, s * D:(s + 1) * D],
            kv[:, :, 2 * s * D:(2 * s + 1) * D],
            kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, out_dtype=o_ref.dtype, row_scale=rs)


def _kernel_pair(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref,
                 *, H: int):
    """One PHASE (two twin k/v pairs) in one invocation: kv block
    (Bb, 1, T, 4D) = the phase's [k0 | v0 | k1 | v1] columns, fully
    contiguous in HBM; q/kc/vc/o (Bb, 2D) with set s in columns
    [s*D:(s+1)*D].  The twin sets are unrolled in one body so the whole
    phase is a single kernel launch over ONE sequential cache read."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _attend_math(
            q_ref[:, s * D:(s + 1) * D],
            kv[:, :, 2 * s * D:(2 * s + 1) * D],
            kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, out_dtype=o_ref.dtype)


def _kernel_pair_st(q_ref, kc_ref, vc_ref, age_ref, sage_ref, stage_ref,
                    kv_ref, o_ref, *, H: int):
    """`_kernel_pair` + staged rows: stage block (S, Bb, 4D) = this
    phase's lane-slice of the frame-major stage, sage (S, Bb) ages."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    stg = stage_ref[:]
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _attend_math(
            q_ref[:, s * D:(s + 1) * D],
            kv[:, :, 2 * s * D:(2 * s + 1) * D],
            kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, out_dtype=o_ref.dtype,
            staged=(stg[:, :, 2 * s * D:(2 * s + 1) * D],
                    stg[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
                    sage_ref[:], None))


def _kernel_pair_stq(q_ref, kc_ref, vc_ref, age_ref, sc_ref, sage_ref,
                     ssc_ref, stage_ref, kv_ref, o_ref, *, H: int):
    """`_kernel_pair_st` with int8 cache + stage and their scales."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    rs = sc_ref[:]
    stg = stage_ref[:]
    srs = ssc_ref[:]
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _attend_math(
            q_ref[:, s * D:(s + 1) * D],
            kv[:, :, 2 * s * D:(2 * s + 1) * D],
            kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, out_dtype=o_ref.dtype, row_scale=rs,
            staged=(stg[:, :, 2 * s * D:(2 * s + 1) * D],
                    stg[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
                    sage_ref[:], srs))


@functools.partial(jax.jit, static_argnames=("slot_k", "slot_v", "num_heads",
                                             "block", "interpret"))
def fused_attend(cache: jax.Array, q: jax.Array, k_cur: jax.Array,
                 v_cur: jax.Array, age: jax.Array, *, slot_k: int,
                 slot_v: int, num_heads: int = 4, block: int = 64,
                 interpret: bool = False) -> jax.Array:
    """Single-query attention over one k/v slot pair of the fused cache.

    cache: (B, P, T, 4*D) phase-major (see incremental.cache_layout):
    global slot s lives in phase s // 4, column (s % 4) * D.
    q, k_cur, v_cur: (B, D); age: (B, T) float32 — query-key distance in
    the stream's own frame timeline, >= DEAD/2 for invalid rows.
    Returns (B, D).
    """
    B, P, T, D4 = cache.shape
    D = q.shape[-1]
    H = num_heads
    assert H & (H - 1) == 0, "in-kernel AliBi slopes need power-of-2 heads"
    # the single-pair API has no dequant path: an int8 cache would be
    # read as raw codes.  Fail loudly; use fused_attend_pair(scale=...)
    assert cache.dtype != jnp.int8, \
        "fused_attend has no int8 dequant path; use fused_attend_pair"
    Bb = min(block, B)
    if B % Bb:
        Bb = math.gcd(B, Bb)
    # CPU backend (tests) runs the kernel in interpreter mode
    interpret = interpret or jax.default_backend() == "cpu"

    assert slot_v == slot_k + 1, "cache_layout stores k/v adjacently"
    assert slot_k % 2 == 0
    phase, half = slot_k // 4, (slot_k % 4) // 2
    # fold the score scale AND the exp->exp2 conversion into q (one
    # (B, D) elementwise mult XLA fuses upstream)
    q = q * jnp.asarray(LOG2E / math.sqrt(D), q.dtype)
    kern = functools.partial(_kernel, H=H)
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
            pl.BlockSpec((Bb, 1, T, 2 * D),
                         lambda i: (i, phase, 0, half),
                         memory_space=pltpu.VMEM),          # k+v pair
        ],
        out_specs=pl.BlockSpec((Bb, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
        interpret=interpret,
    )(q, k_cur, v_cur, age, cache)


@functools.partial(jax.jit, static_argnames=("pair_base", "num_heads",
                                             "block", "interpret", "impl"))
def fused_attend_pair(cache: jax.Array, q2: jax.Array, k_cur2: jax.Array,
                      v_cur2: jax.Array, age: jax.Array,
                      scale: jax.Array | None = None,
                      stage: jax.Array | None = None,
                      stage_age: jax.Array | None = None,
                      stage_scale: jax.Array | None = None,
                      *, pair_base: int,
                      num_heads: int = 4, block: int = 8,
                      interpret: bool = False,
                      impl: str = "bcast") -> jax.Array:
    """TWO single-query attentions (the independent channel/tower twins of
    one layer phase) in ONE pallas_call over ONE contiguous cache block.

    The phase-major cache stores each phase's twin pairs as ONE fully
    contiguous (T, 4D) plane per stream, so the twin attends read a
    single sequential block — one kernel launch per phase (vs 2
    per-pair calls) and long-burst HBM reads (the fused flat layout's
    2 KB-burst strided reads ran at ~20% of HBM bandwidth and dominated
    the whole serving step; PERF.md r3).

    cache: (B, P, T, 4*D); q2/k_cur2/v_cur2: (B, 2, D) with set s at
    [:, s]; age: (B, T) f32 shared by both sets.  Set s reads the cache
    k/v pair `pair_base + s` (pair p = slots 2p, 2p+1); the twin pairs
    of a phase are pairs 2*phase and 2*phase + 1.  Returns (B, 2, D).

    scale: (B, T) f32 per-row dequant scales of THIS phase when the
    cache is int8-quantized (KVState.scale[:, phase]); None otherwise.

    stage / stage_age / stage_scale: "staged" slot policy — the
    frame-major row stage (S, B, P*4D), its DEAD-encoded ages (S, B)
    f32, and (int8 cache) its per-row dequant scales for THIS phase
    (S, B) f32.  Staged rows attend alongside ring rows + current.

    impl: "bcast" (default, v4 — head-broadcast scores via one (D, D)
    matmul, exp2 softmax shifted by the current-position score; see
    `_attend_math`) or "compact" (v3 — compact (Bb, T, H) softmax;
    measured SLOWER, kept as a documented negative result; no staged
    support).
    """
    B, P, T, D4 = cache.shape
    D = q2.shape[-1]
    H = num_heads
    assert H & (H - 1) == 0, "in-kernel AliBi slopes need power-of-2 heads"
    assert pair_base % 2 == 0, "pair_base must open a phase"
    assert impl in ("compact", "bcast"), impl
    phase = pair_base // 2
    assert phase < P
    Bb = min(block, B)
    if B % Bb:
        Bb = math.gcd(B, Bb)
    interpret = interpret or jax.default_backend() == "cpu"

    # fold the 1/sqrt(D) score scale into q outside the kernel (one
    # (B, 2D) elementwise mult XLA fuses upstream); the v4 broadcast
    # kernels also fold the exp->exp2 log2(e) factor there
    q2 = q2 * jnp.asarray((1.0 if impl == "compact" else LOG2E)
                          / math.sqrt(D), q2.dtype)

    sm_scale = scale  # the dequant scales; `scale` inside kernels is AliBi
    in_specs = [
        pl.BlockSpec((Bb, 2 * D), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # q (both sets)
        pl.BlockSpec((Bb, 2 * D), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # k_cur
        pl.BlockSpec((Bb, 2 * D), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # v_cur
        pl.BlockSpec((Bb, T), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # age
    ]
    args = [q2.reshape(B, 2 * D), k_cur2.reshape(B, 2 * D),
            v_cur2.reshape(B, 2 * D), age]
    if sm_scale is not None:
        in_specs.append(pl.BlockSpec((Bb, T), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))  # dequant
        args.append(sm_scale.astype(jnp.float32))
    if stage is not None:
        assert impl == "bcast", "staged rows: v4 broadcast kernel only"
        S = stage.shape[0]
        # (S, Bb) blocks violate Mosaic's (8, 128)-divisible-or-equal
        # rule on the last two dims, so ages/scales ride at full lane
        # width: ages lane-broadcast to (S, B, D) in the STATE dtype
        # (live ages < 64 and the DEAD marker are bf16-exact), scales
        # per-phase lane-broadcast to (S, B, P*D) f32
        in_specs.append(pl.BlockSpec((S, Bb, D), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))  # ages
        args.append(jnp.broadcast_to(stage_age.astype(q2.dtype)[:, :, None],
                                     (S, B, D)))
        if sm_scale is not None:
            in_specs.append(
                pl.BlockSpec((S, Bb, D), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM))  # stage dequant
            args.append(jnp.broadcast_to(
                stage_scale.astype(jnp.float32)[:, :, None], (S, B, D)))
        in_specs.append(
            pl.BlockSpec((S, Bb, 4 * D), lambda i: (0, i, phase),
                         memory_space=pltpu.VMEM))      # staged rows
        args.append(stage)
        kern = functools.partial(
            _kernel_pair_stq if sm_scale is not None else _kernel_pair_st,
            H=H)
    elif sm_scale is not None:
        kern = functools.partial(
            _kernel_pair_cq if impl == "compact" else _kernel_pair_q,
            H=H)
    else:
        kern = functools.partial(
            _kernel_pair_c if impl == "compact" else _kernel_pair, H=H)
    in_specs.append(
        pl.BlockSpec((Bb, 1, T, 4 * D), lambda i: (i, phase, 0, 0),
                     memory_space=pltpu.VMEM))          # whole phase
    args.append(cache)
    out = pl.pallas_call(
        kern,
        grid=(B // Bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bb, 2 * D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * D), q2.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, 2, D)


def _alibi_slopes(n: int):
    from vap_realtime_tpu.models.transformer import alibi_slopes

    return [float(s) for s in alibi_slopes(n)]


def attend_reference(cache, q, k_cur, v_cur, age, *, slot_k, slot_v,
                     num_heads=4):
    """NumPy-style einsum reference (mirrors _kv_core.attend) for tests.

    cache: (B, P, T, 4*D) phase-major."""
    B, P, T, _ = cache.shape
    D = q.shape[-1]
    H = num_heads
    Dh = D // H
    ck, cv = (slot_k % 4) * D, (slot_v % 4) * D
    k_old = cache[:, slot_k // 4, :, ck:ck + D]
    v_old = cache[:, slot_v // 4, :, cv:cv + D]
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
