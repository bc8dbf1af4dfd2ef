"""Attend-kernel lab: intra-kernel cost attribution by variant ablation.

The device trace gives per-launch totals for the 7 `fused_attend_pair`
calls but cannot attribute time WITHIN a kernel.  This lab times a
7-phase attend chain (the serving step's exact launch pattern: 7
sequential pallas calls over the 7 cache phases, q evolving between
iterations so nothing hoists/DCEs) for ablated kernel bodies:

  dma        pure cache-block read + trivial reduce   -> DMA floor
  mxu        + the two per-set MXU matmuls, no softmax -> DMA+MXU bound
  bcast      r3 production kernel (broadcast softmax)
  bcast_nomax   broadcast, clamp instead of max-subtract
  bcast_bf16exp broadcast, exp in bf16
  compact    v3 kernel (compact (Bb,T,H) softmax)
  q8_bcast   broadcast on int8 cache + per-row dequant
  [block sweep] bcast at Bb in {16, 32, 64}

Diagnostic only: ablated variants are numerically WRONG by design.
Methodology: long/short difference quotient (ARCHITECTURE.md).

Run (TPU): python tools/attend_lab.py --batch 4096 [--variants ...]
"""

from __future__ import annotations

import argparse
import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vap_realtime_tpu.ops.pallas.attend import (  # noqa: E402
    _attend_math, _attend_math_compact,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- ablated kernel bodies -------------------------------------------------

def _k_dma(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref, *, H, scale):
    kv = kv_ref[:, 0]                       # (Bb, T, 4D)
    D2 = o_ref.shape[-1]
    o_ref[:] = jnp.sum(kv.astype(jnp.float32), axis=1)[:, :D2].astype(
        o_ref.dtype)


def _k_mxu(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref, *, H, scale):
    """Both sets' two production matmuls (P build + (D,D) head-broadcast
    score matmul) + the value reduce, NO softmax/bias/exp."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    Bb, T, _ = kv.shape
    di = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    dj = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    M = (di // (D // H) == dj // (D // H)).astype(kv.dtype)
    for s in range(2):
        q = q_ref[:, s * D:(s + 1) * D]
        k = kv[:, :, 2 * s * D:(2 * s + 1) * D]
        v = kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D]
        P = k * q[:, None, :]
        w = jax.lax.dot_general(
            P.reshape(Bb * T, D), M,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(Bb, T, D)
        o_ref[:, s * D:(s + 1) * D] = jnp.sum(
            w * v.astype(jnp.float32), axis=1).astype(o_ref.dtype)


def _bcast_body(q, k, v, kc, vc, age, *, H, scale, out_dtype, mode):
    """_attend_math with the softmax stage ablated per `mode`."""
    Bb, T, D = k.shape
    Dh = D // H
    f32 = jnp.float32
    di = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    dj = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    M = (di // Dh == dj // Dh).astype(k.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
    m = jnp.exp2(-8.0 * ((lane // Dh).astype(f32) + 1.0) / H)
    P = k * q[:, None, :]
    s = jax.lax.dot_general(
        P.reshape(Bb * T, D), M,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).reshape(Bb, T, D)
    s = s * scale - age[:, :, None] * m
    Pc = kc * q
    s_cur = jax.lax.dot_general(
        Pc, M, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) * scale
    if mode == "nomax":
        # no max reduce / broadcast subtract; clamp bounds overflow.
        # exp(-3.9e6) for dead rows still underflows to exactly 0.
        w = jnp.exp(jnp.minimum(s, 60.0))
        w_cur = jnp.exp(jnp.minimum(s_cur, 60.0))
    elif mode == "noexp":
        # r5: skip the transcendental, keep every other pass — isolates
        # the exp cost within nomax
        w = jnp.minimum(s, 60.0)
        w_cur = jnp.minimum(s_cur, 60.0)
    elif mode == "f32out":
        # r5: nomax with the value chain kept in f32 — no w->bf16 cast,
        # no bf16 mult, no product->f32 cast (the r5 decomposition puts
        # the cast-heavy out chain at 3.4 ms of the 5.3 ms VPU surplus)
        w = jnp.exp(jnp.minimum(s, 60.0))
        w_cur = jnp.exp(jnp.minimum(s_cur, 60.0))
        denom = jnp.sum(w, axis=1) + w_cur
        out = jnp.sum(w * v.astype(f32), axis=1)
        out = out + w_cur * vc.astype(f32)
        return (out / denom).astype(out_dtype)
    elif mode == "nodenom":
        # r5: skip the T-axis denom reduce (denom = 1)
        w = jnp.exp(jnp.minimum(s, 60.0))
        out = jnp.sum((w.astype(v.dtype) * v).astype(f32), axis=1)
        out = out + vc.astype(f32)
        return out.astype(out_dtype)
    elif mode == "noout":
        # r5: skip the weighted-value mult+reduce, keep denom
        w = jnp.exp(jnp.minimum(s, 60.0))
        w_cur = jnp.exp(jnp.minimum(s_cur, 60.0))
        denom = jnp.sum(w, axis=1) + w_cur
        return (w[:, 0, :] / denom).astype(out_dtype)
    elif mode == "bf16exp":
        mx = jnp.maximum(jnp.max(s, axis=1), s_cur)
        w = jnp.exp((s - mx[:, None, :]).astype(jnp.bfloat16))
        w_cur = jnp.exp(s_cur - mx)
        denom = jnp.sum(w.astype(f32), axis=1) + w_cur
        out = jnp.sum((w * v.astype(jnp.bfloat16)).astype(f32), axis=1)
        out = out + w_cur * vc.astype(f32)
        return (out / denom).astype(out_dtype)
    else:
        raise ValueError(mode)
    denom = jnp.sum(w, axis=1) + w_cur
    out = jnp.sum((w.astype(v.dtype) * v).astype(f32), axis=1)
    out = out + w_cur * vc.astype(f32)
    return (out / denom).astype(out_dtype)


def _k_bcast_mode(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref,
                  *, H, scale, mode):
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _bcast_body(
            q_ref[:, s * D:(s + 1) * D],
            kv[:, :, 2 * s * D:(2 * s + 1) * D],
            kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, scale=scale, out_dtype=o_ref.dtype,
            mode=mode)


def _k_q8row(q_ref, kc_ref, vc_ref, age_ref, sc_ref, kv_ref, o_ref,
             *, H, scale):
    """Production-class int8 body: per-row dequant scales (explicit
    s_cur form, two (Bb, T, D)-wide scale passes) — `_attend_math`
    with row_scale, exactly what `_kernel_pair_q` ships."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    rs = sc_ref[:]
    for s in range(2):
        o_ref[:, s * D:(s + 1) * D] = _attend_math(
            q_ref[:, s * D:(s + 1) * D] * (scale * 1.4426950408889634),
            kv[:, :, 2 * s * D:(2 * s + 1) * D],
            kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D],
            kc_ref[:, s * D:(s + 1) * D], vc_ref[:, s * D:(s + 1) * D],
            age_ref[:], H=H, out_dtype=o_ref.dtype, row_scale=rs)


def _k_q8glb(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref, *, H, scale):
    """Scale-FREE int8 body (r5 candidate): one GLOBAL per-phase scale
    folds into q (scores) and a compile-time scalar on the value sum —
    the kernel body is the bf16 v4 math plus two int8->bf16 casts and
    one (Bb, D) post-reduce multiply.  q arrives pre-scaled by c_k
    conceptually (here folded into the in-kernel prescale); kc arrives
    pre-divided by c_k outside the kernel (not modeled — timing only,
    the (B, 2D) outside ops are noise)."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    C_V = 0.0123  # compile-time global v dequant scale
    f32 = jnp.float32
    for s in range(2):
        q = q_ref[:, s * D:(s + 1) * D] * (scale * 1.4426950408889634)
        k = kv[:, :, 2 * s * D:(2 * s + 1) * D].astype(q.dtype)
        v = kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D].astype(q.dtype)
        kc = kc_ref[:, s * D:(s + 1) * D]
        vc = vc_ref[:, s * D:(s + 1) * D]
        Bb, T, _ = k.shape
        di = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
        dj = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
        M = (di // (D // H) == dj // (D // H)).astype(k.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
        m = jnp.exp2(-8.0 * ((lane // (D // H)).astype(f32) + 1.0) / H)
        P = (k - kc[:, None, :]) * q[:, None, :]
        s_shift = jax.lax.dot_general(
            P.reshape(Bb * T, D), M,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(Bb, T, D)
        arg = s_shift - age_ref[:][:, :, None] * m
        w = jnp.exp2(jnp.minimum(arg, 86.0))
        denom = jnp.sum(w, axis=1) + 1.0
        out = jnp.sum((w.astype(v.dtype) * v).astype(f32), axis=1)
        out = out * C_V + vc.astype(f32)
        o_ref[:, s * D:(s + 1) * D] = (out / denom).astype(o_ref.dtype)


def _k_v5(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref, *, H, scale):
    """r5 pass-squeeze candidate: (a) the AliBi age*m product is
    computed ONCE and shared by both twin sets (v4 computes it per set);
    (b) scores use P = k*q (one bf16 pass) with the s_cur shift folded
    into the bias via one broadcast FMA, instead of v4's (k - kc)*q
    two-pass form.  Mathematically identical softmax."""
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    Bb, T, _ = kv.shape
    f32 = jnp.float32
    di = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    dj = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
    m = jnp.exp2(-8.0 * ((lane // (D // H)).astype(f32) + 1.0) / H)
    agem = age_ref[:][:, :, None] * m                # ONCE, both sets
    for s in range(2):
        q = q_ref[:, s * D:(s + 1) * D] * (scale * 1.4426950408889634)
        k = kv[:, :, 2 * s * D:(2 * s + 1) * D]
        v = kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D]
        kc = kc_ref[:, s * D:(s + 1) * D]
        vc = vc_ref[:, s * D:(s + 1) * D]
        M = (di // (D // H) == dj // (D // H)).astype(k.dtype)
        P = k * q[:, None, :]                        # 1 bf16 pass
        sc_ = jax.lax.dot_general(
            P.reshape(Bb * T, D), M,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(Bb, T, D)
        s_cur = jax.lax.dot_general(
            kc * q, M, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)              # (Bb, D)
        arg = sc_ - (agem + s_cur[:, None, :])       # broadcast FMA
        w = jnp.exp2(jnp.minimum(arg, 86.0))
        denom = jnp.sum(w, axis=1) + 1.0
        out = jnp.sum((w.astype(v.dtype) * v).astype(f32), axis=1)
        out = out + vc.astype(f32)
        o_ref[:, s * D:(s + 1) * D] = (out / denom).astype(o_ref.dtype)


def _k_q8dma(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref, *, H, scale):
    """int8-cache DMA floor: half the bytes of the bf16 `dma` variant."""
    kv = kv_ref[:, 0]
    D2 = o_ref.shape[-1]
    o_ref[:] = jnp.sum(kv.astype(jnp.float32), axis=1)[:, :D2].astype(
        o_ref.dtype)


def _k_prod(q_ref, kc_ref, vc_ref, age_ref, kv_ref, o_ref, *, H, scale,
            compact):
    D = kv_ref.shape[-1] // 4
    kv = kv_ref[:, 0]
    for s in range(2):
        sl = slice(s * D, (s + 1) * D)
        k = kv[:, :, 2 * s * D:(2 * s + 1) * D]
        v = kv[:, :, (2 * s + 1) * D:(2 * s + 2) * D]
        if compact:
            o_ref[:, sl] = _attend_math_compact(
                q_ref[:, sl] * scale, k, v, kc_ref[:, sl], vc_ref[:, sl],
                age_ref[:], H=H, out_dtype=o_ref.dtype)
        else:
            # v4 production math (expects q pre-scaled by scale*log2e)
            o_ref[:, sl] = _attend_math(
                q_ref[:, sl] * (scale * 1.4426950408889634), k, v,
                kc_ref[:, sl], vc_ref[:, sl],
                age_ref[:], H=H, out_dtype=o_ref.dtype)


def launch(kern, cache, q2, kc2, vc2, age, phase, Bb, rowscale=None):
    B, P, T, D4 = cache.shape
    D2 = D4 // 2
    in_specs = [
        pl.BlockSpec((Bb, D2), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, D2), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, D2), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bb, T), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q2, kc2, vc2, age]
    if rowscale is not None:
        in_specs.append(pl.BlockSpec((Bb, T), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(rowscale)
    in_specs.append(
        pl.BlockSpec((Bb, 1, T, D4), lambda i, p=phase: (i, p, 0, 0),
                     memory_space=pltpu.VMEM))
    args.append(cache)
    return pl.pallas_call(
        kern,
        grid=(B // Bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bb, D2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D2), q2.dtype),
    )(*args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--T", type=int, default=50)
    ap.add_argument("--variants", default="dma,mxu,bcast,bcast_nomax,"
                    "bcast_bf16exp,compact,bcast_b16,bcast_b64")
    ap.add_argument("--f_short", type=int, default=4)
    ap.add_argument("--f_long", type=int, default=24)
    args = ap.parse_args()

    B, T, D, H, Pn = args.batch, args.T, 256, 4, 7
    scale = 1.0 / math.sqrt(D)
    rng = np.random.RandomState(0)
    cache = jnp.asarray(rng.randn(B, Pn, T, 4 * D)
                        .astype(np.float32) * 0.3).astype(jnp.bfloat16)
    q0 = jnp.asarray(rng.randn(B, 2 * D).astype(np.float32) * 0.3
                     ).astype(jnp.bfloat16)
    age_np = rng.randint(1, T, size=(B, T)).astype(np.float32)
    age = jnp.asarray(age_np)
    log(f"device: {jax.devices()[0]}  B={B} T={T} 7 phases/iter")

    KERNS = {
        "dma": (functools.partial(_k_dma, H=H, scale=scale), 32),
        "mxu": (functools.partial(_k_mxu, H=H, scale=scale), 32),
        "bcast": (functools.partial(_k_prod, H=H, scale=scale,
                                    compact=False), 32),
        "compact": (functools.partial(_k_prod, H=H, scale=scale,
                                      compact=True), 32),
        "bcast_nomax": (functools.partial(_k_bcast_mode, H=H, scale=scale,
                                          mode="nomax"), 32),
        "bcast_bf16exp": (functools.partial(_k_bcast_mode, H=H,
                                            scale=scale,
                                            mode="bf16exp"), 32),
        "bcast_noexp": (functools.partial(_k_bcast_mode, H=H,
                                          scale=scale, mode="noexp"), 32),
        "bcast_f32out": (functools.partial(_k_bcast_mode, H=H,
                                           scale=scale,
                                           mode="f32out"), 32),
        "bcast_f32out_b8": (functools.partial(_k_bcast_mode, H=H,
                                              scale=scale,
                                              mode="f32out"), 8),
        "bcast_nodenom": (functools.partial(_k_bcast_mode, H=H,
                                            scale=scale,
                                            mode="nodenom"), 32),
        "bcast_noout": (functools.partial(_k_bcast_mode, H=H,
                                          scale=scale, mode="noout"), 32),
        "bcast_b16": (functools.partial(_k_prod, H=H, scale=scale,
                                        compact=False), 16),
        "bcast_b64": (functools.partial(_k_prod, H=H, scale=scale,
                                        compact=False), 64),
        # int8-cache variants (r5): read the half-width cache_q8
        "q8_dma": (functools.partial(_k_q8dma, H=H, scale=scale), 32),
        "q8_row": (functools.partial(_k_q8row, H=H, scale=scale), 32),
        "q8_glb": (functools.partial(_k_q8glb, H=H, scale=scale), 32),
        "q8_glb_b8": (functools.partial(_k_q8glb, H=H, scale=scale), 8),
        "q8_glb_b16": (functools.partial(_k_q8glb, H=H, scale=scale), 16),
        "q8_row_b8": (functools.partial(_k_q8row, H=H, scale=scale), 8),
        "q8_dma_b8": (functools.partial(_k_q8dma, H=H, scale=scale), 8),
        "v5_b8": (functools.partial(_k_v5, H=H, scale=scale), 8),
        "v5_b16": (functools.partial(_k_v5, H=H, scale=scale), 16),
        "v5_b32": (functools.partial(_k_v5, H=H, scale=scale), 32),
        "bcast_b8": (functools.partial(_k_prod, H=H, scale=scale,
                                       compact=False), 8),
    }

    results = {}
    cache = jax.device_put(cache)
    q0 = jax.device_put(q0)
    age = jax.device_put(age)
    # int8 lookalike cache + per-row dequant scales (values irrelevant —
    # timing only; codes span the full int8 range for honest cast cost)
    cache_q8 = jax.device_put(jnp.asarray(
        rng.randint(-127, 128, size=cache.shape).astype(np.int8)))
    rowscale = jax.device_put(jnp.asarray(
        (rng.rand(B, T) * 0.02 + 0.01).astype(np.float32)))

    for name in args.variants.split(","):
        kern, Bb = KERNS[name]
        is_q8 = name.startswith("q8_")
        takes_rs = name.startswith("q8_row")
        cch = cache_q8 if is_q8 else cache

        def chain(q, cache, age, rs, kern=kern, Bb=Bb, takes_rs=takes_rs):
            # 7 sequential phase launches, q fed forward (the serving
            # step's dependency pattern — launches cannot overlap)
            for p in range(Pn):
                o = launch(kern, cache, q, q, q, age, p, Bb,
                           rowscale=rs if takes_rs else None)
                q = (q * 0.999 + 0.001 * o).astype(q.dtype)
            return q

        def runner(F):
            # cache/age are ARGUMENTS (a closed-over cache becomes a
            # 2.9 GB captured constant re-uploaded per compile)
            @jax.jit
            def run(q, cache, age, rs):
                def body(c, _):
                    return chain(c, cache, age, rs), None
                c, _ = jax.lax.scan(body, q, None, length=F)
                return jnp.sum(c.astype(jnp.float32))
            return run

        def t(F, reps=2):
            run = runner(F)
            _ = float(run(q0, cch, age, rowscale))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(run(q0, cch, age, rowscale))
                best = min(best, time.perf_counter() - t0)
            return best

        try:
            dt = max((t(args.f_long) - t(args.f_short))
                     / (args.f_long - args.f_short), 1e-9)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        results[name] = dt
        log(f"{name:14s} {dt*1e3:7.2f} ms / 7-phase step "
            f"({dt*1e3/Pn:5.2f} ms/launch)")

    print({k: round(v * 1e3, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
