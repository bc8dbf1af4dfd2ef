"""Component-level timing of the kv serving step on the real chip.

Breaks the winning serving path (kv_incremental bf16, B=4096) into its
stages and times each with the same long/short-chain difference-quotient
methodology as bench.py (ARCHITECTURE.md "Performance methodology"), so
the relay's fixed dispatch+readback overhead cancels.

Also benchmarks an im2col/matmul reformulation of the CPC conv stack
(`conv1d_im2col`) against the `lax.conv_general_dilated` path to check
whether XLA's conv lowering reaches MXU speed-of-light at these shapes.

Run (real TPU): python tools/component_bench.py [--batch 4096]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_scan(make_body, init_carry, f_short=4, f_long=24, reps=2):
    """Seconds per iteration of body via long/short chain difference."""

    def runner(F):
        @jax.jit
        def run(carry):
            def body(c, _):
                return make_body(c), None
            c, _ = jax.lax.scan(body, carry, None, length=F)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x).astype(jnp.float32),
                c, jnp.float32(0))
        return run

    def t(F):
        run = runner(F)
        _ = float(run(init_carry))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(init_carry))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(f_long) - t(f_short)) / (f_long - f_short), 1e-9)


def conv1d_im2col(x, w, b, stride: int, padding: int):
    """conv1d re-expressed as patch-extract + ONE matmul.

    x: (B, C_in, L); w: (C_out, C_in, K).  Patches go channels-last so the
    contraction is a plain (B*L_out, C_in*K) x (C_in*K, C_out) MXU matmul.
    """
    k = w.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, (k,), (stride,), [(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"))  # (B, C_in*K, L_out)
    pt = jnp.swapaxes(patches, 1, 2)              # (B, L_out, C_in*K)
    wm = w.reshape(w.shape[0], -1).T              # (C_in*K, C_out)
    y = jnp.matmul(pt, wm, preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + b                     # b: (C_out,), last axis
    return jnp.swapaxes(y, 1, 2)                  # (B, C_out, L_out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--stages", default="all",
                    help="comma list: step,encoder,conv,conv_im2col,lstm,"
                         "trunk,fast,fast_einsum,enc_stream,conv_stream,"
                         "conv_stream_im2col,conv_stream_blocked,lstm5,"
                         "heads,trunk_fast")
    args = ap.parse_args()

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.models.encoder import (
        CPC_CONV_SPECS, cpc_conv_stack, cpc_conv_stack_streaming,
        encode_chunk, encode_chunk_streaming, init_conv_stream_state,
    )
    from vap_realtime_tpu.models.vap import heads_forward, probs_from_outputs
    from vap_realtime_tpu.ops.basic import channel_norm, lstm
    from vap_realtime_tpu.runtime.incremental import (
        fast_step, init_fast_state, init_kv_state, kv_step,
    )
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    B = args.batch
    B2 = B * 2
    stages = args.stages.split(",") if args.stages != "all" else [
        "step", "encoder", "conv", "conv_im2col", "lstm", "trunk"]

    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).astype(jnp.bfloat16), synthetic_params(20))
    enc = params["encoder"]
    rng = np.random.RandomState(0)
    chunk = jnp.asarray(rng.randn(B, 2, cfg.frame_samples)
                        .astype(np.float32) * 0.1).astype(jnp.bfloat16)
    log(f"device: {jax.devices()[0]}  B={B}  frame={cfg.frame_samples}")

    results = {}

    if "step" in stages:
        state0 = init_kv_state(cfg, B, dtype=jnp.bfloat16)

        def body(carry):
            st, ch = carry
            st, out = kv_step(params, st, ch, cfg)
            ch = ch * 0.999 + 1e-4 * jnp.sum(out["p_now"]).astype(ch.dtype)
            return (st, ch)
        results["step"] = timed_scan(body, (state0, chunk))
        log(f"full kv_step:        {results['step']*1e3:8.2f} ms")

    if "encoder" in stages:
        flat = chunk.reshape(B2, -1)
        h0 = jnp.zeros((B2, cfg.dim), jnp.bfloat16)

        def body(carry):
            ch, h, c = carry
            e, h2, c2 = encode_chunk(enc, ch, h, c, cfg.downsample_kernel)
            ch = ch * 0.999 + 1e-4 * jnp.sum(e).astype(ch.dtype)
            return (ch, h2, c2)
        results["encoder"] = timed_scan(body, (flat, h0, h0))
        log(f"encoder (conv+lstm+ds): {results['encoder']*1e3:6.2f} ms")

    if "conv" in stages:
        flat = chunk.reshape(B2, -1)

        def body(ch):
            z = cpc_conv_stack(enc, ch)
            return ch * 0.999 + 1e-4 * jnp.sum(z).astype(ch.dtype)
        results["conv"] = timed_scan(body, flat)
        log(f"conv stack (XLA conv): {results['conv']*1e3:7.2f} ms")

    if "conv_im2col" in stages:
        flat = chunk.reshape(B2, -1)

        def stack_im2col(x):
            x = x[:, None, :]
            for i, (k, s, p) in enumerate(CPC_CONV_SPECS):
                c, n = enc[f"conv{i}"], enc[f"norm{i}"]
                x = conv1d_im2col(x, c["w"], c["b"], s, p)
                x = channel_norm(x, n["w"], n["b"])
                x = jax.nn.relu(x)
            return x

        def body(ch):
            z = stack_im2col(ch)
            return ch * 0.999 + 1e-4 * jnp.sum(z).astype(ch.dtype)
        results["conv_im2col"] = timed_scan(body, flat)
        log(f"conv stack (im2col):   {results['conv_im2col']*1e3:7.2f} ms")

    if "lstm" in stages:
        n_cpc = cfg.frame_samples // 160 - 2
        z = jnp.asarray(rng.randn(B2, n_cpc, cfg.dim)
                        .astype(np.float32)).astype(jnp.bfloat16)
        g = enc["lstm"]
        h0 = jnp.zeros((B2, cfg.dim), jnp.bfloat16)

        def body(carry):
            zz, h, c = carry
            y, h2, c2 = lstm(zz, h, c, g["w_ih"], g["w_hh"],
                             g["b_ih"], g["b_hh"])
            zz = zz * 0.999 + 1e-4 * jnp.sum(y).astype(zz.dtype)
            return (zz, h2, c2)
        results["lstm"] = timed_scan(body, (z, h0, h0))
        log(f"lstm ({n_cpc} steps):      {results['lstm']*1e3:8.2f} ms")

    # ---- fast serving path (the r3 headline): fresh-sample chunks ----
    fresh = jnp.asarray(rng.randn(B, 2, cfg.frame_shift)
                        .astype(np.float32) * 0.1).astype(jnp.bfloat16)

    def fast_body(attend_impl, quant=False):
        state0 = init_fast_state(cfg, B, dtype=jnp.bfloat16, quant=quant)

        def body(carry):
            st, ch = carry
            st, out = fast_step(params, st, ch, cfg, slots="global",
                                attend_impl=attend_impl)
            ch = ch * 0.999 + 1e-4 * jnp.sum(out["p_now"]).astype(ch.dtype)
            return (st, ch)
        return body, (state0, fresh)

    if "fast" in stages:
        body, carry = fast_body("pallas")
        results["fast"] = timed_scan(body, carry)
        log(f"fast_step (pallas):  {results['fast']*1e3:8.2f} ms")

    if "fast_einsum" in stages:
        body, carry = fast_body("einsum")
        results["fast_einsum"] = timed_scan(body, carry)
        log(f"fast_step (einsum):  {results['fast_einsum']*1e3:8.2f} ms")

    if "fast_q8" in stages:
        body, carry = fast_body("pallas", quant=True)
        results["fast_q8"] = timed_scan(body, carry)
        log(f"fast_step (pallas, int8 cache): "
            f"{results['fast_q8']*1e3:8.2f} ms")

    if "enc_stream" in stages:
        flat = fresh.reshape(B2, -1)
        h0 = jnp.zeros((B2, cfg.dim), jnp.bfloat16)
        cst = init_conv_stream_state(B2, cfg.encoder_dim, jnp.bfloat16)

        def body(carry):
            ch, st, h, c = carry
            e, st2, h2, c2 = encode_chunk_streaming(
                enc, ch, st, h, c, cfg.downsample_kernel)
            ch = ch * 0.999 + 1e-4 * jnp.sum(e).astype(ch.dtype)
            return (ch, st2, h2, c2)
        results["enc_stream"] = timed_scan(body, (flat, cst, h0, h0))
        log(f"enc_stream (conv+lstm+ds): {results['enc_stream']*1e3:6.2f} ms")

    if "conv_stream" in stages:
        flat = fresh.reshape(B2, -1)
        cst = init_conv_stream_state(B2, cfg.encoder_dim, jnp.bfloat16)

        def body(carry):
            ch, st = carry
            z, st2 = cpc_conv_stack_streaming(enc, ch, st)
            ch = ch * 0.999 + 1e-4 * jnp.sum(z).astype(ch.dtype)
            return (ch, st2)
        results["conv_stream"] = timed_scan(body, (flat, cst))
        log(f"conv_stream (XLA conv): {results['conv_stream']*1e3:7.2f} ms")

    if "conv_stream_im2col" in stages:
        flat = fresh.reshape(B2, -1)
        cst = init_conv_stream_state(B2, cfg.encoder_dim, jnp.bfloat16)

        def stream_im2col(new, state):
            x = new[:, None, :]
            new_state = {}
            for i, (k, s, _p) in enumerate(CPC_CONV_SPECS):
                x = jnp.concatenate(
                    [state[f"c{i}"].astype(x.dtype), x], axis=-1)
                new_state[f"c{i}"] = x[..., x.shape[-1] - (k - s):]
                c, n = enc[f"conv{i}"], enc[f"norm{i}"]
                x = conv1d_im2col(x, c["w"], c["b"], s, 0)
                x = channel_norm(x, n["w"], n["b"])
                x = jax.nn.relu(x)
            return x, new_state

        def body(carry):
            ch, st = carry
            z, st2 = stream_im2col(ch, st)
            ch = ch * 0.999 + 1e-4 * jnp.sum(z).astype(ch.dtype)
            return (ch, st2)
        results["conv_stream_im2col"] = timed_scan(body, (flat, cst))
        log(f"conv_stream (im2col): {results['conv_stream_im2col']*1e3:8.2f} ms")

    if "conv_stream_blocked" in stages:
        from vap_realtime_tpu.models.encoder import (
            cpc_conv_stack_streaming_blocked,
        )

        flat = fresh.reshape(B2, -1)
        cst = init_conv_stream_state(B2, cfg.encoder_dim, jnp.bfloat16)

        def body(carry):
            ch, st = carry
            z, st2 = cpc_conv_stack_streaming_blocked(enc, ch, st)
            ch = ch * 0.999 + 1e-4 * jnp.sum(z).astype(ch.dtype)
            return (ch, st2)
        results["conv_stream_blocked"] = timed_scan(body, (flat, cst))
        log(f"conv_stream (blocked): {results['conv_stream_blocked']*1e3:7.2f} ms")

    if "lstm5" in stages:
        n_cpc = cfg.frame_shift // 160
        z = jnp.asarray(rng.randn(B2, n_cpc, cfg.dim)
                        .astype(np.float32)).astype(jnp.bfloat16)
        g = enc["lstm"]
        h0 = jnp.zeros((B2, cfg.dim), jnp.bfloat16)

        def body(carry):
            zz, h, c = carry
            y, h2, c2 = lstm(zz, h, c, g["w_ih"], g["w_hh"],
                             g["b_ih"], g["b_hh"])
            zz = zz * 0.999 + 1e-4 * jnp.sum(y).astype(zz.dtype)
            return (zz, h2, c2)
        results["lstm5"] = timed_scan(body, (z, h0, h0))
        log(f"lstm ({n_cpc} steps):       {results['lstm5']*1e3:8.2f} ms")

    if "heads" in stages:
        x = jnp.asarray(rng.randn(B, 1, cfg.dim)
                        .astype(np.float32)).astype(jnp.bfloat16)

        def body(xx):
            trunk = {"x": xx, "o1": xx, "o2": xx, "x1": xx, "x2": xx}
            probs = probs_from_outputs(heads_forward(params, trunk, cfg), cfg)
            return xx * 0.999 + 1e-4 * jnp.sum(
                probs["p_now"]).astype(xx.dtype)
        results["heads"] = timed_scan(body, x)
        log(f"heads+probs:         {results['heads']*1e3:8.2f} ms")

    # ---- cache-copy hypothesis probes (r3): is the scan-carried fused
    # cache updated in place or copied every step? ----
    if {"trunk_pallas", "trunk_nowrite", "trunk_einsum_nowrite",
            "cachewrite"} & set(stages):
        from vap_realtime_tpu.runtime.incremental import KVState, _kv_core

        e0 = jnp.asarray(rng.randn(B, 2, cfg.dim)
                         .astype(np.float32)).astype(jnp.bfloat16)
        h0 = jnp.zeros((B, 2, cfg.dim), jnp.bfloat16)
        ones = jnp.ones((B,), bool)

        def mk_trunk(write, impl):
            def body(carry):
                st, e = carry
                st2, out = _kv_core(params, st, e, h0, h0, cfg, ones,
                                    "global", impl)
                if not write:
                    # reads only: the row write (and its feeding concat)
                    # get DCE'd — isolates the write+carry-copy cost
                    st2 = KVState(cache=st.cache, scale=st.scale,
                                  lstm_h=st2.lstm_h, lstm_c=st2.lstm_c,
                                  count=st2.count, stamp=st.stamp,
                                  step=st2.step, stage=st.stage,
                                  stage_stamp=st.stage_stamp,
                                  stage_scale=st.stage_scale)
                e = e * 0.999 + 1e-4 * jnp.sum(
                    out["p_now"]).astype(e.dtype)
                return (st2, e)
            return body

        st0 = init_kv_state(cfg, B, dtype=jnp.bfloat16)
        if "trunk_pallas" in stages:
            results["trunk_pallas"] = timed_scan(
                mk_trunk(True, "pallas"), (st0, e0))
            log(f"trunk only (pallas, with write): "
                f"{results['trunk_pallas']*1e3:8.2f} ms")
        if "trunk_nowrite" in stages:
            results["trunk_nowrite"] = timed_scan(
                mk_trunk(False, "pallas"), (st0, e0))
            log(f"trunk only (pallas, NO write): "
                f"{results['trunk_nowrite']*1e3:8.2f} ms")
        if "trunk_einsum_nowrite" in stages:
            results["trunk_einsum_nowrite"] = timed_scan(
                mk_trunk(False, "einsum"), (st0, e0))
            log(f"trunk only (einsum, NO write): "
                f"{results['trunk_einsum_nowrite']*1e3:8.2f} ms")
        if "cachewrite" in stages:
            nD = st0.cache.shape[-1]
            row = jnp.ones((B, 1, nD), jnp.bfloat16)

            def body(carry):
                cache, g = carry
                r = row * (g % 100).astype(jnp.bfloat16)
                cache = jax.lax.dynamic_update_slice(
                    cache, r, (0, g % cfg.context_frames, 0))
                return (cache, g + 1)
            results["cachewrite"] = timed_scan(
                body, (st0.cache, jnp.int32(0)))
            log(f"bare loop-carried row write: "
                f"{results['cachewrite']*1e3:8.2f} ms")

    if "cacheread" in stages:
        # pure pallas cache read: same (Bb, 1, T, 4D) phase blocks as the
        # 7 attend launches, kernel body = running sum.  Isolates the
        # DMA cost of streaming the whole cache from the attend compute.
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        st0 = init_kv_state(cfg, B, dtype=jnp.bfloat16)
        Pn = st0.cache.shape[1]
        T = cfg.context_frames
        D4 = st0.cache.shape[-1]
        Bb = 32

        def _sum_kernel(kv_ref, o_ref):
            i, p = pl.program_id(0), pl.program_id(1)

            @pl.when((i == 0) & (p == 0))
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)
            o_ref[:] += jnp.sum(kv_ref[:, 0].astype(jnp.float32),
                                axis=(0, 1))[None]        # (1, D4)

        def read_all(cache):
            return pl.pallas_call(
                _sum_kernel,
                grid=(B // Bb, Pn),
                in_specs=[pl.BlockSpec((Bb, 1, T, D4),
                                       lambda i, p: (i, p, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, D4), lambda i, p: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, D4), jnp.float32),
            )(cache)

        def body(carry):
            cache, acc = carry
            s = read_all(cache)
            acc = acc + jnp.sum(s)
            # perturb ONE tiny slice so the read isn't loop-invariant
            # (a full-tensor op here would add its own 5.9 GB of traffic)
            patch = (acc * 1e-20).astype(cache.dtype) * jnp.ones(
                (1, 1, 1, 128), cache.dtype)
            cache = jax.lax.dynamic_update_slice(cache, patch,
                                                 (0, 0, 0, 0))
            return (cache, acc)
        results["cacheread"] = timed_scan(
            body, (st0.cache + 1.0, jnp.float32(0)))
        gb = B * Pn * T * D4 * 2 / 1e9
        log(f"pallas cache read ({gb:.2f} GB): "
            f"{results['cacheread']*1e3:8.2f} ms -> "
            f"{gb/results['cacheread']:,.0f} GB/s")

    if "hbm" in stages:
        # raw streaming-bandwidth probe: how fast can this chip (through
        # the relay) actually move HBM?  x = x * c reads + writes the
        # whole buffer once per iteration.
        GB = 2
        n = GB * 1024**3 // 2 // (1024 * 1024)
        x0 = (jnp.ones((n, 1024, 1024), jnp.bfloat16), jnp.float32(1.0))

        def body(carry):
            x, s = carry
            # iteration-dependent multiplier: not algebraically foldable
            x = x * s.astype(jnp.bfloat16)
            return (x, s * 1.000001 + 1e-9)
        dt = timed_scan(body, x0)
        results["hbm"] = dt
        gbs = 2 * GB / dt
        log(f"hbm stream ({GB} GB r+w): {dt*1e3:8.2f} ms -> {gbs:,.0f} GB/s")

    if "opchain" in stages:
        # per-op overhead probe: N chained SMALL matmuls (the trunk's
        # op shape) per iteration.  Marginal cost per op = slope over N.
        y0 = jnp.ones((B, 256), jnp.bfloat16)
        w0 = jnp.eye(256, dtype=jnp.bfloat16) * 0.999

        def chain(n):
            def body(carry):
                y, w = carry
                for _ in range(n):
                    y = jnp.matmul(y, w, preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
                return (y, w * 1.0000001)
            return body
        t10 = timed_scan(chain(10), (y0, w0))
        t50 = timed_scan(chain(50), (y0, w0))
        per_op = (t50 - t10) / 40
        results["opchain"] = per_op
        log(f"chained (B,256)x(256,256) matmuls: {t10*1e3:.2f} ms @10, "
            f"{t50*1e3:.2f} ms @50 -> {per_op*1e6:,.0f} us/op")

    if "mxu" in stages:
        # matmul peak probe (4096^2 bf16 chain)
        a0 = jnp.ones((4096, 4096), jnp.bfloat16)

        def body(a):
            return jnp.matmul(a, a, preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16) * 1e-3
        dt = timed_scan(body, a0)
        results["mxu"] = dt
        tf = 2 * 4096**3 / dt / 1e12
        log(f"mxu probe: {dt*1e3:8.2f} ms -> {tf:,.0f} TFLOP/s")

    if "trunk_fast" in stages and "fast" in results and \
            "enc_stream" in results:
        results["trunk_fast"] = results["fast"] - results["enc_stream"]
        log(f"fast trunk (attn+ffn+heads, by difference): "
            f"{results['trunk_fast']*1e3:.2f} ms")

    if "trunk" in stages and "step" in results and "encoder" in results:
        results["trunk"] = results["step"] - results["encoder"]
        log(f"trunk (attn+ffn+heads, by difference): "
            f"{results['trunk']*1e3:.2f} ms")

    log("---")
    for k, v in results.items():
        log(f"{k:14s} {v*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
