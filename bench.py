"""Benchmark: concurrent real-time VAP streams per chip at RTF < 1.

Measures the batched streaming step (flagship vap_main 20 Hz / 2.5 s
context) in steady state on the default JAX device and reports how many
concurrent real-time 16 kHz stereo dialogue streams one chip sustains
(batch size x frame_period / step_time, maximized over batch size and
over the serving paths).

Serving paths (see runtime/incremental.py):
- full    parity-exact full recompute
- kv      incremental fused-KV cache
- fast    seamless streaming conv + KV (fresh samples only, no 320-
          sample overlap recompute)
- *_pallas  same with the fused single-query attention kernel
            (ops/pallas/attend.py)

Baseline: the reference serves ONE stream per process and is qualitatively
"real-time on CPU" (README.md:26; measured ~28 ms/frame on this host's
CPU, RTF 0.56 at 20 Hz) => baseline = 1 concurrent stream.

Prints exactly one JSON line on stdout.

Env knobs:
  BENCH_BATCHES=4096[,8192]     batch sizes to sweep
  BENCH_VARIANTS=fast_pallas_bf16[,kv_bf16,...]   variants to run
  BENCH_GRID=grid.json          ALSO run the pinned regression matrix
                                ({10,20,50} Hz x {faststaged_pallas,
                                fasthybrid_pallas} x {vap,bc,nod} at
                                serving batch) and write it as JSON
                                (BENCH_GRID_PATHS / BENCH_GRID_BATCH
                                override)
  BENCH_PROFILE=dir             write a TensorBoard trace
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_path(step_fn, init_state_fn, params, cfg, batch: int,
                 chunk_samples: int, f_short: int = 4, f_long: int = 24,
                 dtype=None) -> float:
    """Steady-state seconds per batched frame-step.

    NOTE on methodology: through the axon TPU relay `block_until_ready`
    returns before device execution finishes — only a host readback
    truly synchronizes, with a fixed ~25 ms round-trip.  So each sample
    scans F frames in ONE dispatch and reads back a scalar, and the
    per-step time is the difference quotient between a long and a short
    chain, cancelling the fixed overhead.
    """
    rng = np.random.RandomState(0)
    chunk = jnp.asarray(
        rng.randn(batch, 2, chunk_samples).astype(np.float32) * 0.1)
    state0 = init_state_fn(cfg, batch)
    if dtype is None:
        # compute dtype (NOT the cache dtype — int8-quantized states
        # carry an int8 cache leaf)
        dtype = jax.tree_util.tree_leaves(state0)[0].dtype
    chunk = chunk.astype(dtype)

    def consume(acc, out):
        # consume EVERY output: with only p_now live, XLA DCEs the
        # vad/bc/nod heads — all three modes then measure the identical
        # graph and the step is flattered vs the real serving dispatch,
        # which reads all fields (r5: this also explained r4's phantom
        # 12% vap-vs-bc gap at 10 Hz — pure run variance between
        # identical programs)
        return acc + sum(jnp.sum(v).astype(jnp.float32)
                         for v in out.values())

    # blocked-cadence paths: step_fn = (incr_fn, boundary_fn, block_len)
    # measures an ALIGNED blocked cadence (the arena's host-side
    # dispatch semantics): block_len-1 cond-free steps + 1 cond-free
    # boundary step (hybrid resync every context_frames, or the staged
    # merge every STAGE_S).  The hybrid per-step lax.cond form
    # flip-flops the scan carry's cache layout between the resync
    # branch's gather preference and the incremental path's — TWO
    # full-cache copies (2.9 GB each, ~20 ms/step at B=4096) EVERY
    # iteration (r5 trace); blocked, the relayout amortizes to
    # 1-in-block_len steps.  F then counts BLOCKS.
    hybrid_blocked = isinstance(step_fn, tuple)
    blk_len = 1
    if hybrid_blocked:
        blk_len = step_fn[2] if step_fn[2] > 0 else cfg.context_frames
        step_fn = (step_fn[0], step_fn[1], blk_len)
    steps_per_f = blk_len

    def make_runner(F):
        def run(params, state, chunk):
            # The accumulator keeps the heads alive (no DCE) and the
            # chunk evolves each step so the conv encoder cannot be
            # hoisted out of the loop as loop-invariant.
            if hybrid_blocked:
                incr_fn, boundary_fn, blk = step_fn

                def body_i(carry, _):
                    st, ch, acc = carry
                    st, out = incr_fn(params, st, ch, cfg)
                    acc = consume(acc, out)
                    ch = ch * 0.999 + 1e-4 * acc.astype(ch.dtype)
                    return (st, ch, acc), None

                def body(carry, _):
                    carry, _ = jax.lax.scan(
                        body_i, carry, None, length=blk - 1)
                    st, ch, acc = carry
                    st, out = boundary_fn(params, st, ch, cfg)
                    acc = consume(acc, out)
                    ch = ch * 0.999 + 1e-4 * acc.astype(ch.dtype)
                    return (st, ch, acc), None
            else:
                def body(carry, _):
                    st, ch, acc = carry
                    st, out = step_fn(params, st, ch, cfg)
                    acc = consume(acc, out)
                    ch = ch * 0.999 + 1e-4 * acc.astype(ch.dtype)
                    return (st, ch, acc), None
            (st, ch, acc), _ = jax.lax.scan(
                body, (state, chunk, jnp.float32(0)), None, length=F)
            return acc
        return jax.jit(run)

    def timed(F, reps=2):
        run = make_runner(F)
        _ = float(run(params, state0, chunk))  # compile + warm
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(run(params, state0, chunk))
            best = min(best, time.perf_counter() - t0)
        return best

    if hybrid_blocked:
        # block counts scaled so each sample covers >= the plain-path
        # step counts (blk=8 staged merges vs blk=50 hybrid resyncs)
        blk = step_fn[2]
        f_short, f_long = max(8 // blk, 1), max(40 // blk, 3)
    t_short, t_long = timed(f_short), timed(f_long)
    return max((t_long - t_short) / ((f_long - f_short) * steps_per_f),
               1e-9)


def variant(name: str):
    """name -> (step_fn, init_fn, chunk_kind, dtype).

    Names: {full,kv,kvstream,kvstaged,fast,fastblk,faststream,
    faststaged,hybrid,fasthybrid}[_pallas|_pallas3|_grouped][_q8|_q8g]_
    {f32,bf16}; "q8" = int8 KV cache with per-row dequant scales,
    "q8g" = int8 cache with frozen per-stream scales folded outside the
    attend kernels (quant="global" — the fast int8 form, PERF.md r5).
    chunk_kind: "frame" (16000//hz + 320) or "shift" (16000//hz).
    """
    from vap_realtime_tpu.runtime.incremental import (
        fast_hybrid_step, fast_step, hybrid_step, init_fast_hybrid_state,
        init_fast_state, init_hybrid_state, init_kv_state, kv_step,
    )
    from vap_realtime_tpu.runtime.streaming import (
        init_stream_state, stream_step,
    )

    parts = name.split("_")
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[parts[-1]]
    attend = ("pallas3" if "pallas3" in parts
              else "pallas" if "pallas" in parts
              else "grouped" if "grouped" in parts else "einsum")
    # int8 KV cache: "q8" = per-row scales, "q8g" = frozen global scales
    quant = "global" if "q8g" in parts else ("q8" in parts)
    path = parts[0]
    if path == "full":
        return stream_step, init_stream_state, "frame", dtype
    if path == "kv":
        step = functools.partial(kv_step, slots="global",
                                 attend_impl=attend)
        return step, functools.partial(init_kv_state, quant=quant), \
            "frame", dtype
    if path == "kvstream":
        # per-frame per-stream row scatter (pre-r4 default; "staged"
        # has the same exactness contract at global-slot cost)
        step = functools.partial(kv_step, slots="stream",
                                 attend_impl=attend)
        return step, functools.partial(init_kv_state, quant=quant), \
            "frame", dtype
    if path == "kvstaged":
        # staged slot policy (arena/engine DEFAULT): exact "stream"
        # semantics, write amortized via the frame-major stage
        step = functools.partial(kv_step, slots="staged",
                                 attend_impl=attend)
        return step, functools.partial(init_kv_state, quant=quant,
                                       staged=True), "frame", dtype
    # encoder knobs on the fast paths: BENCH_CONV_IMPL=conv|blocked|fused
    # (streaming conv implementation) and BENCH_CONV_CHUNKS=k (encoder
    # sub-batching — the transient-HBM capacity lever)
    cimpl = os.environ.get("BENCH_CONV_IMPL", "conv")
    cchunks = int(os.environ.get("BENCH_CONV_CHUNKS", "1"))
    if path == "faststaged":
        step = functools.partial(fast_step, slots="staged",
                                 attend_impl=attend, conv_impl=cimpl,
                                 conv_chunks=cchunks)
        return step, functools.partial(init_fast_state, quant=quant,
                                       staged=True, conv_impl=cimpl), \
            "shift", dtype
    if path == "faststagedblk":
        # staged with the HOST-cadence blocked merge (7 cond-free steps
        # + 1 cond-free merge step — the arena's serving dispatch)
        from vap_realtime_tpu.runtime.incremental import STAGE_S
        incr = functools.partial(fast_step, slots="staged",
                                 attend_impl=attend, conv_impl=cimpl,
                                 conv_chunks=cchunks, merge="never")
        mrg = functools.partial(fast_step, slots="staged",
                                attend_impl=attend, conv_impl=cimpl,
                                conv_chunks=cchunks, merge="force")
        return (incr, mrg, STAGE_S), functools.partial(
            init_fast_state, quant=quant, staged=True,
            conv_impl=cimpl), "shift", dtype
    if path == "fast":
        step = functools.partial(fast_step, slots="global",
                                 attend_impl=attend, conv_impl=cimpl,
                                 conv_chunks=cchunks)
        return step, functools.partial(init_fast_state, quant=quant,
                                       conv_impl=cimpl), "shift", dtype
    if path == "fastblk":
        # fast path with the channels-last stride-block matmul conv
        step = functools.partial(fast_step, slots="global",
                                 attend_impl=attend, conv_impl="blocked")
        return step, functools.partial(init_fast_state, quant=quant), \
            "shift", dtype
    if path == "faststream":
        # the pre-r4 per-frame scatter policy (superseded by "staged")
        step = functools.partial(fast_step, slots="stream",
                                 attend_impl=attend)
        return step, functools.partial(init_fast_state, quant=quant), \
            "shift", dtype
    if path == "hybrid":
        # (incr, resync) pair -> measure_path's resync-aligned blocked
        # cadence (serving semantics; the per-step cond form pays two
        # full-cache layout copies EVERY step — r5 trace, PERF.md)
        def incr(p, s, c, cfg):
            return hybrid_step(p, s, c, cfg,
                               resync_every=cfg.context_frames,
                               attend_impl=attend, resync_mode="never")

        def rsnc(p, s, c, cfg):
            return hybrid_step(p, s, c, cfg,
                               resync_every=cfg.context_frames,
                               attend_impl=attend, resync_mode="force")
        # block_len -1 = cfg.context_frames (resolved at measure time)
        return (incr, rsnc, -1), functools.partial(
            init_hybrid_state, quant=quant), "frame", dtype
    if path == "fasthybrid":
        # staged incr branch (the serving default; init staged=True)
        def fincr(p, s, c, cfg):
            return fast_hybrid_step(p, s, c, cfg,
                                    resync_every=cfg.context_frames,
                                    attend_impl=attend,
                                    resync_mode="never")

        def frsnc(p, s, c, cfg):
            return fast_hybrid_step(p, s, c, cfg,
                                    resync_every=cfg.context_frames,
                                    attend_impl=attend,
                                    resync_mode="force")
        return (fincr, frsnc, -1), functools.partial(
            init_fast_hybrid_state, staged=True, quant=quant), \
            "shift", dtype
    raise ValueError(name)


def run_variant(name: str, cfg, params_by_dtype, batch: int):
    step, init, kind, dtype = variant(name)
    chunk_samples = (cfg.frame_samples if kind == "frame"
                     else cfg.frame_shift)
    init_d = functools.partial(init, dtype=dtype)
    params = params_by_dtype[dtype]
    dt = measure_path(step, init_d, params, cfg, batch, chunk_samples,
                      dtype=dtype)
    return dt


def main():
    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    frame_period = 1.0 / cfg.frame_hz

    def params_for(frame_hz, mode="vap"):
        p32 = jax.device_put(jax.tree_util.tree_map(
            jnp.asarray, synthetic_params(frame_hz, mode=mode)))
        return {jnp.float32: p32,
                jnp.bfloat16: jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), p32)}

    params = params_for(20)
    log(f"device: {jax.devices()[0]}")

    batches = [int(b) for b in
               os.environ.get("BENCH_BATCHES", "4096").split(",")]
    # default: only the winning path (remote compiles are slow; the full
    # matrix is one env var away: BENCH_VARIANTS=...)
    keep = os.environ.get(
        "BENCH_VARIANTS",
        # serving default, its global-slot form, and the frozen-scale
        # int8 cache (bf16-speed int8: 2x capacity at ~equal ms/step)
        "faststaged_pallas_bf16,fast_pallas_bf16,faststaged_pallas_q8g_bf16"
    ).split(",")

    best = 0.0
    best_desc = ""
    for name in keep:
        for B in batches:
            try:
                dt = run_variant(name, cfg, params, B)
            except Exception as e:  # OOM etc.
                log(f"{name} B={B}: failed ({type(e).__name__}: {e})")
                break
            streams = B * frame_period / dt
            rtf = dt / frame_period
            log(f"{name} B={B}: {dt*1e3:.2f} ms/step, batch-RTF={rtf:.3f},"
                f" => {streams:,.0f} realtime streams/chip")
            if streams > best:
                best, best_desc = streams, f"{name} B={B}"

    grid_out = os.environ.get("BENCH_GRID")
    if grid_out:
        # pinned regression matrix over the paths that actually serve:
        # {10,20,50} Hz x {faststaged_pallas, fasthybrid_pallas} x
        # {vap,bc,nod} at serving batch (VERDICT r3 item 5; the r1-r3
        # full/kv-only B=1024 grid rows live in BENCH_GRID_r0{1-3}.json).
        # Override with BENCH_GRID_PATHS=kv,full for the legacy matrix.
        gB = int(os.environ.get("BENCH_GRID_BATCH", "4096"))
        gpaths = os.environ.get(
            "BENCH_GRID_PATHS", "faststaged_pallas,fasthybrid_pallas"
        ).split(",")
        grid = {}
        for hz, ctx in [(10, 5.0), (20, 2.5), (50, 1.0)]:
            for mode in ("vap", "bc", "nod"):
                gcfg = VapConfig(frame_hz=hz, context_len_sec=ctx,
                                 mode=mode)
                gparams = params_for(hz, mode)
                for path in gpaths:
                    key = f"{path}_{mode}_{hz}hz"
                    try:
                        dt = run_variant(f"{path}_bf16", gcfg, gparams, gB)
                    except Exception as e:
                        grid[key] = {"error": f"{type(e).__name__}"}
                        continue
                    grid[key] = {
                        "ms_per_step": round(dt * 1e3, 3),
                        "batch": gB,
                        "streams_per_chip": round(gB / (dt * hz)),
                    }
                    log(f"[grid] {key}: {dt*1e3:.2f} ms/step")
                    # write after every entry: remote compiles are slow
                    # enough that a partial grid beats none on timeout
                    with open(grid_out, "w") as f:
                        json.dump(grid, f, indent=2, sort_keys=True)
        log(f"grid written to {grid_out}")

    if os.environ.get("BENCH_PROFILE"):
        # one profiled window of the winning path for TensorBoard
        name = keep[0]
        step, init, kind, dtype = variant(name)
        chunk_samples = (cfg.frame_samples if kind == "frame"
                         else cfg.frame_shift)
        with jax.profiler.trace(os.environ["BENCH_PROFILE"]):
            measure_path(step, functools.partial(init, dtype=dtype),
                         params[dtype], cfg, batches[0], chunk_samples,
                         f_short=2, f_long=6)
        log(f"profile trace written to {os.environ['BENCH_PROFILE']}")

    log(f"best: {best_desc} -> {best:,.0f} streams/chip")
    print(json.dumps({
        "metric": "concurrent_realtime_streams_per_chip",
        "value": round(best),
        "unit": "streams (16kHz stereo, 20Hz frames, RTF<1)",
        "vs_baseline": round(best / 1.0, 1),
    }))


if __name__ == "__main__":
    main()
