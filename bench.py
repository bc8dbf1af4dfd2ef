"""Benchmark: concurrent real-time VAP streams per chip at RTF < 1.

Measures the batched streaming step (flagship vap_main 20 Hz / 2.5 s
context) in steady state on the default JAX device and reports how many
concurrent real-time 16 kHz stereo dialogue streams one chip sustains
(batch size x frame_period / step_time, maximized over batch size and
over the two serving paths: parity-exact full recompute and incremental
KV cache).

Baseline: the reference serves ONE stream per process and is qualitatively
"real-time on CPU" (README.md:26; measured ~28 ms/frame on this host's
CPU, RTF 0.56 at 20 Hz) => baseline = 1 concurrent stream.

Prints exactly one JSON line on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_path(step_fn, init_state_fn, params, cfg, batch: int,
                 f_short: int = 4, f_long: int = 24) -> float:
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
        rng.randn(batch, 2, cfg.frame_samples).astype(np.float32) * 0.1)
    state0 = init_state_fn(cfg, batch)
    dtype = jax.tree_util.tree_leaves(state0)[0].dtype
    chunk = chunk.astype(dtype)

    def make_runner(F):
        def run(params, state, chunk):
            # The accumulator keeps the heads alive (no DCE) and the
            # chunk evolves each step so the conv encoder cannot be
            # hoisted out of the loop as loop-invariant.
            def body(carry, _):
                st, ch, acc = carry
                st, out = step_fn(params, st, ch, cfg)
                acc = acc + jnp.sum(out["p_now"]).astype(jnp.float32)
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

    t_short, t_long = timed(f_short), timed(f_long)
    return max((t_long - t_short) / (f_long - f_short), 1e-9)


def main():
    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.runtime.incremental import init_kv_state, kv_step
    from vap_realtime_tpu.runtime.streaming import (
        init_stream_state, stream_step,
    )
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    import functools
    import os

    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    frame_period = 1.0 / cfg.frame_hz
    params_f32 = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, synthetic_params(20)))
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params_f32)

    log(f"device: {jax.devices()[0]}")

    batches = [int(b) for b in
               os.environ.get("BENCH_BATCHES", "4096").split(",")]
    variants = {
        "full_recompute_bf16": (stream_step, functools.partial(
            init_stream_state, dtype=jnp.bfloat16), params_bf16, batches),
        "kv_incremental_bf16": (kv_step, functools.partial(
            init_kv_state, dtype=jnp.bfloat16), params_bf16, batches),
        "full_recompute_f32": (stream_step, init_stream_state, params_f32,
                               batches),
        "kv_incremental_f32": (kv_step, init_kv_state, params_f32,
                               batches),
    }
    # default: only the winning path (remote compiles are slow; the full
    # matrix is one env var away: BENCH_VARIANTS=...)
    keep = os.environ.get("BENCH_VARIANTS",
                          "kv_incremental_bf16").split(",")
    variants = {k: v for k, v in variants.items() if k in keep}

    best = 0.0
    best_desc = ""
    for name, (step, init, params, bs) in variants.items():
        for B in bs:
            try:
                dt = measure_path(step, init, params, cfg, B)
            except Exception as e:  # OOM etc.
                log(f"{name} B={B}: failed ({type(e).__name__})")
                break
            streams = B * frame_period / dt
            rtf = dt / frame_period
            log(f"{name} B={B}: {dt*1e3:.2f} ms/step, batch-RTF={rtf:.3f}, "
                f"=> {streams:,.0f} realtime streams/chip")
            if streams > best:
                best, best_desc = streams, f"{name} B={B}"

    if os.environ.get("BENCH_PROFILE"):
        # one profiled window of the winning path for TensorBoard
        name, (step, init, params_v, bs) = next(iter(variants.items()))
        with jax.profiler.trace(os.environ["BENCH_PROFILE"]):
            measure_path(step, init, params_v, cfg, bs[0], f_short=2,
                         f_long=6)
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
