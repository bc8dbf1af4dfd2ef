"""Scatter lab: is a staged S-row merge cheaper than S per-frame scatters?

The ``slots="stream"`` per-frame row scatter costs +7.1 ms/step over the
global DUS (PERF.md r3) — the served-default tax.  The staged design
(PERF.md lever 2 + VERDICT r4 item 2) writes each frame's rows to a
small frame-major stage (tile-complete DUS, ~free) and merges S=8
frames into the ring in ONE S-row scatter every S frames.  Whether that
wins depends entirely on how XLA lowers the S-row scatter — measured
here on the real cache shapes:

  dus1      per-frame global DUS             (B, P, 1, 4D) @ scalar slot
  scat1     per-frame per-stream row scatter (the r3 "stream" write)
  scat8     8-row per-stream scatter         (the staged merge), /8
  stage_w   per-frame stage write            (S, B, P*4D) leading-axis DUS
  dus8      8-row aligned global DUS, /8     (the staged-global merge)

Run (TPU): python tools/scatter_lab.py --batch 4096
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(runner, args, f_short=4, f_long=24, reps=2):
    def t(F):
        run = runner(F)
        _ = float(run(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return max((t(f_long) - t(f_short)) / (f_long - f_short), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--T", type=int, default=50)
    ap.add_argument("--S", type=int, default=8)
    args = ap.parse_args()
    B, T, S, P, D4 = args.batch, args.T, args.S, 7, 1024
    rng = np.random.RandomState(0)
    cache = jax.device_put(jnp.zeros((B, P, T, D4), jnp.bfloat16))
    rows = jax.device_put(jnp.asarray(
        rng.randn(B, P, D4).astype(np.float32)).astype(jnp.bfloat16))
    rows8 = jax.device_put(jnp.asarray(
        rng.randn(B, S, P, D4).astype(np.float32)).astype(jnp.bfloat16))
    stage = jax.device_put(jnp.zeros((S, B, P * D4), jnp.bfloat16))
    count0 = jax.device_put(jnp.arange(B, dtype=jnp.int32) % 11)
    b_ix = jnp.arange(B)
    log(f"device: {jax.devices()[0]}  B={B} T={T} S={S}")
    results = {}

    def mk(body):
        def runner(F):
            @jax.jit
            def run(cache, rows, count):
                def step(carry, _):
                    c, r, n = carry
                    c, r, n = body(c, r, n)
                    return (c, r, n), None
                (c, r, n), _ = jax.lax.scan(
                    step, (cache, rows, count), None, length=F)
                return jnp.sum(c[:, :, :, 0].astype(jnp.float32))
            return run
        return runner

    # per-frame global DUS (r3 "global")
    def dus1(c, r, n):
        c = jax.lax.dynamic_update_slice(
            c, r[:, :, None, :], (0, 0, n[0] % T, 0))
        return c, r * 0.999, n + 1
    results["dus1"] = timeit(mk(dus1), (cache, rows, count0))
    log(f"dus1    (global per-frame DUS):   {results['dus1']*1e3:7.2f} ms/frame")

    # per-frame per-stream scatter (r3 "stream")
    def scat1(c, r, n):
        idx = n % T
        c = c.at[b_ix, :, idx].set(r, mode="drop", unique_indices=True)
        return c, r * 0.999, n + 1
    results["scat1"] = timeit(mk(scat1), (cache, rows, count0))
    log(f"scat1   (stream per-frame scatter):{results['scat1']*1e3:6.2f} ms/frame")

    # staged merge: 8-row per-stream scatter every S frames (cost /S)
    def mk8(body):
        def runner(F):
            @jax.jit
            def run(cache, rows8, count):
                def step(carry, _):
                    c, r, n = carry
                    c, r, n = body(c, r, n)
                    return (c, r, n), None
                (c, r, n), _ = jax.lax.scan(
                    step, (cache, rows8, count), None, length=F)
                return jnp.sum(c[:, :, :, 0].astype(jnp.float32))
            return run
        return runner

    # values are (B, S, P, D4) to match the advanced-index result layout
    def scat8v(c, r, n):
        # indices: S consecutive own-frames per stream
        idx = (n[:, None] + jnp.arange(S)[None, :]) % T       # (B, S)
        c = c.at[b_ix[:, None], :, idx].set(
            r, mode="drop", unique_indices=True)
        return c, r * 0.999, n + S
    results["scat8"] = timeit(mk8(scat8v), (cache, rows8, count0)) / S
    log(f"scat8   (staged merge scatter /S): {results['scat8']*1e3:6.2f} ms/frame")

    # stage write: leading-axis DUS into the small frame-major buffer
    def mkstage():
        def runner(F):
            @jax.jit
            def run(stage, rows, count):
                def step(carry, _):
                    st, r, n = carry
                    st = jax.lax.dynamic_update_slice(
                        st, r.reshape(1, B, P * D4), (n[0] % S, 0, 0))
                    return (st, r * 0.999, n + 1), None
                (st, r, n), _ = jax.lax.scan(
                    step, (stage, rows, count), None, length=F)
                return jnp.sum(st[:, :, 0].astype(jnp.float32))
            return run
        return runner
    results["stage_w"] = timeit(mkstage(), (stage, rows, count0))
    log(f"stage_w (per-frame stage DUS):     {results['stage_w']*1e3:6.2f} ms/frame")

    # staged-global merge: 8 aligned rows in one DUS every S frames
    def dus8v(c, r, n):
        base = (n[0] // S * S) % T
        c = jax.lax.dynamic_update_slice(
            c, jnp.swapaxes(r, 1, 2), (0, 0, base, 0))
        return c, r * 0.999, n + S
    results["dus8"] = timeit(mk8(dus8v), (cache, rows8, count0)) / S
    log(f"dus8    (8-row aligned DUS /S):    {results['dus8']*1e3:6.2f} ms/frame")

    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
