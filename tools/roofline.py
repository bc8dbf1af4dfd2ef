"""Per-chip roofline report for the VAP hot components.

BASELINE.md deliverable: roofline for the conv encoder and attention
kernels.  Measures each component in steady state (scan-chained, DCE-proof,
readback-synced — see ARCHITECTURE.md "Performance methodology"), computes
analytic FLOPs/bytes, and reports achieved TFLOP/s and GB/s against the
device's measured matmul peak.

Run (on TPU): python tools/roofline.py [--batch 4096] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


_OVERHEAD = [0.0]  # calibrated fixed per-dispatch overhead (relay RTT)


def chain_time(make_step, f_long=16, f_short=4, reps=2) -> float:
    """Steady-state seconds per step via the difference quotient between
    two chain lengths (cancels fixed dispatch overhead; same methodology
    as bench.py)."""
    step = make_step()

    def runner(F):
        def run(carry):
            def body(c, _):
                return step(c), None
            c, _ = jax.lax.scan(body, carry, None, length=F)
            return c
        return jax.jit(run)

    def timed(F):
        runj = runner(F)
        c0 = make_step.init()
        c = runj(c0)  # compile + warm
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], c)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            c = runj(c0)
            jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], c)
            best = min(best, time.perf_counter() - t0)
        return best

    return max((timed(f_long) - timed(f_short)) / (f_long - f_short), 1e-9)


class Component:
    def __init__(self, fn, init, flops, bytes_):
        self.fn = fn
        self.init = init
        self.flops = flops
        self.bytes = bytes_

    def __call__(self, carry):
        return self.fn(carry)


def build_components(B, dtype, cfg, params):
    from vap_realtime_tpu.models.encoder import (
        cpc_conv_stack, cpc_context, downsample,
    )
    from vap_realtime_tpu.runtime import incremental

    D = cfg.dim
    S = cfg.frame_samples
    N = B * 2  # stream-channels
    rs = np.random.RandomState(0)

    comps = {}

    # --- conv encoder stack (conv0..conv4 + norms) ---
    conv_flops = N * 2 * D * (224 * 10 * 1 + 56 * 8 * D + 28 * 4 * D
                              + 14 * 4 * D + 7 * 4 * D)
    wav0 = jnp.asarray(rs.randn(N, S).astype(np.float32) * 0.1, dtype)

    def conv_fn(carry):
        z = cpc_conv_stack(params["encoder"], carry)
        # fold output back into the carry to chain data dependence
        return carry * 0.999 + 1e-3 * jnp.mean(z)

    c = Component(conv_fn, lambda: wav0, conv_flops,
                  N * (S + 224 * D * 4) * np.dtype(np.float32).itemsize)
    c.init = lambda: wav0
    comps["conv_encoder"] = c

    # --- LSTM context net (5 steps at 20 Hz) ---
    T5 = cfg.cpc_frames_per_chunk
    z0 = jnp.asarray(rs.randn(N, T5, D).astype(np.float32) * 0.1, dtype)
    lstm_flops = N * T5 * (2 * D * 4 * D * 2)  # ih + hh matmuls

    def lstm_fn(carry):
        z, h, cc = carry
        y, h2, c2 = cpc_context(params["encoder"], z, h, cc)
        return (z * 0.999 + 1e-3 * jnp.mean(y), h2, c2)

    c = Component(lstm_fn,
                  lambda: (z0, jnp.zeros((N, D), dtype),
                           jnp.zeros((N, D), dtype)),
                  lstm_flops, N * T5 * D * 4 * 3)
    comps["lstm_context"] = c

    # --- incremental trunk step (attention + FFN + heads, KV cache) ---
    state0 = incremental.init_kv_state(cfg, B, dtype)
    chunk0 = jnp.asarray(rs.randn(B, 2, S).astype(np.float32) * 0.1, dtype)
    n_slots = 28
    Tctx = cfg.context_frames
    # projections + attention reads dominate
    attn_flops = B * (42 * D * D * 2 + 14 * Tctx * D * 2 * 2
                      + 6 * 2 * D * 3 * D * 2 + D * 256 * 2)
    cache_bytes = B * Tctx * n_slots * D * jnp.dtype(dtype).itemsize

    def kv_fn(carry):
        st, ch = carry
        st, out = incremental.kv_step(params, st, ch, cfg)
        return (st, ch * 0.999 + 1e-4 * jnp.sum(out["p_now"]).astype(ch.dtype))

    c = Component(kv_fn, lambda: (state0, chunk0),
                  attn_flops + conv_flops + lstm_flops, cache_bytes)
    comps["kv_step_total"] = c
    return comps


def measure_peak(dtype) -> float:
    """Measured matmul peak via chained matmuls; also calibrates the
    fixed per-sample overhead used by chain_time."""
    n = 4096
    a = jnp.ones((n, n), dtype) * 0.001
    f = jax.jit(lambda a, c: a @ c * 0.001)
    c = f(a, a)
    _ = np.asarray(c[0, :1])

    def timed(N):
        t0 = time.perf_counter()
        cc = c
        for _ in range(N):
            cc = f(a, cc)
        _ = np.asarray(cc[0, :1])
        return time.perf_counter() - t0

    t20, t80 = timed(20), timed(80)
    per = (t80 - t20) / 60
    _OVERHEAD[0] = max(t20 - 20 * per, 0.0)
    return 2 * n ** 3 / per


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    args = ap.parse_args()

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    params = jax.device_put(jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype), synthetic_params(20)))

    peak = measure_peak(dtype)
    print(f"device: {jax.devices()[0]}  measured matmul peak: "
          f"{peak/1e12:.0f} TFLOP/s ({args.dtype})")
    print("NOTE: through a shared dev relay these component numbers can "
          "vary run-to-run by >5x; trust them only on directly attached "
          "hardware (bench.py's long end-to-end chains are more stable).")
    print(f"{'component':<16} {'ms/step':>9} {'TFLOP/s':>9} "
          f"{'% peak':>7} {'GB/s':>8}")

    comps = build_components(args.batch, dtype, cfg, params)
    for name, comp in comps.items():
        fn = comp

        class MakeStep:
            def __init__(self, comp):
                self.comp = comp

            def __call__(self):
                return self.comp.fn

            @property
            def init(self):
                return self.comp.init

        dt = chain_time(MakeStep(comp))
        tf = comp.flops / dt / 1e12
        gbs = comp.bytes / dt / 1e9
        print(f"{name:<16} {dt*1e3:9.2f} {tf:9.1f} {100*tf*1e12/peak:6.1f}% "
              f"{gbs:8.0f}")


if __name__ == "__main__":
    main()
