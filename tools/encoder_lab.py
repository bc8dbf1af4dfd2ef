"""Encoder conv-stack ablation lab (real TPU).

Times the streaming CPC conv stack impls in isolation with the bench's
difference-quotient scan methodology (evolving inputs, consumed outputs,
carried state — ARCHITECTURE.md):

    python tools/encoder_lab.py --impls conv,fused --batch 8192 --hz 20

batch counts CHANNEL-streams (2x serving streams).  The r5 motivation:
the device trace pins the five NCW ChannelNorm stats/apply passes at
~6.3 ms/step at B=4096 serving streams; the fused Pallas kernel
(ops/pallas/encoder.py) keeps the whole stack in VMEM.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure(step, state0, chunk, params, f_short=8, f_long=40, reps=3):
    def make(F):
        def run(params, state, chunk):
            def body(carry, _):
                st, ch, acc = carry
                z, st = step(params, ch, st)
                acc = acc + jnp.sum(z.astype(jnp.float32))
                ch = ch * 0.999 + 1e-4 * acc.astype(ch.dtype)
                return (st, ch, acc), None
            (st, ch, acc), _ = jax.lax.scan(
                body, (state, chunk, jnp.float32(0)), None, length=F)
            return acc
        return jax.jit(run)

    def timed(F):
        run = make(F)
        _ = float(run(params, state0, chunk))     # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(params, state0, chunk))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(f_long) - timed(f_short)) / (f_long - f_short)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--impls", default="conv,fused")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--hz", type=int, default=20)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--block_b", type=int, default=16)
    args = ap.parse_args()

    from vap_realtime_tpu.models.encoder import (
        cpc_conv_stack_streaming, cpc_conv_stack_streaming_blocked,
        init_conv_stream_state, init_cpc_encoder_params,
    )
    from vap_realtime_tpu.ops.pallas.encoder import (
        cpc_conv_stack_streaming_fused, init_conv_stream_state_fused,
    )

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    L = 16000 // args.hz
    B = args.batch
    params = init_cpc_encoder_params(jax.random.PRNGKey(0))
    params = jax.device_put(
        jax.tree_util.tree_map(lambda x: x.astype(dt), params))
    rs = np.random.RandomState(0)
    chunk = jax.device_put(
        jnp.asarray(rs.randn(B, L).astype(np.float32) * 0.1).astype(dt))

    print(f"device {jax.devices()[0]}  B={B} chan-streams  L={L}  "
          f"{args.dtype}")
    for impl in args.impls.split(","):
        if impl == "conv":
            step = lambda p, ch, st: cpc_conv_stack_streaming(p, ch, st)
            st0 = init_conv_stream_state(B, dtype=dt)
        elif impl == "normk":
            from vap_realtime_tpu.models.encoder import (
                cpc_conv_stack_streaming_normk,
            )
            step = lambda p, ch, st: cpc_conv_stack_streaming_normk(
                p, ch, st)
            st0 = init_conv_stream_state(B, dtype=dt)
        elif impl == "blocked":
            step = lambda p, ch, st: cpc_conv_stack_streaming_blocked(
                p, ch, st)
            st0 = init_conv_stream_state(B, dtype=dt)
        elif impl.startswith("fused"):
            # syntax: fused[:mode][:ablate][@block_b], e.g.
            # fused:merge8@32, fused:taps20:dma
            bb = args.block_b
            if "@" in impl:
                impl, bbs = impl.split("@")
                bb = int(bbs)
            parts_ = impl.split(":")
            mode = parts_[1] if len(parts_) > 1 else "merge8"
            ablate = parts_[2] if len(parts_) > 2 else ""

            def step(p, ch, st, _bb=bb, _m=mode, _a=ablate):
                from vap_realtime_tpu.ops.pallas.encoder import (
                    cpc_conv_stack_streaming_fused,
                )
                return cpc_conv_stack_streaming_fused(
                    p, ch, st, block_b=_bb, mode=_m, ablate=_a)

            st0 = init_conv_stream_state_fused(B, dtype=dt)
        else:
            raise SystemExit(f"unknown impl {impl}")
        try:
            t = measure(step, st0, chunk, params)
            print(f"  {impl:8s}: {t * 1e3:7.3f} ms/step")
        except Exception as e:  # compile failures are data too
            print(f"  {impl:8s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
