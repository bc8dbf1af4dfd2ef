"""Serving-capacity probe: does a StreamArena of B streams FIT and RUN?

bench.py's scan carries the KV state as a loop value, so the staged
merge scatter under lax.cond holds TWO copies of the cache in the while
body — its OOM point is ~2x cache below the real serving wall.  The
serving arena donates the state into each step (runtime/arena.jit_pinned
+ donate_argnums), so the scatter updates in place; THIS probe builds
the actual arena, warms it (compile + one all-frozen step), then times
all-active device steps.

Through the axon relay the per-call host dispatch does not fully
pipeline, so ms/step here is an UPPER BOUND on device step time — use
bench.py (device-resident scan) for compute truth at sizes it can hold;
use this probe for the capacity wall and large-B step bounds.

Run: python tools/capacity_probe.py --batch 16384 --q8 --conv_chunks 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--path", default="fast")
    ap.add_argument("--slots", default="staged")
    ap.add_argument("--attend_impl", default="pallas")
    ap.add_argument("--q8", action="store_true")
    ap.add_argument("--q8g", action="store_true",
                    help="int8 cache with frozen global scales "
                         "(quant='global' — bf16-speed int8, PERF.md r5)")
    ap.add_argument("--conv_chunks", type=int, default=1)
    ap.add_argument("--hz", type=int, default=20)
    ap.add_argument("--ticks", type=int, default=40)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.runtime.arena import StreamArena
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    cfg = VapConfig(frame_hz=args.hz, context_len_sec=2.5)
    params = synthetic_params(cfg.frame_hz)
    res = {"batch": args.batch, "path": args.path, "slots": args.slots,
           "attend_impl": args.attend_impl,
           "quant_cache": "global" if args.q8g else args.q8,
           "conv_chunks": args.conv_chunks, "hz": args.hz}
    t0 = time.time()
    try:
        arena = StreamArena(cfg, params, capacity=args.batch,
                            path=args.path, dtype=jnp.bfloat16,
                            attend_impl=args.attend_impl,
                            slots=args.slots,
                            quant_cache="global" if args.q8g else args.q8,
                            wire_dtype=np.int16,
                            conv_chunks=args.conv_chunks)
        arena.warmup()
        # block_until_ready returns EARLY through the relay; force a
        # host readback so the warmup execution fully retires before
        # the first timed tick (two in-flight executions double the
        # HBM peak and spuriously exhaust at large B)
        _ = np.asarray(arena.state.kv.count[:1]
                       if hasattr(arena.state, "kv")
                       else jax.tree_util.tree_leaves(arena.state)[0][:1])
    except Exception as e:
        res.update(ok=False, error=f"{type(e).__name__}: {str(e)[:400]}")
        print(json.dumps(res))
        if args.out:
            json.dump(res, open(args.out, "w"), indent=1)
        return
    res["compile_s"] = round(time.time() - t0, 1)

    # all-active ticks from a device-resident chunk; host readback of a
    # scalar syncs the chain (block_until_ready does not, through the
    # relay — ARCHITECTURE.md)
    ch = jax.device_put(np.zeros((args.batch, 2, arena.chunk_samples),
                                 np.int16))
    act = jax.device_put(np.ones((args.batch,), bool))

    def tick():
        # sync EVERY tick: through the relay, un-synced queued steps
        # keep pre-donation buffers alive and exhaust HBM at large B
        t = time.time()
        arena.state, out = arena._dispatch_step()(arena.params,
                                                  arena.state, ch, act)
        _ = np.asarray(out["p_now"][:1])
        return time.time() - t

    for _ in range(4):                        # warm the call path
        tick()
    times = sorted(tick() * 1e3 for _ in range(args.ticks))
    ms = times[len(times) // 2]               # p50 (relay RTT included)
    res.update(ok=True, ms_per_step_upper_bound=round(ms, 2),
               note="per-tick wall INCLUDING one relay round trip "
                    "(~25-45 ms here) — capacity proof + upper bound, "
                    "not compute truth",
               streams_if_realtime=int(args.batch /
                                       max(ms * args.hz / 1e3, 1e-9)))
    print(json.dumps(res))
    if args.out:
        json.dump(res, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
