"""Native-ingest batched server — C++ epoll IO + one jitted dispatch/tick.

Same protocol as runtime/server_batched.py (connection == stream, hop
packets in, length-prefixed results back on the same socket) but ALL
socket work happens in native/ingest.cpp: Python touches one ctypes poll
per tick and one arena dispatch, so stream count is bounded by the chip,
not the interpreter.  Slot lifecycle is driven by the engine's per-slot
generation counters (reuse -> arena state reset).

Run: python -m vap_realtime_tpu.runtime.server_native \
        --checkpoint_npz w.npz --port 50011 --capacity 4096 --bf16
"""

from __future__ import annotations

import argparse
import time
from typing import Optional

import jax
import numpy as np

from vap_realtime_tpu.config import FRAME_CONTEXT_PADDING, VapConfig
from vap_realtime_tpu.io.native_ingest import NativeIngest
from vap_realtime_tpu.runtime.arena import StreamArena
from vap_realtime_tpu.runtime.server import RESULT_KEYS


class NativeVapServer:
    def __init__(self, arena: StreamArena, mode: str = "vap",
                 port: int = 50011, wire_int16: bool = False):
        self.arena = arena
        self.mode = mode
        # fast path: native assembler emits disjoint fresh-sample chunks
        # (frame_shift samples, overlap 0) instead of overlapped frames
        self._pad = (0 if getattr(arena, "path", "kv")
                     in ("fast", "fast_hybrid")
                     else FRAME_CONTEXT_PADDING)
        # int16-wire + int16-capable arena: keep frames int16 end to end
        # (normalized on device; 4x lower host->device transfer)
        self._i16 = bool(wire_int16) and np.dtype(
            getattr(arena, "wire_dtype", np.float32)) == np.int16
        self.ingest = NativeIngest(port, arena.capacity,
                                   arena.chunk_samples, wire_int16,
                                   overlap=self._pad,
                                   emit_i16=self._i16)
        self.port = self.ingest.port
        self._gens = np.zeros((arena.capacity,), np.int64)
        self._stop = False
        self.frames_served = 0
        # one-tick pipeline: (slots, audio-echo, device outputs) of the
        # previous dispatch; its results are fetched while the current
        # dispatch runs, so the host<->device round trips (2x ~25 ms
        # through a remote device link) hide behind compute instead of
        # serializing into the tick
        self._pending = None
        # per-phase tick time accumulators (seconds): dispatch =
        # device_put + jit call; fetch = batched device_get of the
        # previous tick's outputs; send = wire serialization + queue
        self.tick_stats = {"n": 0, "dispatch": 0.0, "fetch": 0.0,
                           "send": 0.0}

    def tick(self) -> int:
        """One serving tick: drain ready frames, detect slot reuse,
        dispatch one arena step, ship the PREVIOUS step's results.
        Returns #streams served (dispatched) this tick.

        Host-CPU design (measured with tools/serving_bench.py
        --stub_device): the dispatch rides the poll buffer straight
        into the jitted step (step_device_batch — no per-slot Python
        loop), and the result echo + f64 wire serialization + socket
        queueing all happen on the NATIVE builder thread
        (ingest.send_results), overlapped with the next tick.  poll()
        double-buffers its frame array, so the PREVIOUS tick's audio is
        intact when its results ship one tick later."""
        slots, frames = self.ingest.poll()
        t0 = time.time()
        gens_now = self.ingest.generations()      # one native call
        if slots:
            sarr = np.asarray(slots)
            fresh = sarr[gens_now[sarr] != self._gens[sarr]]
            if len(fresh):
                # ONE batched reset — per-slot calls pay a device round
                # trip each (a connection ramp carries thousands/tick)
                self.arena.reset_slots(fresh.tolist())
                self._gens[fresh] = gens_now[fresh]
            out_dev = self.arena.step_device_batch(frames, sarr)
            # snapshot each dispatched slot's generation NOW: the
            # stale-result check at send time must compare against the
            # generation the result was computed FOR, not against
            # self._gens (which a same-tick reuse already advanced)
            prev, self._pending = self._pending, (
                sarr, frames, out_dev, gens_now[sarr].copy())
            self.tick_stats["n"] += 1
        else:
            prev, self._pending = self._pending, None
        t1 = time.time()
        self.tick_stats["dispatch"] += t1 - t0
        if prev is None:
            return len(slots) if slots else 0
        p_slots, p_frames, p_out, p_gens = prev
        out_np = jax.device_get(p_out)    # ONE batched readback
        self.tick_stats["fetch"] += time.time() - t1
        t = time.time()
        n = len(p_slots)
        mats = [np.asarray(out_np[key], np.float32)[p_slots]
                .reshape(n, -1) for key in RESULT_KEYS[self.mode]]
        probs = np.concatenate(mats, axis=1)
        # the native builder re-checks each slot's generation against
        # the dispatch-time snapshot at queue time, so a connection
        # reused ANYWHERE between dispatch and send never receives the
        # previous connection's result
        self.ingest.send_results(
            p_slots, p_gens, t, p_frames, self._pad, probs,
            [m.shape[1] for m in mats])
        self.frames_served += n
        self.tick_stats["send"] += time.time() - t
        return len(slots) if slots else 0

    def serve_forever(self):
        period = 1.0 / self.arena.cfg.frame_hz
        next_t = time.time()
        try:
            while not self._stop:
                now = time.time()
                if now < next_t:
                    time.sleep(min(next_t - now, 0.005))
                    continue
                next_t += period
                self.tick()
        finally:
            # the engine must be destroyed by the loop that uses it —
            # closing from another thread mid-tick is a use-after-free
            self.ingest.close()
            self._stopped = True

    def stop(self, timeout: float = 5.0):
        self._stop = True
        deadline = time.time() + timeout
        while not getattr(self, "_stopped", False) and time.time() < deadline:
            time.sleep(0.01)


def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vap_model", default=None)
    ap.add_argument("--cpc_model", default=None)
    ap.add_argument("--checkpoint_npz", default=None)
    ap.add_argument("--synthetic_weights", action="store_true")
    ap.add_argument("--port", type=int, default=50011)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--vap_process_rate", type=int, default=20)
    ap.add_argument("--context_len_sec", type=float, default=2.5)
    ap.add_argument("--mode", choices=["vap", "bc", "nod"], default="vap")
    ap.add_argument("--engine_path",
                    choices=["full", "kv", "hybrid", "fast", "fast_hybrid"],
                    default="kv")
    ap.add_argument("--slots", choices=["stream", "global", "staged"],
                    default="staged",
                    help="KV write-slot policy: 'staged' (default) = "
                         "exact per-stream isolation at global-slot "
                         "cost; 'stream' = per-frame scatter (same "
                         "contract, slower); 'global' = scalar-slot "
                         "write for cohorts that tick together "
                         "(PERF.md r4)")
    ap.add_argument("--quant_cache", nargs="?", const=True,
                    default=False, choices=[True, "row", "global"],
                    help="int8 KV cache (half HBM traffic, 2x stream "
                         "capacity): bare/'row' = per-row dequant "
                         "scales (~2e-5 deviation); 'global' = frozen "
                         "per-stream scales folded outside the attend "
                         "kernels (the fast int8 form, PERF.md r5)")
    ap.add_argument("--conv_chunks", type=int, default=1,
                    help="sub-batch the fast-path encoder into k "
                         "lax.map slices (conv transient HBM scales "
                         "with capacity/k — the capacity lever for "
                         ">12k-stream arenas; identical numerics)")
    ap.add_argument("--attend_impl",
                    choices=["einsum", "grouped", "pallas", "pallas3"],
                    default="einsum")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--wire_int16", action="store_true",
                    help="accept int16 hop packets (4x lower bandwidth)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    cfg = VapConfig(frame_hz=args.vap_process_rate,
                    context_len_sec=args.context_len_sec, mode=args.mode)
    if args.synthetic_weights:
        from vap_realtime_tpu.weights.synthetic import synthetic_params
        params = synthetic_params(cfg.frame_hz, mode=args.mode)
    elif args.checkpoint_npz:
        from vap_realtime_tpu.weights.convert import load_pytree_npz
        params = load_pytree_npz(args.checkpoint_npz)
    else:
        from vap_realtime_tpu.weights.convert import load_torch_checkpoint
        params = load_torch_checkpoint(args.vap_model, args.cpc_model)

    import numpy as _np
    arena = StreamArena(cfg, params, capacity=args.capacity,
                        path=args.engine_path,
                        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                        attend_impl=args.attend_impl,
                        slots=args.slots,
                        quant_cache=args.quant_cache,
                        conv_chunks=args.conv_chunks,
                        wire_dtype=_np.int16 if args.wire_int16
                        else _np.float32)
    arena.warmup()
    server = NativeVapServer(arena, mode=args.mode, port=args.port,
                             wire_int16=args.wire_int16)
    print(f"[NATIVE] capacity {args.capacity} at 127.0.0.1:{server.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
