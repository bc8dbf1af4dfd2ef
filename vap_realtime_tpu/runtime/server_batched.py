"""Batched multi-stream TCP server — many dialogues, one chip.

Protocol extension over the reference's single-stream two-port scheme:
each TCP connection IS one stream — the client sends the same 2560-byte
float64 hop packets (wire-compatible with the reference input clients)
and receives length-prefixed result packets back on the SAME socket
after every model frame.  A ticker thread steps the whole arena in one
jitted dispatch per frame period.

Run: python -m vap_realtime_tpu.runtime.server_batched \
        --checkpoint_npz w.npz --port 50010 --capacity 256 --mode vap
"""

from __future__ import annotations

import argparse
import socket
import threading
import time
from typing import Dict, Optional

import numpy as np

from vap_realtime_tpu.config import FRAME_CONTEXT_PADDING, VapConfig
from vap_realtime_tpu.io import wire
from vap_realtime_tpu.runtime.arena import StreamArena
from vap_realtime_tpu.runtime.server import RESULT_KEYS

HOP_BYTES = 8 * 2 * 160


class _Conn:
    def __init__(self, sock: socket.socket, slot: int, pad: int):
        self.sock = sock
        self.slot = slot
        self.x1 = np.zeros(pad)
        self.x2 = np.zeros(pad)
        self.pending: Optional[np.ndarray] = None  # next ready frame
        self.last_audio: Optional[tuple] = None
        self.lock = threading.Lock()


class BatchedVapServer:
    def __init__(self, arena: StreamArena, mode: str = "vap",
                 host: str = "127.0.0.1", port: int = 50010):
        self.arena = arena
        self.mode = mode
        self.host = host
        self.port = port
        self.conns: Dict[int, _Conn] = {}
        self._pad = (0 if getattr(arena, "path", "kv")
                     in ("fast", "fast_hybrid")
                     else FRAME_CONTEXT_PADDING)
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.bound_port: Optional[int] = None

    # --- per-connection reader ---------------------------------------------

    def _reader(self, conn: _Conn):
        # fast path: pad == 0, frame == frame_shift -> fresh-sample chunks
        frame = self.arena.chunk_samples
        pad = self._pad
        try:
            while not self._stop.is_set():
                data = wire._read_exact(conn.sock, HOP_BYTES)
                a1, a2 = wire.conv_bytearray_2_2floatarray(data)
                with conn.lock:
                    conn.x1 = np.concatenate([conn.x1, a1])
                    conn.x2 = np.concatenate([conn.x2, a2])
                    if len(conn.x1) >= frame:
                        conn.pending = np.stack([conn.x1[:frame],
                                                 conn.x2[:frame]])
                        conn.last_audio = (conn.x1[pad:frame],
                                           conn.x2[pad:frame])
                        conn.x1 = conn.x1[frame - pad:]
                        conn.x2 = conn.x2[frame - pad:]
        except (ConnectionError, OSError):
            pass
        finally:
            self._drop(conn)

    def _drop(self, conn: _Conn):
        with self._lock:
            if self.conns.pop(conn.slot, None) is not None:
                self.arena.remove_stream(conn.slot)
                print(f"[ARENA] stream {conn.slot} closed "
                      f"({self.arena.n_active} active)")
        try:
            conn.sock.close()
        except OSError:
            pass

    # --- ticker: one arena dispatch per frame period -----------------------

    def _ticker(self):
        period = 1.0 / self.arena.cfg.frame_hz
        next_t = time.time()
        while not self._stop.is_set():
            now = time.time()
            if now < next_t:
                time.sleep(min(next_t - now, 0.005))
                continue
            next_t += period
            chunks = {}
            with self._lock:
                conns = list(self.conns.values())
            for c in conns:
                with c.lock:
                    if c.pending is not None:
                        chunks[c.slot] = c.pending
                        c.pending = None
            if not chunks:
                continue
            results = self.arena.step(chunks)
            t = time.time()
            for c in conns:
                if c.slot not in results:
                    continue
                r = results[c.slot]
                x1, x2 = c.last_audio
                payload = {"t": t, "x1": x1, "x2": x2}
                for key in RESULT_KEYS[self.mode]:
                    payload[key] = np.atleast_1d(r[key])
                try:
                    c.sock.sendall(wire.frame_result(
                        wire.serialize_result(payload, self.mode)))
                except OSError:
                    self._drop(c)

    # --- accept loop --------------------------------------------------------

    def serve_forever(self):
        threading.Thread(target=self._ticker, daemon=True).start()
        with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind((self.host, self.port))
            self.bound_port = s.getsockname()[1]
            s.listen(64)
            s.settimeout(0.5)
            print(f"[ARENA] capacity {self.arena.capacity} at "
                  f"{self.host}:{self.bound_port}")
            while not self._stop.is_set():
                try:
                    sock, addr = s.accept()
                except socket.timeout:
                    continue
                slot = self.arena.add_stream()
                if slot is None:
                    print("[ARENA] full, rejecting", addr)
                    sock.close()
                    continue
                conn = _Conn(sock, slot, self._pad)
                with self._lock:
                    self.conns[slot] = conn
                print(f"[ARENA] stream {slot} from {addr} "
                      f"({self.arena.n_active} active)")
                threading.Thread(target=self._reader, args=(conn,),
                                 daemon=True).start()

    def start_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        while self.bound_port is None and t.is_alive():
            time.sleep(0.01)
        return t

    def stop(self):
        self._stop.set()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vap_model", default=None)
    ap.add_argument("--cpc_model", default=None)
    ap.add_argument("--checkpoint_npz", default=None)
    ap.add_argument("--synthetic_weights", action="store_true")
    ap.add_argument("--port", type=int, default=50010)
    ap.add_argument("--capacity", type=int, default=256)
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
    ap.add_argument("--attend_impl",
                    choices=["einsum", "grouped", "pallas", "pallas3"],
                    default="einsum")
    ap.add_argument("--bf16", action="store_true")
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

    arena = StreamArena(cfg, params, capacity=args.capacity,
                        path=args.engine_path,
                        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                        attend_impl=args.attend_impl,
                        slots=args.slots,
                        quant_cache=args.quant_cache)
    arena.warmup()
    BatchedVapServer(arena, mode=args.mode, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
