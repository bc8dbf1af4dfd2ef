"""Realtime TCP server — wire-compatible with the reference servers.

Mirrors the behavioural contract of rvap/vap_main/vap_main.py:338-527
(and the _bc/_nod variants): one audio producer connects to
`port_num_in` and streams 2560-byte packets (160 interleaved float64
pairs = 10 ms); many consumers connect to `port_num_out` and receive
length-prefixed result packets after every model frame.  The reference's
input/ and output/ client scripts work against this server unchanged.

Differences by design:
- one engine dispatch per frame (jitted step), no torch
- the result-distribution thread blocks on a Condition instead of the
  reference's 10 us busy-poll loop (vap_main.py:420-423)
- mode-switched heads (vap / bc / nod) in one server binary

Run: python -m vap_realtime_tpu.runtime.server --checkpoint_npz w.npz \
        --port_num_in 50007 --port_num_out 50008 --mode vap
"""

from __future__ import annotations

import argparse
import socket
import threading
import time
from typing import Dict, List, Optional

import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.io import wire

HOP_BYTES = 8 * 2 * 160  # float64 x 2 ch x 160 samples (vap_main.py:374)

RESULT_KEYS = {
    "vap": ("p_now", "p_future", "vad"),
    "bc": ("p_bc_react", "p_bc_emo"),
    "nod": ("p_bc", "p_nod_short", "p_nod_long", "p_nod_long_p"),
}


class VapServer:
    def __init__(self, engine, mode: str = "vap", host: str = "127.0.0.1",
                 port_in: int = 50007, port_out: int = 50008,
                 audio_gain: float = 1.0):
        self.engine = engine
        self.mode = mode
        self.host = host
        self.port_in = port_in
        self.port_out = port_out
        self.audio_gain = audio_gain
        self.clients: List[socket.socket] = []
        self._cond = threading.Condition()
        self._latest: Optional[Dict] = None
        self._stop = threading.Event()

    # --- output side -------------------------------------------------------

    def _accept_out(self):
        with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind((self.host, self.port_out))
            s.listen(8)
            s.settimeout(0.5)
            while not self._stop.is_set():
                try:
                    conn, addr = s.accept()
                except socket.timeout:
                    continue
                print("[OUT] Connected by", addr)
                self.clients.append(conn)
                print(f"[OUT] Current client num = {len(self.clients)}")

    def _distribute(self):
        while not self._stop.is_set():
            with self._cond:
                if not self._cond.wait(timeout=0.5):
                    continue
                result = self._latest
            if result is None:
                continue
            payload = wire.frame_result(
                wire.serialize_result(result, self.mode))
            for conn in list(self.clients):
                try:
                    conn.sendall(payload)
                except OSError:
                    try:
                        print("[OUT] Disconnected by", conn.getpeername())
                    except OSError:
                        print("[OUT] Disconnected")
                    self.clients.remove(conn)

    def _publish(self, t: float, x1: np.ndarray, x2: np.ndarray,
                 outs: Dict[str, np.ndarray]):
        result = {"t": t, "x1": x1, "x2": x2}
        for key in RESULT_KEYS[self.mode]:
            v = outs[key][0]
            result[key] = np.atleast_1d(v)
        with self._cond:
            self._latest = result
            self._cond.notify_all()

    # --- input side (main loop) --------------------------------------------

    def _serve_in(self):
        # fast path: pad == 0 and frame == frame_shift, so the
        # accumulate loop naturally feeds fresh-sample chunks with no
        # 320-sample overlap re-send
        pad = self.engine.frame_contxt_padding
        frame = self.engine.chunk_samples
        while not self._stop.is_set():
            try:
                s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
                s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                s.bind((self.host, self.port_in))
                s.listen(1)
                s.settimeout(0.5)
                print("[IN] Waiting for connection of audio input...")
                while not self._stop.is_set():
                    try:
                        conn, addr = s.accept()
                        break
                    except socket.timeout:
                        continue
                else:
                    s.close()
                    return
                print("[IN] Connected by", addr)
                x1 = np.zeros(pad)
                x2 = np.zeros(pad)
                with conn:
                    while not self._stop.is_set():
                        data = wire._read_exact(conn, HOP_BYTES)
                        a1, a2 = wire.conv_bytearray_2_2floatarray(data)
                        if self.audio_gain != 1.0:
                            a1 = a1 * self.audio_gain
                            a2 = a2 * self.audio_gain
                        x1 = np.concatenate([x1, a1])
                        x2 = np.concatenate([x2, a2])
                        if len(x1) < frame:
                            continue
                        outs = self.engine.process_batch(
                            np.stack([x1[:frame], x2[:frame]])[None])
                        self._publish(time.time(), x1[pad:frame],
                                      x2[pad:frame], outs)
                        x1 = x1[frame - pad:]
                        x2 = x2[frame - pad:]
                s.close()
            except ConnectionError:
                print("[IN] Disconnected")
                try:
                    s.close()
                except OSError:
                    pass
                continue
            except OSError as e:
                if self._stop.is_set():
                    return
                print("[IN] socket error:", e)
                time.sleep(0.2)

    def serve_forever(self):
        threading.Thread(target=self._accept_out, daemon=True).start()
        threading.Thread(target=self._distribute, daemon=True).start()
        self._serve_in()

    def start_background(self):
        threading.Thread(target=self._accept_out, daemon=True).start()
        threading.Thread(target=self._distribute, daemon=True).start()
        t = threading.Thread(target=self._serve_in, daemon=True)
        t.start()
        return t

    def stop(self):
        self._stop.set()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vap_model", type=str, default=None)
    ap.add_argument("--cpc_model", type=str, default=None)
    ap.add_argument("--checkpoint_npz", type=str, default=None)
    ap.add_argument("--synthetic_weights", action="store_true")
    ap.add_argument("--port_num_in", type=int, default=50007)
    ap.add_argument("--port_num_out", type=int, default=50008)
    ap.add_argument("--vap_process_rate", type=int, default=20)
    ap.add_argument("--context_len_sec", type=float, default=2.5)
    ap.add_argument("--audio_gain", type=float, default=1.0)
    ap.add_argument("--mode", choices=["vap", "bc", "nod"], default="vap")
    ap.add_argument("--engine_path",
                    choices=["full", "kv", "hybrid", "fast", "fast_hybrid"],
                    default="kv")
    ap.add_argument("--quant_cache", nargs="?", const=True,
                    default=False, choices=[True, "row", "global"],
                    help="int8 KV cache (half HBM traffic, 2x stream "
                         "capacity): bare/'row' = per-row dequant "
                         "scales (~2e-5 deviation); 'global' = frozen "
                         "per-stream scales folded outside the attend "
                         "kernels (the fast int8 form, PERF.md r5)")
    ap.add_argument("--attend_impl",
                    choices=["einsum", "grouped", "pallas", "pallas3"],
                    default="einsum",
                    help="attention backend for kv/fast paths "
                         "(pallas = fused TPU kernel)")
    args = ap.parse_args(argv)

    cfg = VapConfig(frame_hz=args.vap_process_rate,
                    context_len_sec=args.context_len_sec, mode=args.mode)

    from vap_realtime_tpu.runtime.engine import VapEngine
    params = None
    if args.synthetic_weights:
        from vap_realtime_tpu.weights.synthetic import synthetic_params
        params = synthetic_params(cfg.frame_hz, mode=args.mode)
    engine = VapEngine(cfg, params=params, vap_model=args.vap_model,
                       cpc_model=args.cpc_model,
                       checkpoint_npz=args.checkpoint_npz,
                       path=args.engine_path,
                       attend_impl=args.attend_impl,
                       quant_cache=args.quant_cache)
    engine.warmup()
    server = VapServer(engine, mode=args.mode, port_in=args.port_num_in,
                       port_out=args.port_num_out,
                       audio_gain=args.audio_gain)
    print(f"[VAP] serving mode={args.mode} at {cfg.frame_hz} Hz, "
          f"in={args.port_num_in} out={args.port_num_out}")
    server.serve_forever()


if __name__ == "__main__":
    main()
