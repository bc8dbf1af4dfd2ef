"""Server failure handling: input client disconnect -> re-listen -> new
client continues (reference contract: vap_main.py:411-414)."""

import socket
import threading
import time

import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.io import wire
from vap_realtime_tpu.runtime.engine import VapEngine
from vap_realtime_tpu.runtime.server import VapServer
from vap_realtime_tpu.weights.synthetic import synthetic_audio, synthetic_params


def _port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_input_reconnect():
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    engine = VapEngine(cfg, params=synthetic_params(20), path="full")
    engine.warmup()
    port_in, port_out = _port(), _port()
    server = VapServer(engine, mode="vap", port_in=port_in,
                       port_out=port_out)
    server.start_background()
    time.sleep(0.3)

    results = []

    def consume():
        with socket.create_connection(("127.0.0.1", port_out),
                                      timeout=30) as c:
            while len(results) < 4:
                results.append(wire.deserialize_result(
                    wire.read_framed(c), "vap"))

    threading.Thread(target=consume, daemon=True).start()
    time.sleep(0.2)

    audio = synthetic_audio(16000).astype(np.float64)

    def send_hops(n):
        with socket.create_connection(("127.0.0.1", port_in),
                                      timeout=10) as p:
            for h in range(n):
                p.sendall(wire.conv_2floatarray_2_bytearray(
                    audio[0, h * 160:(h + 1) * 160],
                    audio[1, h * 160:(h + 1) * 160]))
                time.sleep(0.005)

    send_hops(12)            # ~2 frames, then DISCONNECT
    time.sleep(0.5)          # server must re-listen
    send_hops(12)            # new client, 2 more frames
    deadline = time.time() + 20
    while len(results) < 4 and time.time() < deadline:
        time.sleep(0.1)
    server.stop()
    assert len(results) >= 4, f"only {len(results)} results after reconnect"
