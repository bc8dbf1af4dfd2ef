"""End-to-end demo: server + wav client + GUI dashboard (headless PNG).

Spins up the realtime TCP server with synthetic weights, streams
synthetic stereo audio through the wav input client, and renders the
live GUI dashboard to a PNG — the whole reference pipeline
(input/wav.py -> vap_main server -> output/gui.py) in one process tree.

Run: python tools/demo_e2e.py --out demo_dashboard.png [--seconds 6]
"""

from __future__ import annotations

import argparse
import os
import socket
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="demo_dashboard.png")
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--mode", choices=["vap", "vad"], default="vad")
    args = ap.parse_args(argv)

    from vap_realtime_tpu.clients.input_wav import main as wav_main
    from vap_realtime_tpu.clients.output_gui import main as gui_main
    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.io.audio import write_wav
    from vap_realtime_tpu.runtime.engine import VapEngine
    from vap_realtime_tpu.runtime.server import VapServer
    from vap_realtime_tpu.weights.synthetic import (
        synthetic_audio, synthetic_params,
    )

    port_in, port_out, port_cmd = free_ports(3)
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    engine = VapEngine(cfg, params=synthetic_params(20), path="kv")
    print("compiling...")
    engine.warmup()
    server = VapServer(engine, mode="vap", port_in=port_in,
                       port_out=port_out)
    server.start_background()
    time.sleep(0.3)

    import tempfile

    audio = synthetic_audio(int(args.seconds * 16000))
    tmp = tempfile.mkdtemp()
    left, right = f"{tmp}/l.wav", f"{tmp}/r.wav"
    write_wav(left, audio[0], 16000)
    write_wav(right, audio[1], 16000)

    producer = threading.Thread(
        target=wav_main,
        args=(["--server_ip", "127.0.0.1", "--port_num", str(port_in),
               "--command_port_num", str(port_cmd),
               "--input_wav_left", left, "--input_wav_right", right],),
        daemon=True)
    producer.start()

    gui_main(["--server_ip", "127.0.0.1", "--port_num", str(port_out),
              "--command_port_num", str(port_cmd),
              "--mode", args.mode, "--headless", args.out,
              "--headless_seconds", str(args.seconds + 1.0)])
    server.stop()
    size = os.path.getsize(args.out)
    print(f"demo complete: {args.out} ({size} bytes), "
          f"streamed {args.seconds}s of audio end-to-end")


if __name__ == "__main__":
    main()
