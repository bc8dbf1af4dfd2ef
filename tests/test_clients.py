"""Client scripts: wav input end-to-end, bar rendering, visualizer HTTP."""

import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

from tests.conftest import load_golden_stream
from vap_realtime_tpu.clients.output_bar import balance_bar, level_bar, prob_bar
from vap_realtime_tpu.clients.output_gui import ResultBuffer
from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.io import wire
from vap_realtime_tpu.io.audio import write_wav
from vap_realtime_tpu.weights.synthetic import synthetic_params


def _free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


def test_bars():
    assert len(level_bar(0.0)) == 40
    assert level_bar(1.0).count("#") == 40
    assert balance_bar(0.5).count("|") == 1
    assert ">" in balance_bar(0.9) and "<" in balance_bar(0.1)
    assert prob_bar(0.5).count("#") == 20


def test_result_buffer_window():
    buf = ResultBuffer("vap", window_sec=1.0)
    for i in range(30):
        buf.add({"t": i * 0.1, "p_now": [0.4, 0.6], "p_future": [0.5, 0.5],
                 "x1": np.zeros(10), "x2": np.zeros(10)})
    t, probs, a1, a2 = buf.snapshot()
    assert t[-1] - t[0] <= 1.0 + 1e-9
    assert probs["p_now"].shape[1] == 2


def test_input_wav_client_end_to_end(tmp_path):
    """input_wav client -> TCP server -> framed results out."""
    golden = load_golden_stream("stream_vap_20hz.npz")
    audio = golden["audio"][:, :2 * 16000]
    left = str(tmp_path / "l.wav")
    right = str(tmp_path / "r.wav")
    write_wav(left, audio[0], 16000)
    write_wav(right, audio[1], 16000)

    from vap_realtime_tpu.clients.input_wav import main as wav_main
    from vap_realtime_tpu.runtime.engine import VapEngine
    from vap_realtime_tpu.runtime.server import VapServer

    port_in, port_out, port_cmd = _free_ports(3)
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    engine = VapEngine(cfg, params=synthetic_params(20), path="kv")
    engine.warmup()
    server = VapServer(engine, mode="vap", port_in=port_in,
                       port_out=port_out)
    server.start_background()
    time.sleep(0.3)

    results = []

    def consume():
        with socket.create_connection(("127.0.0.1", port_out),
                                      timeout=30) as c:
            while len(results) < 5:
                results.append(wire.deserialize_result(
                    wire.read_framed(c), "vap"))

    tc = threading.Thread(target=consume, daemon=True)
    tc.start()
    time.sleep(0.2)

    wav_main(["--server_ip", "127.0.0.1", "--port_num", str(port_in),
              "--command_port_num", str(port_cmd),
              "--input_wav_left", left, "--input_wav_right", right])
    tc.join(timeout=20)
    server.stop()
    assert len(results) >= 5
    assert all(len(r["p_now"]) == 2 for r in results)


def test_visualizer_http(tmp_path):
    csv = tmp_path / "out.csv"
    csv.write_text("time_sec,p_now(0),p_now(1),p_future(0),p_future(1)\n"
                   "0.05,0.4,0.6,0.45,0.55\n0.10,0.5,0.5,0.5,0.5\n")
    wav = str(tmp_path / "a.wav")
    write_wav(wav, np.zeros(1600), 16000)

    from vap_realtime_tpu.clients.visualizer.server import serve

    httpd = serve(str(csv), wav, wav, port=0, block=False)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    html = urllib.request.urlopen(base + "/").read().decode()
    assert "VAP offline prediction visualizer" in html
    js = urllib.request.urlopen(base + "/script.js").read().decode()
    assert "drawProb" in js
    data = json.loads(urllib.request.urlopen(base + "/data").read())
    assert data == [[0.05, 0.4, 0.6, 0.45, 0.55], [0.1, 0.5, 0.5, 0.5, 0.5]]
    audio = urllib.request.urlopen(base + "/audio/left").read()
    assert audio[:4] == b"RIFF"
    httpd.shutdown()
