"""End-to-end serving tests: offline CSV runner + TCP server loopback.

The server test exercises the FULL wire path — 10 ms float64 hops into
the input socket, length-prefixed results out — and checks the values
against the same golden stream the parity tests use.
"""

import os
import socket
import threading
import time

import numpy as np
import pytest

from tests.conftest import load_golden_stream
from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.io import wire
from vap_realtime_tpu.io.audio import read_wav, write_wav
from vap_realtime_tpu.weights.synthetic import synthetic_params


def test_wav_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    data = np.clip(rs.randn(1600, 2) * 0.1, -1, 1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, data, 16000)
    back, rate = read_wav(p)
    assert rate == 16000
    assert back.shape == (1600, 2)
    np.testing.assert_allclose(back, data, atol=1.0 / 32768)


def test_offline_cli(tmp_path):
    golden = load_golden_stream("stream_vap_20hz.npz")
    audio = golden["audio"]
    left = str(tmp_path / "l.wav")
    right = str(tmp_path / "r.wav")
    write_wav(left, audio[0], 16000)
    write_wav(right, audio[1], 16000)
    out_csv = str(tmp_path / "out.csv")

    from vap_realtime_tpu.runtime.offline import main
    main(["--input_wav_left", left, "--input_wav_right", right,
          "--filename_output", out_csv, "--vap_process_rate", "20",
          "--context_len_sec", "2.5", "--synthetic_weights"])

    rows = np.loadtxt(out_csv, delimiter=",", skiprows=1)
    assert rows.shape[0] == golden["p_now"].shape[0]
    # WAV quantization (16-bit) perturbs inputs; compare loosely
    np.testing.assert_allclose(rows[:, 1:3], golden["p_now"], atol=2e-2)
    np.testing.assert_allclose(rows[:, 0], golden["t"], atol=1e-6)


@pytest.fixture(scope="module")
def server_ports():
    socks = []
    ports = []
    for _ in range(2):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        ports.append(s.getsockname()[1])
        socks.append(s)
    for s in socks:
        s.close()
    return ports


def test_tcp_server_loopback(server_ports):
    golden = load_golden_stream("stream_vap_20hz.npz")
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)

    from vap_realtime_tpu.runtime.engine import VapEngine
    from vap_realtime_tpu.runtime.server import VapServer

    engine = VapEngine(cfg, params=synthetic_params(20), path="full")
    engine.warmup()
    port_in, port_out = server_ports
    server = VapServer(engine, mode="vap", port_in=port_in,
                       port_out=port_out)
    server.start_background()
    time.sleep(0.5)

    # result consumer
    results = []

    def consume():
        with socket.create_connection(("127.0.0.1", port_out),
                                      timeout=30) as c:
            while len(results) < 10:
                results.append(wire.deserialize_result(
                    wire.read_framed(c), "vap"))

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.3)

    # audio producer: stream 10 ms hops
    audio = golden["audio"].astype(np.float64)
    with socket.create_connection(("127.0.0.1", port_in), timeout=10) as p:
        n_hops = (14 * 800) // 160  # enough for >10 frames at 20 Hz
        for h in range(n_hops):
            b = wire.conv_2floatarray_2_bytearray(
                audio[0, h * 160:(h + 1) * 160],
                audio[1, h * 160:(h + 1) * 160])
            p.sendall(b)
            time.sleep(0.002)
        t.join(timeout=30)
    server.stop()

    assert len(results) >= 10

    # Expected values: the server prepends 320 zero samples before the
    # first hop (reference semantics, vap_main.py:368-369), so its frames
    # sit at audio[800k-320 : 800k+800] — emulate with zero-padded audio.
    import jax
    import jax.numpy as jnp
    from vap_realtime_tpu.runtime.streaming import (
        frame_audio, init_stream_state, run_frames,
    )
    padded = np.concatenate(
        [np.zeros((2, 320)), audio[:, :800 * 12]], axis=1)
    frames = jnp.asarray(frame_audio(padded, cfg)[:, None])
    run = jax.jit(run_frames, static_argnums=3)
    _, expect = run(synthetic_params(20), init_stream_state(cfg, 1),
                    frames, cfg)

    got = np.array([r["p_now"] for r in results[:10]])
    np.testing.assert_allclose(got, np.asarray(expect["p_now"][:10, 0]),
                               atol=1e-4)
    # x1 payload = the frame's fresh samples (800 @ 20 Hz)
    assert len(results[0]["x1"]) == cfg.frame_shift
    np.testing.assert_allclose(results[0]["x1"], audio[0, :800],
                               atol=1e-12)


def test_tcp_server_fast_path(server_ports):
    """The fast path served end-to-end over the reference wire protocol:
    the server assembles disjoint fresh-sample chunks (no 320-sample
    overlap re-send) and results match run_frames_fast on the same
    chunks (VERDICT r2 next-#1 'server smoke test serves fast')."""
    golden = load_golden_stream("stream_vap_20hz.npz")
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)

    from vap_realtime_tpu.runtime.engine import VapEngine
    from vap_realtime_tpu.runtime.server import VapServer

    params = synthetic_params(20)
    engine = VapEngine(cfg, params=params, path="fast")
    assert engine.chunk_samples == cfg.frame_shift
    assert engine.frame_contxt_padding == 0
    engine.warmup()
    port_in, port_out = server_ports
    server = VapServer(engine, mode="vap", port_in=port_in,
                       port_out=port_out)
    server.start_background()
    time.sleep(0.5)

    results = []

    def consume():
        with socket.create_connection(("127.0.0.1", port_out),
                                      timeout=30) as c:
            while len(results) < 8:
                results.append(wire.deserialize_result(
                    wire.read_framed(c), "vap"))

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.3)

    audio = golden["audio"].astype(np.float64)
    with socket.create_connection(("127.0.0.1", port_in), timeout=10) as p:
        n_hops = (10 * 800) // 160
        for h in range(n_hops):
            b = wire.conv_2floatarray_2_bytearray(
                audio[0, h * 160:(h + 1) * 160],
                audio[1, h * 160:(h + 1) * 160])
            p.sendall(b)
            time.sleep(0.002)
        t.join(timeout=30)
    server.stop()

    assert len(results) >= 8

    # expected: fast_step over the same disjoint fresh chunks — with
    # pad == 0 the server's first chunk starts at sample 0 (no zero
    # left-context prepend)
    import jax
    import jax.numpy as jnp
    from vap_realtime_tpu.runtime.incremental import (
        init_fast_state, run_frames_fast,
    )
    shift = cfg.frame_shift
    fresh = np.stack([audio[:, i * shift:(i + 1) * shift]
                      for i in range(8)])[:, None]
    run = jax.jit(run_frames_fast, static_argnums=3)
    _, expect = run(params, init_fast_state(cfg, 1),
                    jnp.asarray(fresh), cfg)

    got = np.array([r["p_now"] for r in results[:8]])
    np.testing.assert_allclose(got, np.asarray(expect["p_now"][:8, 0]),
                               atol=1e-4)
    # x1 payload = the whole fresh chunk
    assert len(results[0]["x1"]) == shift
    np.testing.assert_allclose(results[0]["x1"], audio[0, :shift],
                               atol=1e-12)
