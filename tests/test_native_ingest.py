"""Native C++ ingestion engine + native-backed batched server."""

import os
import socket
import subprocess
import threading
import time

import numpy as np
import pytest

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.io import wire
from vap_realtime_tpu.weights.synthetic import synthetic_audio, synthetic_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lib():
    r = subprocess.run(
        ["python", os.path.join(REPO, "tools", "build_native.py")],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"native build failed: {r.stderr[-400:]}")
    from vap_realtime_tpu.io.native_ingest import NativeIngest
    return NativeIngest


def _stream_client(port, audio, n_hops, out_results=None, n_results=0,
                   hop_sleep=0.002):
    with socket.create_connection(("127.0.0.1", port), timeout=15) as s:
        got = 0
        for h in range(n_hops):
            s.sendall(wire.conv_2floatarray_2_bytearray(
                audio[0, h * 160:(h + 1) * 160],
                audio[1, h * 160:(h + 1) * 160]))
            time.sleep(hop_sleep)
            if out_results is not None and got < n_results and \
                    (h + 1) % 5 == 0:
                s.settimeout(15)
                out_results.append(wire.deserialize_result(
                    wire.read_framed(s), "vap"))
                got += 1


def test_frame_assembly_and_generations(lib):
    ing = lib(port=0, capacity=8, frame_samples=1120)
    audio = synthetic_audio(16000).astype(np.float64)
    t = threading.Thread(target=_stream_client,
                         args=(ing.port, audio, 25), daemon=True)
    t.start()

    got = []
    deadline = time.time() + 10
    while len(got) < 5 and time.time() < deadline:
        slots, frames = ing.poll()
        for sl in slots:
            got.append((sl, frames[sl].copy()))
        time.sleep(0.002)
    t.join(timeout=5)
    assert len(got) == 5
    sl0, f0 = got[0]
    assert np.abs(f0[:, :320]).max() == 0.0        # zero left-context
    np.testing.assert_allclose(f0[0, 320:], audio[0, :800], atol=1e-6)
    # frame 2 starts 800 samples in, prefixed by the last 320 overlap
    _, f1 = got[1]
    np.testing.assert_allclose(f1[0], audio[0, 480:1600], atol=1e-6)

    gen_before = ing.generation(sl0)
    assert gen_before >= 1
    # wait for the disconnect to free the slot, then reconnect: the
    # generation must bump (slot reuse detection)
    deadline = time.time() + 3
    while ing.n_active > 0 and time.time() < deadline:
        time.sleep(0.02)
    t2 = threading.Thread(target=_stream_client,
                          args=(ing.port, audio, 6), daemon=True)
    t2.start()
    t2.join(timeout=5)
    deadline = time.time() + 3
    while ing.generation(sl0) == gen_before and time.time() < deadline:
        time.sleep(0.02)
    assert ing.generation(sl0) == gen_before + 1
    ing.close()


def test_int16_wire(lib):
    ing = lib(port=0, capacity=4, frame_samples=1120, wire_int16=True)
    audio = synthetic_audio(16000)
    pcm = np.clip(audio * 32768, -32768, 32767).astype("<i2")
    with socket.create_connection(("127.0.0.1", ing.port), timeout=10) as s:
        for h in range(6):
            pair = np.empty((160, 2), "<i2")
            pair[:, 0] = pcm[0, h * 160:(h + 1) * 160]
            pair[:, 1] = pcm[1, h * 160:(h + 1) * 160]
            s.sendall(pair.tobytes())
            time.sleep(0.002)
        deadline = time.time() + 5
        slots = []
        while not slots and time.time() < deadline:
            slots, frames = ing.poll()
            time.sleep(0.002)
    assert slots
    np.testing.assert_allclose(frames[slots[0]][0, 320:],
                               audio[0, :800], atol=1.0 / 32768)
    ing.close()


def test_int16_emit_raw_frames(lib):
    """emit_i16 mode: poll() returns the RAW int16 samples bit-exactly
    (device-side normalization path; 4x lower host->device bytes)."""
    ing = lib(port=0, capacity=4, frame_samples=800, wire_int16=True,
              overlap=0, emit_i16=True)
    audio = synthetic_audio(16000)
    pcm = np.clip(audio * 32768, -32768, 32767).astype("<i2")
    with socket.create_connection(("127.0.0.1", ing.port), timeout=10) as s:
        for h in range(5):
            pair = np.empty((160, 2), "<i2")
            pair[:, 0] = pcm[0, h * 160:(h + 1) * 160]
            pair[:, 1] = pcm[1, h * 160:(h + 1) * 160]
            s.sendall(pair.tobytes())
            time.sleep(0.002)
        deadline = time.time() + 5
        slots = []
        while not slots and time.time() < deadline:
            slots, frames = ing.poll()
            time.sleep(0.002)
    assert slots
    assert frames.dtype == np.int16
    np.testing.assert_array_equal(frames[slots[0]][0], pcm[0, :800])
    np.testing.assert_array_equal(frames[slots[0]][1], pcm[1, :800])
    ing.close()


def test_native_server_int16_device_path(lib):
    """server_native with int16 wire + int16-capable arena: frames stay
    int16 to arena.step, normalized on device; results parse and the
    echoed x1/x2 match the sent audio."""
    import jax.numpy as jnp

    from vap_realtime_tpu.runtime.arena import StreamArena
    from vap_realtime_tpu.runtime.server_native import NativeVapServer

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    arena = StreamArena(cfg, synthetic_params(20), capacity=2,
                        path="fast", attend_impl="pallas",
                        wire_dtype=np.int16)
    arena.warmup()
    srv = NativeVapServer(arena, port=0, wire_int16=True)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    audio = synthetic_audio(16000)
    pcm = np.clip(audio * 32768, -32768, 32767).astype("<i2")
    results = []
    try:
        with socket.create_connection(("127.0.0.1", srv.port),
                                      timeout=15) as s:
            s.settimeout(15)
            buf = b""
            for h in range(25):
                pair = np.empty((160, 2), "<i2")
                pair[:, 0] = pcm[0, h * 160:(h + 1) * 160]
                pair[:, 1] = pcm[1, h * 160:(h + 1) * 160]
                s.sendall(pair.tobytes())
                time.sleep(0.01)
                if (h + 1) % 5 == 0:
                    deadline = time.time() + 10
                    while len(results) < (h + 1) // 5 and \
                            time.time() < deadline:
                        try:
                            buf += s.recv(65536)
                        except socket.timeout:
                            break
                        while len(buf) >= 4:
                            ln = int.from_bytes(buf[:4], "little")
                            if len(buf) < 4 + ln:
                                break
                            results.append(wire.deserialize_result(
                                buf[4:4 + ln], "vap"))
                            buf = buf[4 + ln:]
    finally:
        srv.stop()
    assert len(results) >= 3
    r0 = results[0]
    np.testing.assert_allclose(np.asarray(r0["x1"]), audio[0, :800],
                               atol=1.5 / 32768)
    p = np.asarray(r0["p_now"])
    assert p.shape[-1] == 2 and np.isfinite(p).all()


def test_zero_overlap_frame_assembly(lib):
    """overlap=0 (fast path): disjoint fresh-sample chunks, no zero
    left-context prepend and no 320-sample re-send."""
    ing = lib(port=0, capacity=4, frame_samples=800, overlap=0)
    audio = synthetic_audio(16000).astype(np.float64)
    t = threading.Thread(target=_stream_client,
                         args=(ing.port, audio, 15), daemon=True)
    t.start()
    got = []
    deadline = time.time() + 10
    while len(got) < 3 and time.time() < deadline:
        slots, frames = ing.poll()
        for sl in slots:
            got.append(frames[sl].copy())
        time.sleep(0.002)
    t.join(timeout=5)
    assert len(got) == 3
    for i, f in enumerate(got):
        np.testing.assert_allclose(f[0], audio[0, i * 800:(i + 1) * 800],
                                   atol=1e-6)
        np.testing.assert_allclose(f[1], audio[1, i * 800:(i + 1) * 800],
                                   atol=1e-6)
    ing.close()


def test_native_server_fast_path(lib):
    """Fast path through the native server: fresh-sample native frame
    assembly + FastState arena; results match run_frames_fast."""
    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.runtime.arena import StreamArena
    from vap_realtime_tpu.runtime.incremental import (
        init_fast_state, run_frames_fast,
    )
    from vap_realtime_tpu.runtime.server_native import NativeVapServer

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(20)
    arena = StreamArena(cfg, params, capacity=4, path="fast")
    arena.warmup()
    server = NativeVapServer(arena, mode="vap", port=0)
    assert server.ingest.frame_samples == cfg.frame_shift
    ticker = threading.Thread(target=server.serve_forever, daemon=True)
    ticker.start()

    audio = synthetic_audio(16000 * 2).astype(np.float64)
    r1: list = []
    t1 = threading.Thread(target=_stream_client,
                          args=(server.port, audio, 40, r1, 4, 0.01),
                          daemon=True)
    t1.start()
    t1.join(timeout=30)
    server.stop()

    assert len(r1) == 4
    shift = cfg.frame_shift
    fresh = np.stack([audio[:, i * shift:(i + 1) * shift]
                      for i in range(4)])[:, None]
    run = jax.jit(run_frames_fast, static_argnums=3)
    _, expect = run(params, init_fast_state(cfg, 1),
                    jnp.asarray(fresh), cfg)
    for i, r in enumerate(r1):
        np.testing.assert_allclose(
            r["x1"], audio[0, i * shift:(i + 1) * shift], atol=1e-9)
        np.testing.assert_allclose(
            r["p_now"], np.asarray(expect["p_now"][i, 0]), atol=1e-4)


def test_native_server_end_to_end(lib):
    """Two clients through the native server: correct, independent
    results; matches the Python batched server's math."""
    from vap_realtime_tpu.runtime.arena import StreamArena
    from vap_realtime_tpu.runtime.server_native import NativeVapServer

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    arena = StreamArena(cfg, synthetic_params(20), capacity=4, path="kv")
    arena.warmup()
    server = NativeVapServer(arena, mode="vap", port=0)
    ticker = threading.Thread(target=server.serve_forever, daemon=True)
    ticker.start()

    audio = synthetic_audio(16000 * 2).astype(np.float64)
    r1: list = []
    r2: list = []
    # realtime pacing (10 ms/hop) so the 50 ms arena tick never drops
    t1 = threading.Thread(target=_stream_client,
                          args=(server.port, audio, 40, r1, 4, 0.01),
                          daemon=True)
    t2 = threading.Thread(target=_stream_client,
                          args=(server.port, audio, 40, r2, 4, 0.01),
                          daemon=True)
    t1.start()
    time.sleep(0.15)
    t2.start()
    t1.join(timeout=30)
    t2.join(timeout=30)
    server.stop()

    assert len(r1) == 4 and len(r2) == 4
    # frame ALIGNMENT is exact: result i's audio payload is frame i
    for i, (a, b) in enumerate(zip(r1, r2)):
        np.testing.assert_allclose(
            a["x1"], audio[0, i * 800:(i + 1) * 800], atol=1e-9)
        np.testing.assert_allclose(
            b["x1"], audio[0, i * 800:(i + 1) * 800], atol=1e-9)
    # values: late joiners sit at a different circular-cache phase,
    # which reorders attention summation -> up to ~1e-4 fp32 noise
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a["p_now"], b["p_now"], atol=5e-4)
    assert len(r1[0]["x1"]) == cfg.frame_shift
    np.testing.assert_allclose(r1[0]["x1"], audio[0, :800], atol=1e-6)


def test_stale_result_skipped_on_same_tick_reuse(monkeypatch):
    """A slot disconnected and REUSED between dispatch and send must not
    receive the previous connection's pending result (cross-stream
    leak).  The server must hand the native sender the DISPATCH-TIME
    generation snapshot, not self._gens (which the same tick's reuse
    handling has already advanced).  Pure-Python stubs; the native-side
    generation gate itself is covered by
    test_send_results_wire_bytes_and_gen_gate."""
    import vap_realtime_tpu.runtime.server_native as sn

    S = 800

    class StubIngest:
        def __init__(self, port, capacity, frame_samples, wire_int16,
                     overlap=0, emit_i16=False):
            self.port = 0
            self.script = []          # (slots, gens) per tick
            self.sent = []            # recorded (slots, gens)
            self.frames = np.zeros((capacity, 2, S), np.float32)

        def poll(self):
            slots, _ = self.script[0]
            return slots, self.frames

        def generations(self):
            _, gens = self.script.pop(0)
            return np.asarray(gens, np.int64)

        def send_results(self, slots, gens, t, frames, pad, probs, cols):
            self.sent.append((np.asarray(slots).copy(),
                              np.asarray(gens).copy()))
            return len(slots)

        def close(self):
            pass

    class StubArena:
        capacity = 2
        chunk_samples = S
        path = "fast"
        wire_dtype = np.float32
        resets: list = []

        def reset_slots(self, slots):
            self.resets.append(list(slots))

        def step_device_batch(self, frames, slots):
            return {k: np.zeros((self.capacity, 4))
                    for k in ("p_now", "p_future", "vad")}

    monkeypatch.setattr(sn, "NativeIngest", StubIngest)
    srv = sn.NativeVapServer(StubArena(), mode="vap", port=0)

    # tick 1: slot 0 (gen 1) dispatched; nothing pending yet
    srv.ingest.script = [([0], [1, 0]),
                         # tick 2: slot 0 reused (gen 2) in the SAME
                         # tick that ships tick 1's result
                         ([0], [2, 0]),
                         # tick 3: ships tick 2's (gen-2) result
                         ([0], [2, 0])]
    srv.tick()
    assert not srv.ingest.sent
    srv.tick()
    # tick 1's result ships with its DISPATCH generation (1) — the
    # native gate then drops it because the slot is at gen 2 now
    assert len(srv.ingest.sent) == 1
    assert srv.ingest.sent[0][1].tolist() == [1]
    srv.tick()
    assert srv.ingest.sent[1][1].tolist() == [2]


def test_send_results_wire_bytes_and_gen_gate(lib):
    """send_results must (a) deliver bytes IDENTICAL to
    serialize_results_batch + frame_result, (b) drop rows whose
    generation doesn't match the slot's current one."""
    ing = lib(port=0, capacity=4, frame_samples=800, overlap=0)
    audio = synthetic_audio(1600)
    with socket.create_connection(("127.0.0.1", ing.port),
                                  timeout=10) as s:
        for h in range(5):
            s.sendall(wire.conv_2floatarray_2_bytearray(
                audio[0, h * 160:(h + 1) * 160],
                audio[1, h * 160:(h + 1) * 160]))
            time.sleep(0.002)
        slots: list = []
        deadline = time.time() + 5
        while not slots and time.time() < deadline:
            slots, frames = ing.poll()
            time.sleep(0.002)
        assert slots
        sl = slots[0]
        gen = ing.generation(sl)

        rs = np.random.RandomState(7)
        probs = rs.rand(1, 6).astype(np.float32)
        t = 123.456
        # wrong generation: gated off natively, nothing arrives
        ing.send_results(np.asarray([sl]), np.asarray([gen + 1]), t,
                         frames, 0, probs, [2, 2, 2])
        time.sleep(0.3)
        s.setblocking(False)
        try:
            got = s.recv(16)
            assert not got, "stale-generation result was delivered"
        except BlockingIOError:
            pass
        s.setblocking(True)

        # right generation: byte-identical to the Python serializer
        ing.send_results(np.asarray([sl]), np.asarray([gen]), t,
                         frames, 0, probs, [2, 2, 2])
        s.settimeout(10)
        payload = wire.read_framed(s)
        fields = {"x1": frames[sl:sl + 1, 0].astype("<f8"),
                  "x2": frames[sl:sl + 1, 1].astype("<f8"),
                  "p_now": probs[:, 0:2], "p_future": probs[:, 2:4],
                  "vad": probs[:, 4:6]}
        expect = wire.serialize_results_batch(t, fields, "vap",
                                              as_matrix=True)
        assert (4 + len(payload)) == expect.shape[1]
        assert payload == expect[0].tobytes()[4:]
    ing.close()
