"""StreamArena lifecycle + batched multiplexed server end-to-end."""

import socket
import threading
import time

import numpy as np
import pytest

from tests.conftest import load_golden_stream
from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.io import wire
from vap_realtime_tpu.runtime.arena import StreamArena
from vap_realtime_tpu.weights.synthetic import synthetic_audio, synthetic_params


@pytest.fixture(scope="module")
def arena_cfg():
    return VapConfig(frame_hz=20, context_len_sec=1.0)


def _frames(audio, cfg):
    from vap_realtime_tpu.runtime.streaming import frame_audio
    return frame_audio(audio, cfg)


def test_arena_isolation_and_reuse(arena_cfg):
    """Two streams give identical results regardless of slot, joining
    time, or previous slot occupants."""
    cfg = arena_cfg
    params = synthetic_params(20)
    arena = StreamArena(cfg, params, capacity=4, path="kv")
    audio = synthetic_audio(16000 * 2)
    frames = _frames(audio, cfg)

    s0 = arena.add_stream()
    # run stream s0 alone for 3 frames
    out_a = [arena.step({s0: frames[i]})[s0]["p_now"] for i in range(3)]

    # second stream joins late with the SAME audio; must reproduce the
    # same trajectory despite the arena's global step being further along
    s1 = arena.add_stream()
    assert s1 != s0
    out_b = []
    for i in range(3):
        res = arena.step({s0: frames[3 + i], s1: frames[i]})
        out_b.append(res[s1]["p_now"])
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # evict s0, admit a new stream into the same slot: history must reset
    arena.remove_stream(s0)
    s2 = arena.add_stream()
    assert s2 == s0  # slot reuse
    out_c = [arena.step({s2: frames[i]})[s2]["p_now"] for i in range(3)]
    for a, c in zip(out_a, out_c):
        np.testing.assert_allclose(a, c, atol=1e-5)


@pytest.mark.parametrize("path", ["kv", "full"])
def test_arena_frozen_slots_interleave_invariance(arena_cfg, path):
    """A stream's trajectory depends ONLY on its own frame sequence —
    ticks where it has no ready frame (slot frozen) must not perturb it.

    Regression for the silence-advance bug: slots without a fresh frame
    used to step on zeros, so results depended on tick/packet timing."""
    cfg = arena_cfg
    params = synthetic_params(20)
    audio = synthetic_audio(16000 * 2)
    frames = _frames(audio, cfg)

    # reference trajectory: stream alone, one frame per tick
    arena_ref = StreamArena(cfg, params, capacity=4, path=path)
    r = arena_ref.add_stream()
    ref = [arena_ref.step({r: frames[i]})[r]["p_now"] for i in range(6)]

    # jittery trajectory: same frames, but the stream skips ticks while
    # another stream keeps the arena stepping
    arena = StreamArena(cfg, params, capacity=4, path=path)
    s0 = arena.add_stream()
    s1 = arena.add_stream()
    got = []
    i = j = 0
    #           s0 ticks   s1 ticks (skips 2 of every 3)
    for tick in range(18):
        chunks = {s0: frames[i % len(frames)]}
        if tick % 3 == 2 and j < 6:
            chunks[s1] = frames[j]
        res = arena.step(chunks)
        i += 1
        if s1 in res:
            got.append(res[s1]["p_now"])
            j += 1
    assert len(got) == 6
    for a, b in zip(ref, got):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_arena_interleave_invariance_past_ring_wrap(arena_cfg):
    """With the default per-stream slot policy, interleave invariance
    must hold even after the KV ring wraps (T=20 here; the jittery run
    spans 42 global ticks while the stream sees only 14 frames).

    Regression for the global-slot overwrite bug: a frozen tick used to
    invalidate one live cache row of every inactive stream once the ring
    had wrapped, silently shortening jittery streams' context."""
    cfg = arena_cfg  # 20 Hz x 1.0 s -> T=20 frames
    T = cfg.context_frames
    params = synthetic_params(20)
    audio = synthetic_audio(16000 * 2)
    frames = _frames(audio, cfg)
    # n > T so the observed stream's OWN ring wraps too (self-wrap
    # eviction: count % T collisions against the stamp masking), not just
    # the busy neighbour's
    n = 25
    assert n > T

    arena_ref = StreamArena(cfg, params, capacity=2, path="kv")
    r = arena_ref.add_stream()
    # solo reference: runs 14 ticks, so ITS ring never wraps
    ref = [arena_ref.step({r: frames[i]})[r]["p_now"] for i in range(n)]

    arena = StreamArena(cfg, params, capacity=2, path="kv")
    s0 = arena.add_stream()
    s1 = arena.add_stream()
    got = []
    i = j = 0
    for tick in range(3 * n):  # 42 > 2*T global ticks
        chunks = {s0: frames[i % len(frames)]}
        if tick % 3 == 2 and j < n:
            chunks[s1] = frames[j]
        res = arena.step(chunks)
        i += 1
        if s1 in res:
            got.append(res[s1]["p_now"])
            j += 1
    assert len(got) == n and 3 * n > 2 * T
    for a, b in zip(ref, got):
        np.testing.assert_allclose(a, b, atol=1e-6)


def _fresh_chunks(audio, cfg):
    """Disjoint fresh-sample chunks for the fast path (no 320 overlap)."""
    shift = cfg.frame_shift
    n = audio.shape[-1] // shift
    return [audio[..., i * shift:(i + 1) * shift] for i in range(n)]


def test_arena_fast_path_interleave_invariance(arena_cfg):
    """Fast path in the arena: a stream's trajectory (conv tails + LSTM +
    KV ring) depends only on its own fresh-sample chunk sequence — frozen
    ticks must not perturb it, including past its OWN ring wrap
    (VERDICT r2 next-#1 'arena interleave test (frozen ticks +
    conv-tail state)')."""
    cfg = arena_cfg  # T=20
    T = cfg.context_frames
    params = synthetic_params(20)
    audio = synthetic_audio(16000 * 2)
    chunks = _fresh_chunks(audio, cfg)
    n = 25
    assert n > T and n <= len(chunks)

    arena_ref = StreamArena(cfg, params, capacity=2, path="fast")
    r = arena_ref.add_stream()
    ref = [arena_ref.step({r: chunks[i]})[r]["p_now"] for i in range(n)]

    arena = StreamArena(cfg, params, capacity=2, path="fast")
    s0 = arena.add_stream()
    s1 = arena.add_stream()
    got = []
    i = j = 0
    for tick in range(3 * n):
        feed = {s0: chunks[i % len(chunks)]}
        if tick % 3 == 2 and j < n:
            feed[s1] = chunks[j]
        res = arena.step(feed)
        i += 1
        if s1 in res:
            got.append(res[s1]["p_now"])
            j += 1
    assert len(got) == n
    for a, b in zip(ref, got):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_arena_fast_slot_reuse_resets_conv_tails(arena_cfg):
    """Evicting a fast-path stream and admitting a new one into the same
    slot must reset the streaming-conv input tails too — stale tails
    would bleed the previous occupant's audio into the first frames."""
    cfg = arena_cfg
    params = synthetic_params(20)
    audio = synthetic_audio(16000 * 2)
    chunks = _fresh_chunks(audio, cfg)

    arena = StreamArena(cfg, params, capacity=2, path="fast")
    s0 = arena.add_stream()
    out_a = [arena.step({s0: chunks[i]})[s0]["p_now"] for i in range(4)]
    arena.remove_stream(s0)
    s1 = arena.add_stream()
    assert s1 == s0  # slot reuse
    out_b = [arena.step({s1: chunks[i]})[s1]["p_now"] for i in range(4)]
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_arena_fast_pallas_matches_einsum(arena_cfg):
    """attend_impl='pallas' is servable through the arena and agrees with
    the einsum backend (kernel runs in interpreter mode on CPU)."""
    cfg = arena_cfg
    params = synthetic_params(20)
    audio = synthetic_audio(16000 * 1)
    chunks = _fresh_chunks(audio, cfg)

    a_ein = StreamArena(cfg, params, capacity=2, path="fast",
                        attend_impl="einsum")
    a_pal = StreamArena(cfg, params, capacity=2, path="fast",
                        attend_impl="pallas")
    se, sp = a_ein.add_stream(), a_pal.add_stream()
    for i in range(3):
        oe = a_ein.step({se: chunks[i]})[se]["p_now"]
        op = a_pal.step({sp: chunks[i]})[sp]["p_now"]
        np.testing.assert_allclose(op, oe, atol=2e-5)


def test_arena_global_slots_degrade_but_stay_valid(arena_cfg):
    """The "global" slot policy's documented wrapped-regime behavior: a
    jittery stream's outputs stay finite and well-formed (rows go
    invalid, never wrong), though they may deviate from the solo run."""
    cfg = arena_cfg
    params = synthetic_params(20)
    audio = synthetic_audio(16000 * 2)
    frames = _frames(audio, cfg)

    arena = StreamArena(cfg, params, capacity=2, path="kv", slots="global")
    s0 = arena.add_stream()
    s1 = arena.add_stream()
    got = []
    i = j = 0
    for tick in range(60):  # >> T=20: ring wraps repeatedly
        chunks = {s0: frames[i % len(frames)]}
        if tick % 3 == 2:
            chunks[s1] = frames[j % len(frames)]
        res = arena.step(chunks)
        i += 1
        if s1 in res:
            got.append(res[s1]["p_now"])
            j += 1
    p = np.stack(got)
    assert np.isfinite(p).all()
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


def test_arena_capacity(arena_cfg):
    arena = StreamArena(arena_cfg, synthetic_params(20), capacity=2)
    a = arena.add_stream()
    b = arena.add_stream()
    assert arena.add_stream() is None
    arena.remove_stream(a)
    assert arena.add_stream() is not None
    assert arena.n_active == 2


@pytest.mark.parametrize("path", ["kv", "fast", "fast_hybrid"])
def test_batched_server_two_streams(arena_cfg, path):
    """Two concurrent TCP streams through the multiplexed server receive
    independent, correct results (kv: overlapped frames; fast /
    fast_hybrid: fresh-sample chunk assembly — fast_hybrid also pins
    the server's zero-overlap padding for the resync path)."""
    from vap_realtime_tpu.runtime.server_batched import BatchedVapServer

    golden = load_golden_stream("stream_vap_20hz.npz")
    cfg = arena_cfg
    arena = StreamArena(cfg, synthetic_params(20), capacity=4, path=path)
    arena.warmup()
    server = BatchedVapServer(arena, mode="vap", port=0)
    server.start_background()
    port = server.bound_port

    audio = golden["audio"].astype(np.float64)

    def run_client(results, n_results=4):
        with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
            got = 0
            hop = 0
            while got < n_results:
                b = wire.conv_2floatarray_2_bytearray(
                    audio[0, hop * 160:(hop + 1) * 160],
                    audio[1, hop * 160:(hop + 1) * 160])
                s.sendall(b)
                hop += 1
                if hop % 5 == 0:  # a frame should be ready
                    results.append(wire.deserialize_result(
                        wire.read_framed(s), "vap"))
                    got += 1

    r1: list = []
    r2: list = []
    t1 = threading.Thread(target=run_client, args=(r1,), daemon=True)
    t2 = threading.Thread(target=run_client, args=(r2,), daemon=True)
    t1.start()
    time.sleep(0.2)
    t2.start()
    t1.join(timeout=30)
    t2.join(timeout=30)
    server.stop()

    assert len(r1) == 4 and len(r2) == 4
    # same audio -> same probabilities, despite different join times/slots
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a["p_now"], b["p_now"], atol=1e-5)
    assert all(0.0 < r["p_now"][0] < 1.0 for r in r1)


def test_arena_host_merge_matches_auto_cond():
    """The arena's HOST-side staged-merge cadence (cond-free merge jit,
    r5 capacity fix) must produce the same frame-by-frame outputs as
    the in-graph lax.cond path (run_frames_fast, merge="auto") — the
    staged contract makes results invariant to merge-tick placement, so
    the arena's warmup offset must not matter."""
    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.runtime.incremental import (
        init_fast_state, run_frames_fast,
    )

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(20)
    B, F = 3, 20                       # > 2 * STAGE_S frames
    rs = np.random.RandomState(3)
    frames = rs.randn(F, B, 2, cfg.frame_shift).astype(np.float32) * 0.1

    arena = StreamArena(cfg, params, capacity=B, path="fast",
                        slots="staged")
    assert arena._step_merge is not None
    arena.warmup()
    got = []
    for f in range(F):
        out = arena.step({b: frames[f, b] for b in range(B)})
        got.append(np.stack([out[b]["p_now"] for b in range(B)]))

    run = jax.jit(run_frames_fast, static_argnums=(3, 4))
    _, ref = run(params, init_fast_state(cfg, B, staged=True),
                 jnp.asarray(frames), cfg, "staged")
    np.testing.assert_allclose(np.stack(got),
                               np.asarray(ref["p_now"]), atol=2e-5)


def test_arena_host_resync_matches_auto_cond():
    """The arena's host-side hybrid resync dispatch (cond-free resync
    jit) must match the in-graph lax.cond scan.  resync_every=1 makes
    every tick a resync, so the warmup phase offset cannot shift the
    cadence and the comparison is exact."""
    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.runtime.incremental import (
        init_fast_hybrid_state, run_frames_fast_hybrid,
    )

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(20)
    B, F = 2, 6
    rs = np.random.RandomState(5)
    frames = rs.randn(F, B, 2, cfg.frame_shift).astype(np.float32) * 0.1

    arena = StreamArena(cfg, params, capacity=B, path="fast_hybrid",
                        slots="staged", resync_every=1)
    assert arena._step_resync is not None
    arena.warmup()
    got = []
    for f in range(F):
        out = arena.step({b: frames[f, b] for b in range(B)})
        got.append(np.stack([out[b]["p_now"] for b in range(B)]))

    run = jax.jit(run_frames_fast_hybrid, static_argnums=(3, 4))
    _, ref = run(params, init_fast_hybrid_state(cfg, B, staged=True),
                 jnp.asarray(frames), cfg, 1)
    np.testing.assert_allclose(np.stack(got),
                               np.asarray(ref["p_now"]), atol=2e-5)
