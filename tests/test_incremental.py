"""Incremental KV-cache step vs parity-exact full recompute.

Contract: exact equivalence while the context window is still growing
(causal attention + distance-only AliBi make appends non-retroactive);
bounded deviation after the window slides (cached upper-layer K/V keep
their as-computed values while the reference recomputes without dropped
frames — see runtime/incremental.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.runtime.incremental import (
    init_hybrid_state, init_kv_state, run_frames_hybrid, run_frames_kv,
)
from vap_realtime_tpu.runtime.streaming import (
    frame_audio, init_stream_state, run_frames,
)
from vap_realtime_tpu.weights.synthetic import synthetic_audio, synthetic_params


def _outputs(cfg, seconds, batch=1):
    params = synthetic_params(frame_hz=cfg.frame_hz)
    audio = synthetic_audio(16000 * seconds)
    frames = jnp.asarray(frame_audio(audio, cfg)[:, None])
    if batch > 1:
        frames = jnp.tile(frames, (1, batch, 1, 1))

    run_full = jax.jit(run_frames, static_argnums=3)
    _, full = run_full(params, init_stream_state(cfg, batch), frames, cfg)
    run_kv = jax.jit(run_frames_kv, static_argnums=3)
    _, kv = run_kv(params, init_kv_state(cfg, batch), frames, cfg)
    return full, kv, frames.shape[0]


def test_exact_while_growing():
    # 2.5 s context at 20 Hz = 50 frames; run 40 frames -> window never slides
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    full, kv, F = _outputs(cfg, seconds=2)
    assert F < cfg.context_frames
    for key in ("p_now", "p_future", "vad"):
        np.testing.assert_allclose(np.asarray(kv[key]),
                                   np.asarray(full[key]), atol=2e-5,
                                   err_msg=key)


def test_bounded_after_slide():
    # 1 s context at 20 Hz = 20 frames; run 4 s -> window slides for 59 frames
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    full, kv, F = _outputs(cfg, seconds=4)
    assert F > 2 * cfg.context_frames
    # exact until the first slide
    g = cfg.context_frames
    np.testing.assert_allclose(np.asarray(kv["p_now"][:g]),
                               np.asarray(full["p_now"][:g]), atol=2e-5)
    # bounded deviation afterwards (regression bound, not a parity claim)
    dev = np.abs(np.asarray(kv["p_now"]) - np.asarray(full["p_now"])).max()
    assert dev < 0.05, f"sliding-window deviation too large: {dev}"


def _run_paths(cfg, params, audio, resync_every):
    frames = jnp.asarray(frame_audio(audio, cfg)[:, None])
    run_full = jax.jit(run_frames, static_argnums=3)
    _, full = run_full(params, init_stream_state(cfg, 1), frames, cfg)
    run_kv = jax.jit(run_frames_kv, static_argnums=3)
    _, kv = run_kv(params, init_kv_state(cfg, 1), frames, cfg)
    run_h = jax.jit(run_frames_hybrid, static_argnums=(3, 4))
    _, hyb = run_h(params, init_hybrid_state(cfg, 1), frames, cfg,
                   resync_every)
    return full, kv, hyb, frames.shape[0]


def test_hybrid_resync_exact_and_tighter():
    """Hybrid path: resync frames are parity-exact vs full recompute and
    overall deviation is no worse than the pure KV path."""
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)  # T=20, slides a lot
    params = synthetic_params(frame_hz=20)
    audio = synthetic_audio(16000 * 4)
    N = 10
    full, kv, hyb, F = _run_paths(cfg, params, audio, resync_every=N)
    assert F > 3 * cfg.context_frames

    p_full = np.asarray(full["p_now"])
    p_kv = np.asarray(kv["p_now"])
    p_h = np.asarray(hyb["p_now"])
    # resync ticks (global step g has (g+1) % N == 0 -> frame index g)
    resync_frames = [g for g in range(F) if (g + 1) % N == 0]
    np.testing.assert_allclose(p_h[resync_frames], p_full[resync_frames],
                               atol=2e-5)
    dev_kv = np.abs(p_kv - p_full).max()
    dev_h = np.abs(p_h - p_full).max()
    assert dev_h <= dev_kv + 1e-6
    assert dev_h < 0.05


@pytest.fixture(scope="module")
def trained_params(tmp_path_factory):
    """A few fit() epochs on the synthetic manifest — 'trained-ish'
    weights with realistic (non-init) statistics for deviation bounds."""
    from vap_realtime_tpu.train.data import DataConfig, synthetic_manifest
    from vap_realtime_tpu.train.trainer import OptConfig, fit

    tmp = str(tmp_path_factory.mktemp("kvdev"))
    path = synthetic_manifest(tmp, n_rows=4, duration=3.0)
    vap_cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    data_cfg = DataConfig(train_path=path, batch_size=2,
                          audio_duration=3.0, frame_hz=20)
    # overfit hard so p_now develops real dynamics (gentle short runs
    # leave the codebook softmax at ~uniform and the measurement would
    # be vacuous); single device — dp sharding is tested elsewhere
    hist = fit(vap_cfg, data_cfg,
               OptConfig(max_epochs=12, learning_rate=6e-3, seed=1),
               ckpt_dir=tmp + "/run", n_devices=1, log_fn=lambda m: None)
    return hist["params"]


def test_kv_deviation_quantified_on_trained_weights(trained_params):
    """Post-slide deviation bound measured on TRAINED weights (VERDICT
    round-1 weak #3/#6): the 0.05 regression bound must hold beyond
    synthetic-init statistics, and the hybrid path must be tighter."""
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    audio = synthetic_audio(16000 * 4, seed=9)
    full, kv, hyb, F = _run_paths(cfg, trained_params, audio,
                                  resync_every=cfg.context_frames // 2)
    g = cfg.context_frames
    p_full = np.asarray(full["p_now"])
    p_kv = np.asarray(kv["p_now"])
    p_h = np.asarray(hyb["p_now"])
    # the measurement must not be vacuous: outputs have real dynamics
    assert p_full.std() > 0.01, "trained outputs degenerate (~const)"
    # exact until the first slide
    np.testing.assert_allclose(p_kv[:g], p_full[:g], atol=2e-5)
    dev_kv = float(np.abs(p_kv - p_full).max())
    dev_h = float(np.abs(p_h - p_full).max())
    mean_kv = float(np.abs(p_kv - p_full).mean())
    print(f"\n[kv-deviation trained] p_now std={p_full.std():.4f} "
          f"max={dev_kv:.2e} mean={mean_kv:.2e} hybrid(max)={dev_h:.2e}")
    # measured r2: max ~4e-7 on overfit weights (vs 0.05 bound at random
    # init) — trained attention is far less slide-sensitive
    assert dev_kv < 0.05, f"trained-weights deviation too large: {dev_kv}"
    assert dev_h <= dev_kv + 1e-6


@pytest.mark.parametrize("frame_hz", [10, 20, 50])
def test_streaming_conv_equals_seamless_oracle(frame_hz):
    """Fast-path encoder: frame-by-frame streaming conv (carried input
    tails) == ONE seamless valid conv over the whole stream, exactly."""
    from vap_realtime_tpu.models.encoder import (
        encode_chunk_streaming, encode_sequence_streaming_oracle,
        init_conv_stream_state,
    )

    cfg = VapConfig(frame_hz=frame_hz, context_len_sec=1.0)
    params = synthetic_params(frame_hz=frame_hz)["encoder"]
    audio = synthetic_audio(16000 * 2)[0:1]          # (1, L)
    wav = jnp.asarray(audio)

    oracle = encode_sequence_streaming_oracle(params, wav,
                                              cfg.downsample_kernel)

    conv_st = init_conv_stream_state(1)
    h = jnp.zeros((1, 256))
    c = jnp.zeros((1, 256))
    shift = cfg.frame_shift
    es = []
    for i in range(wav.shape[1] // shift):
        e, conv_st, h, c = encode_chunk_streaming(
            params, wav[:, i * shift:(i + 1) * shift], conv_st, h, c,
            cfg.downsample_kernel)
        es.append(e)
    got = jnp.stack(es, axis=1)                       # (1, F, C)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(oracle[:, :got.shape[1]]),
                               atol=2e-5)


def test_blocked_streaming_conv_matches_standard():
    """Channels-last blocked-matmul streaming conv == the NCW XLA-conv
    streaming stack, frame by frame, sharing the same carried state
    layout (same f32-accumulated sums, MXU-shaped)."""
    from vap_realtime_tpu.models.encoder import (
        cpc_conv_stack_streaming, cpc_conv_stack_streaming_blocked,
        init_conv_stream_state,
    )

    params = synthetic_params(frame_hz=20)["encoder"]
    rs = np.random.RandomState(5)
    st_a = st_b = init_conv_stream_state(2)
    for _f in range(3):
        new = jnp.asarray(rs.randn(2, 800).astype(np.float32) * 0.1)
        za, st_a = cpc_conv_stack_streaming(params, new, st_a)
        zb, st_b = cpc_conv_stack_streaming_blocked(params, new, st_b)
        np.testing.assert_allclose(np.asarray(zb), np.asarray(za),
                                   atol=2e-5)
        for k in st_a:
            np.testing.assert_allclose(np.asarray(st_b[k]),
                                       np.asarray(st_a[k]), atol=1e-5)


def test_fast_path_tracks_reference_numerics():
    """fast_step (streaming conv + KV) stays close to the parity path on
    the same audio: different-but-equivalent encoder numerics must not
    change the predictions materially (regression bound)."""
    from vap_realtime_tpu.runtime.incremental import (
        init_fast_state, run_frames_fast,
    )

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    audio = synthetic_audio(16000 * 3)

    frames = jnp.asarray(frame_audio(audio, cfg)[:, None])
    run_full = jax.jit(run_frames, static_argnums=3)
    _, full = run_full(params, init_stream_state(cfg, 1), frames, cfg)

    shift = cfg.frame_shift
    F = frames.shape[0]
    # fast path consumes fresh samples only; frame k of the reference
    # windowing ends at 800k+1120 = fast frame k+1's boundary + 320
    fresh = np.stack([audio[:, i * shift:(i + 1) * shift]
                      for i in range(F + 1)])[:, None]
    run_fast = jax.jit(run_frames_fast, static_argnums=3)
    _, fast = run_fast(params, init_fast_state(cfg, 1),
                       jnp.asarray(fresh), cfg)

    p_full = np.asarray(full["p_now"])[:, 0]
    p_fast = np.asarray(fast["p_now"])[1:, 0]        # alignment: +1 frame
    d = np.abs(p_full - p_fast)
    assert np.isfinite(p_fast).all()
    # measured r3 (random init): mean 9.8e-4, max 1.9e-3 — the bound is
    # 10x the measurement, not a parity claim (trained-weights bound:
    # test_fast_deviation_quantified_on_trained_weights)
    assert d.mean() < 0.005 and d.max() < 0.02, (d.mean(), d.max())


def _run_fast_paths(cfg, params, audio, resync_every):
    """full recompute + fast + fast_hybrid(oracle: resync_every=1, and
    the given cadence) over the same audio; returns aligned p_now."""
    from vap_realtime_tpu.runtime.incremental import (
        init_fast_hybrid_state, init_fast_state, run_frames_fast,
        run_frames_fast_hybrid,
    )

    frames = jnp.asarray(frame_audio(audio, cfg)[:, None])
    run_full = jax.jit(run_frames, static_argnums=3)
    _, full = run_full(params, init_stream_state(cfg, 1), frames, cfg)

    shift = cfg.frame_shift
    F = frames.shape[0]
    fresh = jnp.asarray(np.stack(
        [audio[:, i * shift:(i + 1) * shift] for i in range(F + 1)])[:, None])
    run_fast = jax.jit(run_frames_fast, static_argnums=3)
    _, fast = run_fast(params, init_fast_state(cfg, 1), fresh, cfg)
    run_fh = jax.jit(run_frames_fast_hybrid, static_argnums=(3, 4))
    _, oracle = run_fh(params, init_fast_hybrid_state(cfg, 1), fresh, cfg, 1)
    _, fh = run_fh(params, init_fast_hybrid_state(cfg, 1), fresh, cfg,
                   resync_every)
    return (np.asarray(full["p_now"])[:, 0],
            np.asarray(fast["p_now"])[:, 0],
            np.asarray(oracle["p_now"])[:, 0],
            np.asarray(fh["p_now"])[:, 0], F)


def test_fast_hybrid_resync_exact_and_tighter():
    """fast+resync: resync frames are EXACT w.r.t. the full-trunk-over-
    fast-embeddings oracle (resync_every=1), and overall drift vs that
    oracle is no worse than the pure fast path's (VERDICT r2 item 4)."""
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    audio = synthetic_audio(16000 * 4)
    N = 10
    _, p_fast, p_or, p_fh, F = _run_fast_paths(cfg, params, audio, N)
    assert F > 3 * cfg.context_frames

    resync_frames = [g for g in range(F + 1) if (g + 1) % N == 0]
    np.testing.assert_allclose(p_fh[resync_frames], p_or[resync_frames],
                               atol=2e-5)
    dev_fast = np.abs(p_fast - p_or).max()
    dev_fh = np.abs(p_fh - p_or).max()
    assert dev_fh <= dev_fast + 1e-6
    assert dev_fh < 0.05


def test_fast_deviation_quantified_on_trained_weights(trained_params):
    """Fast-vs-full deviation measured on TRAINED weights (VERDICT r2
    item 4 — the kv path got this in r2; the serving-default fast path
    needs the same evidence)."""
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    audio = synthetic_audio(16000 * 4, seed=9)
    p_full, p_fast, p_or, p_fh, F = _run_fast_paths(
        cfg, trained_params, audio, cfg.context_frames // 2)
    assert p_full.std() > 0.01, "trained outputs degenerate (~const)"
    # encoder-numerics delta dominates; KV drift vs the fast oracle is
    # far smaller (see ARCHITECTURE.md "Serving paths" for measured rows)
    d_full = np.abs(p_full - p_fast[1:])             # alignment: +1 frame
    d_or = np.abs(p_fast - p_or)
    print(f"\n[fast-deviation trained] p_now std={p_full.std():.4f} "
          f"vs-full max={d_full.max():.2e} mean={d_full.mean():.2e} "
          f"kv-drift-vs-oracle max={d_or.max():.2e} "
          f"hybrid max={np.abs(p_fh - p_or).max():.2e}")
    assert d_full.max() < 0.05, f"fast deviation too large: {d_full.max()}"
    assert d_or.max() < 0.01, f"fast KV drift too large: {d_or.max()}"


def test_batch_consistency():
    # batched streams produce identical results to batch=1
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    full1, kv1, _ = _outputs(cfg, seconds=1, batch=1)
    _, kv3, _ = _outputs(cfg, seconds=1, batch=3)
    np.testing.assert_allclose(np.asarray(kv3["p_now"][:, 2]),
                               np.asarray(kv1["p_now"][:, 0]), atol=1e-6)


def test_int8_kv_cache_tracks_bf16():
    """int8-quantized KV cache (half the HBM read traffic, 2x stream
    capacity — the bandwidth-bound trunk's lever, PERF.md r3): output
    deviation vs the unquantized cache stays ~1e-4 on probabilities,
    on every attend impl, including past the window slide."""
    import functools

    from vap_realtime_tpu.runtime.incremental import kv_step

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    audio = synthetic_audio(16000 * 2)
    frames = frame_audio(audio, cfg)[:, None]
    assert frames.shape[0] > cfg.context_frames  # slides

    outs = {}
    for quant in (False, True):
        for impl in ("einsum", "pallas"):
            step = jax.jit(functools.partial(kv_step, cfg=cfg,
                                             attend_impl=impl))
            st = init_kv_state(cfg, 1, quant=quant)
            ps = []
            for f in range(frames.shape[0]):
                st, out = step(params, st, jnp.asarray(frames[f]))
                ps.append(np.asarray(out["p_now"]))
            outs[(quant, impl)] = np.stack(ps)

    d_quant = np.abs(outs[(True, "einsum")] - outs[(False, "einsum")]).max()
    d_impl = np.abs(outs[(True, "pallas")] - outs[(True, "einsum")]).max()
    print(f"\n[int8-kv] quant-vs-bf16 max={d_quant:.2e} "
          f"pallas-vs-einsum(quant) max={d_impl:.2e}")
    assert d_quant < 5e-3, d_quant     # measured ~2e-5; bound is 100x
    assert d_impl < 1e-4, d_impl


def test_int8_global_cache_tracks_bf16():
    """quant="global" — int8 cache with per-stream FROZEN scales that
    fold OUTSIDE the attend kernels (into q / k_cur / v_cur / the
    output), so the kernels run the scale-free bf16 math on code values
    (PERF.md r5).  Deviation vs the bf16 cache stays small on every
    attend impl (coarser than per-row quant: one scale covers a whole
    stream's rows), staged == stream, and the scales actually FREEZE
    (set on the first frame, constant afterwards)."""
    import functools

    from vap_realtime_tpu.runtime.incremental import kv_step

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    audio = synthetic_audio(16000 * 2)
    frames = frame_audio(audio, cfg)[:, None]
    assert frames.shape[0] > cfg.context_frames  # slides

    outs = {}
    for quant, impl, slots in ((False, "einsum", "stream"),
                               ("global", "einsum", "stream"),
                               ("global", "pallas", "stream"),
                               ("global", "grouped", "stream"),
                               ("global", "pallas", "staged")):
        step = jax.jit(functools.partial(kv_step, cfg=cfg, slots=slots,
                                         attend_impl=impl))
        st = init_kv_state(cfg, 1, quant=quant,
                           staged=slots == "staged")
        ps = []
        scales = []
        for f in range(frames.shape[0]):
            st, out = step(params, st, jnp.asarray(frames[f]))
            ps.append(np.asarray(out["p_now"]))
            if quant == "global":
                scales.append(np.asarray(st.scale))
        outs[(quant, impl, slots)] = np.stack(ps)
        if quant == "global":
            assert (scales[0] > 0).all()          # set on first frame
            np.testing.assert_array_equal(scales[0], scales[-1])  # frozen

    ref = outs[(False, "einsum", "stream")]
    d_quant = np.abs(outs[("global", "einsum", "stream")] - ref).max()
    d_pl = np.abs(outs[("global", "pallas", "stream")]
                  - outs[("global", "einsum", "stream")]).max()
    d_gr = np.abs(outs[("global", "grouped", "stream")]
                  - outs[("global", "einsum", "stream")]).max()
    d_st = np.abs(outs[("global", "pallas", "staged")]
                  - outs[("global", "pallas", "stream")]).max()
    print(f"\n[int8-global] vs-bf16 max={d_quant:.2e} "
          f"pallas-vs-einsum={d_pl:.2e} grouped-vs-einsum={d_gr:.2e} "
          f"staged-vs-stream={d_st:.2e}")
    assert d_quant < 2e-2, d_quant    # frozen scales: coarser than row
    assert d_pl < 5e-4, d_pl
    assert d_gr < 5e-4, d_gr
    assert d_st < 5e-4, d_st


def test_int8_global_scale_gating():
    """Global-quant scales initialize ONLY on a stream's first ACTIVE
    frame (a frozen slot must not calibrate from garbage rows), and a
    slot reset re-zeros them so the next stream recalibrates."""
    import functools

    from vap_realtime_tpu.runtime import arena as arena_mod
    from vap_realtime_tpu.runtime.incremental import kv_step

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    step = jax.jit(functools.partial(kv_step, cfg=cfg, slots="stream"))
    B = 2
    st = init_kv_state(cfg, B, quant="global")
    rs = np.random.RandomState(0)
    chunk = jnp.asarray(rs.randn(B, 2, cfg.frame_samples)
                        .astype(np.float32) * 0.1)
    st, _ = step(params, st, chunk,
                 active=jnp.asarray([True, False]))
    sc = np.asarray(st.scale)
    assert (sc[0] > 0).all() and (sc[1] == 0).all()
    st, _ = step(params, st, chunk,
                 active=jnp.asarray([True, True]))
    sc2 = np.asarray(st.scale)
    assert (sc2 > 0).all()
    np.testing.assert_array_equal(sc2[0], sc[0])       # stream 0 frozen

    # slot reset re-zeros ONLY the reset stream's scales
    st3 = arena_mod._reset_slot(st, jnp.asarray([True, False]))
    sc3 = np.asarray(st3.scale)
    assert (sc3[0] == 0).all()
    np.testing.assert_array_equal(sc3[1], sc2[1])


@pytest.mark.parametrize("impl", ["einsum", "pallas"])
def test_staged_slots_match_stream(impl):
    """slots='staged' == slots='stream' frame by frame: same outputs
    under jittery per-stream activity (including past the ring wrap and
    across several merges), and bit-identical ring/stamps right after
    each merge."""
    import functools

    from vap_realtime_tpu.runtime.incremental import (
        STAGE_S, kv_step,
    )

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)   # T=20
    params = synthetic_params(frame_hz=20)
    B = 3
    rs = np.random.RandomState(7)
    F = 3 * cfg.context_frames + 5                      # wraps + merges
    assert F > 2 * STAGE_S

    step_s = jax.jit(functools.partial(kv_step, cfg=cfg, slots="stream",
                                       attend_impl=impl))
    step_g = jax.jit(functools.partial(kv_step, cfg=cfg, slots="staged",
                                       attend_impl=impl))
    st_s = init_kv_state(cfg, B)
    st_g = init_kv_state(cfg, B, staged=True)
    for f in range(F):
        chunk = jnp.asarray(rs.randn(B, 2, cfg.frame_samples)
                            .astype(np.float32) * 0.1)
        # jittery activity; stream 0 always on so outputs are comparable
        act = jnp.asarray([True, f % 2 == 0, f % 3 != 0])
        st_s, out_s = step_s(params, st_s, chunk, active=act)
        st_g, out_g = step_g(params, st_g, chunk, active=act)
        np.testing.assert_allclose(
            np.asarray(out_g["p_now"][0]), np.asarray(out_s["p_now"][0]),
            atol=2e-5, err_msg=f"frame {f}")
        if (f + 1) % STAGE_S == 0:     # just merged: ring states equal
            np.testing.assert_allclose(np.asarray(st_g.cache),
                                       np.asarray(st_s.cache), atol=1e-6,
                                       err_msg=f"cache after merge {f}")
            np.testing.assert_array_equal(np.asarray(st_g.stamp),
                                          np.asarray(st_s.stamp))
            assert (np.asarray(st_g.stage_stamp) == -1).all()


def test_staged_slots_quantized():
    """staged + int8 cache: tracks the unquantized staged run and the
    int8 'stream' run (same quant points: staged quantizes once at
    staging, stream at the row write — identical values)."""
    import functools

    from vap_realtime_tpu.runtime.incremental import kv_step

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    audio = synthetic_audio(16000 * 2)
    frames = frame_audio(audio, cfg)[:, None]

    outs = {}
    for slots, quant in (("stream", True), ("staged", True),
                         ("staged", False)):
        step = jax.jit(functools.partial(kv_step, cfg=cfg, slots=slots))
        st = init_kv_state(cfg, 1, quant=quant, staged=slots == "staged")
        ps = []
        for f in range(frames.shape[0]):
            st, out = step(params, st, jnp.asarray(frames[f]))
            ps.append(np.asarray(out["p_now"]))
        outs[(slots, quant)] = np.stack(ps)
    d_q = np.abs(outs[("staged", True)] - outs[("staged", False)]).max()
    d_s = np.abs(outs[("staged", True)] - outs[("stream", True)]).max()
    print(f"\n[staged-q8] vs-bf16 {d_q:.2e} vs-stream-q8 {d_s:.2e}")
    assert d_q < 5e-3, d_q
    assert d_s < 2e-5, d_s


@pytest.mark.parametrize("impl", ["einsum", "pallas"])
def test_staged_hybrid_matches_unstaged(impl):
    """Hybrid with a staged KV state (the serving default) == hybrid
    with the per-frame 'stream' scatter, frame by frame — including
    resync frames, where the stage must be invalidated (a staged row
    and its ring rewrite share a stamp and would attend twice)."""
    import functools

    from vap_realtime_tpu.runtime.incremental import hybrid_step

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    audio = synthetic_audio(16000 * 2)
    frames = frame_audio(audio, cfg)[:, None]
    N = 6  # resync cadence; not a multiple of STAGE_S so phases differ

    step = jax.jit(functools.partial(hybrid_step, cfg=cfg,
                                     resync_every=N, attend_impl=impl))
    st_u = init_hybrid_state(cfg, 1)
    st_s = init_hybrid_state(cfg, 1, staged=True)
    for f in range(frames.shape[0]):
        st_u, out_u = step(params, st_u, jnp.asarray(frames[f]))
        st_s, out_s = step(params, st_s, jnp.asarray(frames[f]))
        np.testing.assert_allclose(
            np.asarray(out_s["p_now"]), np.asarray(out_u["p_now"]),
            atol=2e-5, err_msg=f"frame {f}")
        if (f + 1) % N == 0:  # post-resync: stage fully invalidated
            assert (np.asarray(st_s.kv.stage_stamp) == -1).all()


@pytest.mark.parametrize("quant", [True, "global"])
def test_int8_hybrid_cache_tracks_bf16(quant):
    """Hybrid path + quantized cache: the resync branch must keep the
    LSTM/ring state in the compute dtype, NOT the int8 cache dtype
    (ADVICE r3 high: dtype=kv.cache.dtype truncated tanh-range h/c to 0
    on every resync frame).  Deviation vs the unquantized hybrid stays
    small across several resyncs, and resync frames stay parity-close.
    quant="global" also exercises the resync branch's whole-ring scale
    calibration + frozen-scale requantization."""
    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    audio = synthetic_audio(16000 * 3)
    frames = jnp.asarray(frame_audio(audio, cfg)[:, None])
    F = frames.shape[0]
    N = 8
    assert F > 2 * N  # several resyncs

    import functools

    from vap_realtime_tpu.runtime.incremental import hybrid_step

    step = jax.jit(functools.partial(hybrid_step, cfg=cfg, resync_every=N))
    st = init_hybrid_state(cfg, 1)
    st_q = init_hybrid_state(cfg, 1, quant=quant)
    p, p_q = [], []
    for f in range(F):
        st, out = step(params, st, frames[f])
        st_q, out_q = step(params, st_q, frames[f])
        # the LSTM state depends only on the audio, never on the cache,
        # so quant and non-quant runs must match EXACTLY every frame —
        # the bug zeroed h/c (tanh-range -> int8 -> 0) on resync frames
        np.testing.assert_array_equal(np.asarray(st_q.kv.lstm_h),
                                      np.asarray(st.kv.lstm_h),
                                      err_msg=f"lstm_h diverged, frame {f}")
        np.testing.assert_array_equal(np.asarray(st_q.kv.lstm_c),
                                      np.asarray(st.kv.lstm_c),
                                      err_msg=f"lstm_c diverged, frame {f}")
        p.append(np.asarray(out["p_now"]))
        p_q.append(np.asarray(out_q["p_now"]))
    dev = np.abs(np.stack(p_q) - np.stack(p)).max()
    print(f"\n[int8-hybrid] quant-vs-bf16 max={dev:.2e}")
    assert dev < 5e-3, dev


@pytest.mark.parametrize("quant", [True, "global"])
def test_int8_fast_arena_interleave(quant):
    """Quantized cache composes with the fast path + arena slot
    lifecycle: a jittery stream's outputs equal its solo run."""
    from vap_realtime_tpu.runtime.arena import StreamArena

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    params = synthetic_params(frame_hz=20)
    rs = np.random.RandomState(3)
    chunks = [rs.randn(2, cfg.frame_shift).astype(np.float32) * 0.1
              for _ in range(12)]

    def run(jitter):
        arena = StreamArena(cfg, params, capacity=3, path="fast",
                            quant_cache=quant)
        slot = arena.add_stream()
        other = arena.add_stream()
        got = []
        k = 0
        for tick in range(24):
            feed = {}
            if not jitter or tick % 2 == 0:
                if k < len(chunks):
                    feed[slot] = chunks[k]
                    k += 1
            if jitter:
                feed[other] = rs.randn(2, cfg.frame_shift).astype(
                    np.float32)
            if feed:
                out = arena.step(feed)
                if slot in out:
                    got.append(out[slot]["p_now"])
        return np.stack(got)

    solo = run(jitter=False)
    jittery = run(jitter=True)
    np.testing.assert_allclose(jittery, solo[:len(jittery)], atol=2e-5)


def test_staged_rejects_tiny_context():
    """STAGE_S staged stamps must be distinct mod context_frames; a
    context shorter than the stage would silently corrupt the ring, so
    state construction fails loudly instead (ADVICE r4)."""
    import pytest as _pytest

    from vap_realtime_tpu.runtime.incremental import STAGE_S

    cfg = VapConfig(frame_hz=10, context_len_sec=0.5)  # T=5 < STAGE_S
    assert cfg.context_frames < STAGE_S
    with _pytest.raises(ValueError, match="staged"):
        init_kv_state(cfg, 1, staged=True)


def test_fast_step_conv_chunks_identical():
    """Encoder sub-batching (conv_chunks, the transient-HBM capacity
    lever) must not change numerics."""
    from vap_realtime_tpu.runtime.incremental import (
        fast_step, init_fast_state,
    )

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
    p = synthetic_params(20)
    B = 8
    rs = np.random.RandomState(0)
    st1 = init_fast_state(cfg, B, staged=True)
    st2 = init_fast_state(cfg, B, staged=True)
    for _f in range(3):
        ch = jnp.asarray(
            rs.randn(B, 2, cfg.frame_shift).astype(np.float32) * 0.1)
        st1, o1 = fast_step(p, st1, ch, cfg, slots="staged")
        st2, o2 = fast_step(p, st2, ch, cfg, slots="staged",
                            conv_chunks=4)
        np.testing.assert_allclose(np.asarray(o2["p_now"]),
                                   np.asarray(o1["p_now"]), atol=1e-6)
