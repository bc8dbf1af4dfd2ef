"""Incremental streaming step — per-frame KV-cache append, single-query
attention, no full-context recompute.

Replaces the reference's O(T^2)-per-frame recompute (the central
inefficiency called out in SURVEY.md §3.2) with the stateless-step
formulation the reference itself proves out for ONNX export
(tools/vap_static.py:235-304), extended with true KV caching.

Semantics vs the parity-exact `stream_step`:

- While the context buffer is still growing (count <= context_frames) the
  two paths are EXACTLY equivalent: causal attention means appending a
  frame never changes earlier positions, and AliBi weights depend only on
  query-key distance (the reference's absolute-index ramp differs by a
  per-row constant which softmax cancels).
- Once the window slides, the reference recomputes old positions without
  the dropped frames; cached K/V keep their as-first-computed values
  (StreamingLLM-style sliding attention).  The deviation is bounded and
  regression-tested; for bit-parity use `stream_step`.

TPU-first performance design:
- ALL per-frame K/V vectors (28 of them: channel-GPT k/v x 2ch, stereo
  self + cross k/v x 2 towers x 3 layers) live in ONE phase-major
  cache of shape (B, P=7, T, 4*D): each layer phase's twin k/v pairs
  form a per-stream-contiguous (T, 4D) plane, so each of the 7 attend
  phases is ONE long sequential HBM read (the flat (B, T, 28D) layout
  measured ~20% of HBM bandwidth on strided reads — PERF.md r3).  A
  frame performs exactly one write of the (B, P, 1, 4D) row at its
  circular slot — no per-layer cache copies, no O(T) rolls.
- Within a step each attention attends over the T cached rows (ages
  1..T) PLUS the current position's fresh k/v (age 0), so the write can
  be deferred to one scatter at the end of the step.
- State is HBM-resident with a leading stream-batch axis; per-stream
  cache traffic is ~28*D*T*bytes per frame, which (not FLOPs) bounds
  stream capacity — use bf16 state for 2x capacity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.models.encoder import encode_chunk
from vap_realtime_tpu.models.transformer import alibi_slopes, combinator
from vap_realtime_tpu.models.vap import heads_forward, probs_from_outputs
from vap_realtime_tpu.ops.basic import gelu, layer_norm, linear

Params = Dict[str, Any]


def cache_layout(cfg: VapConfig) -> List[str]:
    """Fixed slot order of the fused cache's last dim (28 x D for the
    default 1 channel layer + 3 cross layers).

    Order invariant: every k/v pair is adjacent, and the TWIN pairs of
    each attend phase (the 2 channels of a channel layer; the 2 towers
    of a stereo self- or cross-phase) form one 4-slot PHASE — slot s
    maps to cache[:, s // 4, :, (s % 4) * D :].  Each phase is one
    per-stream-contiguous plane read by one `fused_attend_pair` launch
    (ops/pallas/attend.py)."""
    names = []
    for li in range(cfg.channel_layers):
        for ch in (0, 1):
            names += [f"ch{li}.{ch}.k", f"ch{li}.{ch}.v"]
    for li in range(cfg.cross_layers):
        for tw in (0, 1):
            names += [f"x{li}.{tw}.sk", f"x{li}.{tw}.sv"]
        for tw in (0, 1):
            names += [f"x{li}.{tw}.ck", f"x{li}.{tw}.cv"]
    return names


def _pin_default_layout(x: jax.Array) -> jax.Array:
    """Constrain x to the default (descending minor-to-major) layout.

    XLA's layout assignment gives the per-stream row scatter a
    {3,1,0,2} operand layout preference that otherwise infects the
    scan-carried / entry cache and forces a full-cache layout COPY
    (2.9 GB, ~10 ms/step at B=4096) before every pallas attend launch,
    whose custom-call operand layout is pinned to the default
    {3,2,1,0}.  Pinning the scatter RESULT keeps the whole chain in the
    default layout — the compiled step then has zero full-cache copies
    (r4 trace + single-step HLO inspection, PERF.md).  No-op on CPU.
    """
    if jax.default_backend() == "cpu":
        return x
    from jax.experimental import layout as jl

    return jl.with_layout_constraint(x, jl.Layout(tuple(range(x.ndim))))


def _scatter_rows(cache: jax.Array, rows: jax.Array, idx: jax.Array
                  ) -> jax.Array:
    """Write one (4D,) row per (stream, phase) at per-stream T-position
    `idx` ((B,) int32; out-of-range = drop).

    (Alternatives measured and rejected in r4: a flat windowed
    lax.scatter on the (B*P, T*4D) bitcast view — TPU lowers it to an
    index loop, 164 ms/step; P as an explicit scatter dim — 32.5
    ms/step.  PERF.md.)
    """
    B, P, T, D4 = cache.shape
    # NOT layout-pinned: with a per-frame scatter the constraint makes
    # XLA copy the whole cache back to the default layout every frame
    # (29.6 -> 39.4 ms measured).  The "staged" policy pins only its
    # 1-in-S merge scatter and reaches global-slot speed (PERF.md r4).
    return cache.at[jnp.arange(B), :, idx].set(
        rows, mode="drop", unique_indices=True)


def _scatter_rows_multi(cache: jax.Array, vals: jax.Array,
                        idx: jax.Array) -> jax.Array:
    """S-row variant of `_scatter_rows` (the staged-merge write).

    vals: (B, S, P, 4D); idx: (B, S) per-stream T-positions (distinct
    per stream; out-of-range = drop)."""
    B, P, T, D4 = cache.shape
    out = cache.at[jnp.arange(B)[:, None], :, idx].set(
        vals, mode="drop", unique_indices=True)
    return _pin_default_layout(out)


def quantize_rows(rows: jax.Array):
    """Symmetric int8 quantization over the last axis.

    rows: (..., 4D) -> (int8 rows, (...,) float32 max-abs/127 scales).
    One scale per phase-row keeps dequant a single broadcast multiply in
    the attend kernels.
    """
    f = rows.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=-1)
    sc = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(f / sc[..., None]), -127, 127).astype(jnp.int8)
    return q, sc


# quant="global" headroom: the per-stream scale freezes at MARGIN x the
# first active frame's max-abs (per phase x k/v column group); later
# rows that exceed it SATURATE at +-127 instead of rescaling history.
# K/V are projections of LayerNorm'd activations, so ranges are stable
# across time — measured e2e deviation is pinned in
# tests/test_incremental.py::test_int8_global_cache_tracks_bf16.
QG_MARGIN = 1.5


def quantize_rows_global(rows: jax.Array, gscale: jax.Array,
                         active: jax.Array):
    """int8 quantization with per-(stream, phase, k/v-group) FROZEN
    scales (``quant="global"``): scores/value dequant folds OUTSIDE the
    attend kernels (into q / k_cur / v_cur / the output), so the kernel
    body is the bf16 one plus two int8->bf16 casts — no per-row scale
    passes and half the cache DMA (PERF.md r5).

    rows: (B, P, 4D) fresh K/V rows; gscale: (B, P, 1, 4) current
    scales (0 = not yet set); active: (B,) bool.  Scales SET ONCE per
    stream — on its first active frame (slot resets zero them) — at
    QG_MARGIN x that frame's per-group max-abs / 127; all writes clamp.
    Returns (int8 rows (B, P, 4D), updated gscale)."""
    B, P, D4 = rows.shape
    f = rows.astype(jnp.float32).reshape(B, P, 4, D4 // 4)
    amax = jnp.max(jnp.abs(f), axis=-1)[:, :, None, :]      # (B, P, 1, 4)
    fresh = jnp.maximum(amax * (QG_MARGIN / 127.0), 1e-8)
    gs = jnp.where((gscale == 0) & active[:, None, None, None],
                   fresh, gscale)
    sc = jnp.where(gs == 0, 1.0, gs)                        # safe divide
    q = jnp.clip(jnp.round(f / jnp.swapaxes(sc, 2, 3)),     # (B, P, 4, 1)
                 -127, 127).astype(jnp.int8)
    return q.reshape(B, P, D4), gs


STAGE_S = 8  # staged-slot policy: frames buffered between ring merges


@jax.tree_util.register_dataclass
@dataclass
class KVState:
    """Fused-KV streaming state.

    cache:  (B, P, T, 4*D) phase-major — all K/V vectors, written once
            per frame.  P = n_slots/4 layer phases; phase p holds the
            twin k/v pairs 2p and 2p+1 as one (T, 4D) plane that is
            FULLY CONTIGUOUS per stream, so each attend phase is one
            long sequential HBM read (the flat (B, T, 28D) layout's
            strided 2 KB bursts ran at ~20% of HBM bandwidth and
            dominated the serving step — PERF.md r3).
    lstm_h/lstm_c: (B, 2, D) encoder context-net state.
    count:  (B,) frames seen per stream (each stream's OWN frame index).
    stamp:  (B, T) int32 — per stream, the value of `count` when that
            cache row was written, or -1 for an invalid row.  Attention
            ages are `count - stamp`: exact in each stream's own frame
            timeline even when streams tick at different rates in a
            shared arena (a frozen stream's rows do not age).
    scale:  int8-quantized cache only; a () placeholder otherwise.
            ``quant=True``/"row": (B, P, T) float32 per-(stream, phase,
            row) max-abs/127 scales — HALF the HBM read traffic of bf16
            on a bandwidth-bound trunk and 2x the stream capacity, for
            a ~0.4% relative K/V representation error (deviation pinned
            in tests/test_incremental.py), at the cost of two per-row
            dequant passes inside the attend kernels.
            ``quant="global"``: (B, P, 1, 4) float32 per-(stream,
            phase, k/v column group) scales FROZEN at the stream's
            first active frame (quantize_rows_global) — dequant folds
            entirely OUTSIDE the attend kernels (into q, k_cur, v_cur
            and the output), so the int8 cache's half-DMA shows up as
            step speedup, not just capacity (PERF.md r5).
    step:   () GLOBAL frame counter (used only by ``slots="global"``).
            A stream (re)joining a slot resets its `count` and its
            `stamp` row; stale cache rows are masked by the stamp test.

    Two circular-slot policies (the ``slots`` static arg of `kv_step`):

    - ``"stream"`` (default): each stream writes at its OWN ring position
      ``count % T`` via a row scatter.  A frozen tick touches nothing, so
      a stream's cached context is EXACTLY its last T own frames
      regardless of how ticks interleave across streams — full interleave
      invariance, including after the ring wraps.
    - ``"global"``: all active streams write the single scalar slot
      ``step % T`` as one contiguous dynamic_update_slice (frozen
      streams' row and stamp are preserved by a blend).  Cheapest write,
      and identical to "stream" while every stream is active on every
      tick from birth (count == step), e.g. the offline/bench paths.
      Under mixed activity it degrades gracefully: a stream active on a
      fraction d of ticks keeps only ~d*T of its own frames (two of its
      frames T global ticks apart collide in slot space) — rows become
      invalid, never wrong.
    - ``"staged"``: SAME semantics as "stream" (exact interleave
      invariance — bit-identical row placement and stamps), different
      write path: each frame's rows land in a small frame-major stage
      (a tile-complete leading-axis DUS, ~free) and one S-row scatter
      merges them to the per-stream ring positions every STAGE_S ticks.
      Attends read ring + stage + current, so outputs are unchanged.
      Amortizes the per-frame row scatter that made "stream" cost +21%
      (PERF.md r3); requires a state built with ``staged=True``.

    stage / stage_stamp / stage_scale: "staged" policy only (otherwise
    () placeholders).  stage: (S, B, P*4D) frame-major staged rows
    (stage[i] holds global tick g ≡ i mod S); stage_stamp: (S, B) the
    stream's `count` at staging, -1 = invalid (frozen tick / cleared at
    merge); stage_scale: (S, B, P) int8 dequant scales.
    """

    cache: jax.Array
    scale: jax.Array
    lstm_h: jax.Array
    lstm_c: jax.Array
    count: jax.Array
    stamp: jax.Array
    step: jax.Array
    stage: jax.Array
    stage_stamp: jax.Array
    stage_scale: jax.Array


def init_kv_state(cfg: VapConfig, batch: int = 1,
                  dtype=jnp.float32, quant: bool | str = False,
                  staged: bool = False) -> KVState:
    """staged=True builds the stage buffers the ``slots="staged"``
    policy needs (a (S, B, P*4D) frame-major row stage; see KVState).

    quant: False (dtype cache) | True / "row" (int8 cache, per-row
    dequant scales) | "global" (int8 cache, per-stream FROZEN scales
    that fold outside the attend kernels — see quantize_rows_global)."""
    D, T = cfg.dim, cfg.context_frames
    n = len(cache_layout(cfg))
    P = n // 4
    S = STAGE_S
    assert quant in (False, True, "row", "global"), quant
    quant_g = quant == "global"
    if staged and S > T:
        # the merge scatter targets stamp % T and relies on the S staged
        # stamps being distinct mod T; S > T (context_len_sec*frame_hz
        # < S) would silently corrupt the ring via colliding targets
        raise ValueError(
            f"staged slots need context_frames >= {S} (got {T}); use "
            f"slots='stream' for tiny-context configs")
    if quant_g:
        scale = jnp.zeros((batch, P, 1, 4), jnp.float32)
    elif quant:
        scale = jnp.zeros((batch, P, T), jnp.float32)
    else:
        scale = jnp.zeros((), jnp.float32)
    return KVState(
        cache=jnp.zeros((batch, P, T, 4 * D),
                        jnp.int8 if quant else dtype),
        scale=scale,
        lstm_h=jnp.zeros((batch, 2, D), dtype),
        lstm_c=jnp.zeros((batch, 2, D), dtype),
        count=jnp.zeros((batch,), jnp.int32),
        stamp=jnp.full((batch, T), -1, jnp.int32),
        step=jnp.zeros((), jnp.int32),
        stage=(jnp.zeros((S, batch, P * 4 * D),
                         jnp.int8 if quant else dtype) if staged
               else jnp.zeros((), dtype)),
        stage_stamp=(jnp.full((S, batch), -1, jnp.int32) if staged
                     else jnp.zeros((), jnp.int32)),
        stage_scale=(jnp.zeros((S, batch, P), jnp.float32)
                     if staged and quant and not quant_g
                     else jnp.zeros((), jnp.float32)),
    )


def kv_step(params: Params, state: KVState, chunk: jax.Array,
            cfg: VapConfig, active: jax.Array | None = None,
            slots: str = "stream", attend_impl: str = "einsum",
            merge: str = "auto"
            ) -> Tuple[KVState, Dict[str, jax.Array]]:
    """One incremental frame: chunk (B, 2, frame_samples) -> probabilities.

    Mirrors the trunk order of VAPRealTime.process_vap (vap_main.py:272-307)
    but touches only the newest position.

    active: optional (B,) bool — streams with no fresh frame this tick
    are FROZEN: their recurrent state, frame count and cached rows are
    unchanged (their outputs are garbage and must be ignored by the
    caller).  Default: all active.

    slots: "stream" | "global" — circular write-slot policy (static; see
    KVState docstring).  "stream" gives exact interleave invariance under
    mixed activity; "global" is the cheapest write and identical while
    all streams tick together from birth.
    """
    B = chunk.shape[0]
    D = cfg.dim
    dtype = state.lstm_h.dtype
    if active is None:
        active = jnp.ones((B,), bool)

    # --- encoder (both channels as one batch) ---
    flat = chunk.reshape(B * 2, -1)
    e, h_new, c_new = encode_chunk(
        params["encoder"], flat, state.lstm_h.reshape(B * 2, -1),
        state.lstm_c.reshape(B * 2, -1), cfg.downsample_kernel)
    e = e.reshape(B, 2, D).astype(dtype)
    return _kv_core(params, state, e, h_new.reshape(B, 2, D),
                    c_new.reshape(B, 2, D), cfg, active, slots,
                    attend_impl, merge)


def _kv_core(params: Params, state: KVState, e: jax.Array,
             h_new: jax.Array, c_new: jax.Array, cfg: VapConfig,
             active: jax.Array, slots: str, attend_impl: str = "einsum",
             merge: str = "auto"
             ) -> Tuple[KVState, Dict[str, jax.Array]]:
    """Post-encoder incremental step: e (B, 2, D) fresh embeddings ->
    single-query attentions over the fused cache + one slot write.

    attend_impl: "einsum" (XLA) or "pallas" (ops/pallas/attend.py fused
    kernel — same math, ~3x faster on TPU at serving batch sizes because
    it avoids the 64-lane per-head relayouts; see PERF.md).

    merge (staged slots only, STATIC): "auto" = in-graph
    lax.cond((g+1) % STAGE_S == 0) — required under lax.scan;
    "never" / "force" = the caller decides the merge cadence HOST-side
    and jits two step variants.  A cond branch cannot write the carried
    cache in place, so "auto" holds a cache-sized temporary (~5.5 GB at
    B=14,336 int8 — the measured serving capacity binder); the
    cond-free "force" step's merge scatter aliases the donated cache
    (runtime/arena.py uses never/force on a host tick counter).
    """
    B = e.shape[0]
    D, T, H = cfg.dim, cfg.context_frames, cfg.num_heads
    Dh = cfg.head_dim
    layout = cache_layout(cfg)
    dtype = state.lstm_h.dtype
    quant = state.scale.ndim == 3          # int8 cache + per-row scales
    quant_g = state.scale.ndim == 4        # int8 cache + frozen scales

    # ages of cached rows relative to the current frame (age 0 = current,
    # written at the END of this step), measured in each stream's OWN
    # frame timeline via the stamps: age = count - stamp.  A row is live
    # iff its stamp is valid AND it is within the last T-1 own frames.
    g = state.step                                # () global frame index
    age = state.count[:, None] - state.stamp      # (B, T)
    max_age = jnp.minimum(state.count, T - 1)     # (B,) live: age<=max
    live = (state.stamp >= 0) & (age <= max_age[:, None])   # (B, T)
    if cfg.context_limit > 0:
        live = live & (age < cfg.context_limit)
    # dead rows are encoded as a huge age: the -age*m_h bias underflows
    # to weight exactly 0 after softmax (shared by both attend impls)
    from vap_realtime_tpu.ops.pallas.attend import (
        DEAD, fused_attend_pair,
    )
    age_f = jnp.where(live, age.astype(jnp.float32), DEAD)  # (B, T)
    slopes = jnp.asarray(alibi_slopes(H), jnp.float32)      # (H,)
    # additive bias per (B, H, T): -age * m_h; current position bias = 0
    bias_old = jnp.where(live[:, None, :],
                         (-age.astype(jnp.float32)[:, None, :]
                          * slopes[None, :, None]),
                         -jnp.inf)

    staged = slots == "staged"
    if staged:
        assert state.stage.ndim == 3, \
            'slots="staged" needs a state built with staged=True'
        if attend_impl == "pallas3":
            raise ValueError("staged slots: use attend_impl='pallas' "
                             "(the compact v3 kernel has no staged path)")
        # staged rows' ages in the stream's own timeline; a row is live
        # iff its stamp is valid AND younger than `count` (a slot reset
        # can leave stale stamps >= the new count) AND in-window
        S = state.stage.shape[0]
        age_st = state.count[None, :] - state.stage_stamp      # (S, B)
        live_st = ((state.stage_stamp >= 0) & (age_st >= 1)
                   & (age_st <= max_age[None, :]))
        if cfg.context_limit > 0:
            live_st = live_st & (age_st < cfg.context_limit)
        age_st_f = jnp.where(live_st, age_st.astype(jnp.float32),
                             DEAD)                             # (S, B)
        # einsum/grouped read staged k/v concatenated after the ring
        age_f_cat = jnp.concatenate([age_f, age_st_f.T], axis=1)
        live_cat = jnp.concatenate([live, live_st.T], axis=1)
        bias_cat = jnp.where(live_cat[:, None, :],
                             (-jnp.where(live_cat, age_f_cat, 0.0)
                              [:, None, :] * slopes[None, :, None]),
                             -jnp.inf)
    else:
        age_st_f = None
        age_f_cat, bias_cat = age_f, bias_old

    new_vecs: Dict[str, jax.Array] = {}

    def attend_pair(q2, k2, v2, pair_base):
        """TWIN single-query attentions (the 2 channels of a channel-GPT
        layer, or the 2 towers of a stereo layer phase) in one go.

        q2/k2/v2: (B, 2, D), set s at [:, s]; set s reads the cache k/v
        pair `pair_base + s` — cache_layout keeps each phase's twin
        pairs adjacent, so the pallas impl reads ONE contiguous
        (B, T, 4D) block in ONE kernel launch (half the dispatches and
        2x the HBM burst length of per-set attends); einsum/grouped
        keep their per-set formulation unchanged.  Returns (B, 2, D).
        """
        if attend_impl in ("pallas", "pallas3"):
            # "pallas" = v4 broadcast kernel (production); "pallas3" =
            # compact-softmax v3 (kept as the measured negative result)
            scale_p = (state.scale[:, pair_base // 2] if quant else None)
            stage_kw = {}
            if staged:
                stage_kw = dict(
                    stage=state.stage, stage_age=age_st_f,
                    stage_scale=(state.stage_scale[:, :, pair_base // 2]
                                 if quant else None))
            if quant_g:
                # frozen-scale fold (quant="global"): the kernels see a
                # scale-FREE int8 problem — q rides c_k (scores of
                # dequantized K == scores of codes against q*c_k),
                # k_cur/v_cur ride 1/c so the current position lands in
                # CODE units, and the output scales back by c_v.  All
                # four are (B, 2, D)-level elementwise ops XLA fuses
                # into the surrounding projections; in-kernel cost is
                # two int8->bf16 casts (see ops/pallas/attend.py).
                gs = state.scale[:, pair_base // 2, 0]       # (B, 4)
                ck = jnp.where(gs[:, 0::2] == 0, 1.0,
                               gs[:, 0::2])[..., None]       # (B, 2, 1)
                cv = jnp.where(gs[:, 1::2] == 0, 1.0,
                               gs[:, 1::2])[..., None]
                out = fused_attend_pair(
                    state.cache,
                    (q2.astype(jnp.float32) * ck).astype(dtype),
                    (k2.astype(jnp.float32) / ck).astype(dtype),
                    (v2.astype(jnp.float32) / cv).astype(dtype),
                    age_f, scale=None, pair_base=pair_base,
                    num_heads=H,
                    impl=("compact" if attend_impl == "pallas3"
                          else "bcast"), **stage_kw)
                return (out.astype(jnp.float32) * cv).astype(dtype)
            return fused_attend_pair(state.cache, q2.astype(dtype),
                                     k2.astype(dtype), v2.astype(dtype),
                                     age_f, scale=scale_p,
                                     pair_base=pair_base, num_heads=H,
                                     impl=("compact"
                                           if attend_impl == "pallas3"
                                           else "bcast"), **stage_kw)
        outs = []
        for s_i in range(2):
            outs.append(attend(q2[:, s_i], k2[:, s_i], v2[:, s_i],
                               2 * (pair_base + s_i)))
        return jnp.stack(outs, axis=1)

    def attend(q, k_cur, v_cur, slot_k):
        """Single-query attention over cached rows + current position.

        q, k_cur, v_cur: (B, D).  Cached K/V live at global slot
        slot_k/slot_k+1 = phase slot_k//4, columns (slot_k%4)*D.
        """
        ph = slot_k // 4
        ko = (slot_k % 4) * D
        vo = ko + D

        def load(off):
            x = state.cache[:, ph, :, off:off + D]         # (B, T, D)
            if quant:
                x = (x.astype(jnp.float32)
                     * state.scale[:, ph, :, None]).astype(dtype)
            elif quant_g:
                x = (x.astype(jnp.float32)
                     * state.scale[:, ph, 0, off // D, None, None]
                     ).astype(dtype)
            if staged:
                # staged rows attend alongside the ring rows (their
                # placement order is irrelevant: ages come from stamps)
                y = state.stage[:, :, 4 * D * ph + off:
                                4 * D * ph + off + D]      # (S, B, D)
                if quant:
                    y = (y.astype(jnp.float32)
                         * state.stage_scale[:, :, ph, None]
                         ).astype(dtype)
                elif quant_g:
                    y = (y.astype(jnp.float32)
                         * state.scale[None, :, ph, 0, off // D, None]
                         ).astype(dtype)
                x = jnp.concatenate([x, jnp.swapaxes(y, 0, 1)], axis=1)
            return x

        if attend_impl == "grouped":
            # head-free formulation: all tensors stay at the native
            # D=256 lane width; per-head score/weight reductions go
            # through tiny one-hot group matmuls.  XLA's per-head einsum
            # lowering relayouts to 64-lane tiles and runs ~4x over the
            # cache-read bound (PERF.md r2); this formulation avoids it
            # without leaving XLA (fusable, no custom-call aliasing).
            f32 = jnp.float32
            G = jnp.asarray(np.kron(np.eye(H), np.ones((D // H, 1))),
                            dtype)                       # (D, H)
            k_old = load(ko)                              # (B, T, D)
            v_old = load(vo)
            scale = 1.0 / math.sqrt(D)
            qd = q.astype(dtype)
            P = k_old * qd[:, None, :]
            s = jnp.einsum("btd,dh->bth", P, G,
                           preferred_element_type=f32) * scale
            s = s - age_f_cat[:, :, None] * slopes[None, None, :]
            Pc = (k_cur.astype(dtype) * qd)
            s_cur = jnp.einsum("bd,dh->bh", Pc, G,
                               preferred_element_type=f32) * scale
            mx = jnp.maximum(jnp.max(s, axis=1), s_cur)   # (B, H)
            w = jnp.exp(s - mx[:, None, :])
            w_cur = jnp.exp(s_cur - mx)
            denom = jnp.sum(w, axis=1) + w_cur            # (B, H)
            wfull = jnp.einsum("bth,dh->btd", w.astype(dtype), G,
                               preferred_element_type=f32).astype(dtype)
            out = jnp.sum((wfull * v_old).astype(f32), axis=1)
            out = out + (jnp.einsum("bh,dh->bd", w_cur, G,
                                    preferred_element_type=f32)
                         * v_cur.astype(f32))
            dfull = jnp.einsum("bh,dh->bd", denom, G,
                               preferred_element_type=f32)
            return (out / dfull).astype(dtype)
        k_old = load(ko)                                     # (B, L, D)
        v_old = load(vo)
        L = k_old.shape[1]                   # T, or T+S with staging
        # stay in the state dtype (bf16 in serving) — the dots accumulate
        # in fp32 via preferred_element_type; softmax runs in fp32
        qh = q.reshape(B, H, Dh).astype(dtype)
        kh = k_old.reshape(B, L, H, Dh)
        scale = 1.0 / math.sqrt(D)
        s_old = jnp.einsum("bhd,bthd->bht", qh, kh,
                           preferred_element_type=jnp.float32)
        s_old = s_old * scale + bias_cat
        s_cur = (jnp.sum((qh * k_cur.reshape(B, H, Dh)
                          ).astype(jnp.float32), axis=-1,
                         keepdims=True) * scale)             # (B, H, 1)
        s_all = jnp.concatenate([s_old, s_cur], axis=-1)     # (B, H, L+1)
        w = jax.nn.softmax(s_all, axis=-1)
        vh = v_old.reshape(B, L, H, Dh)
        out = (jnp.einsum("bht,bthd->bhd", w.astype(dtype)[:, :, :L], vh,
                          preferred_element_type=jnp.float32)
               + w[:, :, L:] * v_cur.reshape(B, H, Dh)
               .astype(jnp.float32))
        return out.reshape(B, D).astype(dtype)

    def ffn(x, layer):
        h = layer_norm(x, layer["ln_ffn"]["w"], layer["ln_ffn"]["b"])
        return x + linear(gelu(linear(h, layer["ffn"]["w1"])),
                          layer["ffn"]["w2"])

    # Both channels/towers ride a size-2 axis at dim 1 through every
    # linear/LN (weights are shared across the twins, reference
    # vap_main.py:108-115), so each projection is ONE (2B, D) matmul
    # instead of two (B, D) ones and each attend phase ONE twin-pair
    # attention — the per-step kernel-dispatch count is the serving
    # bottleneck at these sizes (PERF.md r3).

    # --- channel GPT ---  x: (B, 2, D)
    x = e
    for li, layer in enumerate(params["ar_channel"]["layers"]):
        z = layer_norm(x, layer["ln_self"]["w"], layer["ln_self"]["b"])
        q = linear(z, layer["attn"]["q"])
        k = linear(z, layer["attn"]["k"])
        v = linear(z, layer["attn"]["v"])
        for ch in (0, 1):
            new_vecs[f"ch{li}.{ch}.k"] = k[:, ch]
            new_vecs[f"ch{li}.{ch}.v"] = v[:, ch]
        a = linear(attend_pair(q, k, v, 2 * li), layer["attn"]["proj"])
        x = ffn(x + a, layer)
    o1, o2 = x[:, 0], x[:, 1]

    # --- stereo GPT ---  towers on the same size-2 axis
    for li, layer in enumerate(params["ar"]["layers"]):
        base = 2 * cfg.channel_layers + 4 * li
        # self phase (both towers)
        z = layer_norm(x, layer["ln_self"]["w"], layer["ln_self"]["b"])
        q = linear(z, layer["attn"]["q"])
        k = linear(z, layer["attn"]["k"])
        v = linear(z, layer["attn"]["v"])
        for tw in (0, 1):
            new_vecs[f"x{li}.{tw}.sk"] = k[:, tw]
            new_vecs[f"x{li}.{tw}.sv"] = v[:, tw]
        a = linear(attend_pair(q, k, v, base), layer["attn"]["proj"])
        x_mid = x + a
        # cross phase: query from LN(x_mid); K/V from the RAW pre-update
        # OTHER tower (modules.py:276-283 — src is not normalized), so
        # project the own towers once and swap the twin axis
        zc = layer_norm(x_mid, layer["ln_src"]["w"], layer["ln_src"]["b"])
        qc = linear(zc, layer["attn_cross"]["q"])
        kc = linear(x, layer["attn_cross"]["k"])[:, ::-1]
        vc = linear(x, layer["attn_cross"]["v"])[:, ::-1]
        for tw in (0, 1):
            new_vecs[f"x{li}.{tw}.ck"] = kc[:, tw]
            new_vecs[f"x{li}.{tw}.cv"] = vc[:, tw]
        c = linear(attend_pair(qc, kc, vc, base + 2),
                   layer["attn_cross"]["proj"])
        x = ffn(x_mid + c, layer)
    x1, x2 = x[:, 0], x[:, 1]

    xc = combinator(params["ar"]["combinator"], x1, x2)

    # --- single cache write at the circular slot (policy: `slots`).
    # rows: (B, P, 4D) — the phase-major row of all fresh K/V vectors
    P = len(layout) // 4
    rows = jnp.stack(
        [jnp.concatenate([new_vecs[n] for n in layout[4 * ph:4 * ph + 4]],
                         axis=-1) for ph in range(P)], axis=1)
    gscale_new = None
    if quant:
        rows, scale_new = quantize_rows(rows)
    elif quant_g:
        # frozen per-stream scales: set once (first active frame), then
        # every write clamps into the same code space — no per-row
        # scale state, no scale scatter in any slot policy
        rows, gscale_new = quantize_rows_global(rows, state.scale, active)
        scale_new = None
    else:
        rows = rows.astype(dtype)
        scale_new = None
    stage2, stage_stamp2, stage_scale2 = (state.stage, state.stage_stamp,
                                          state.stage_scale)
    if staged:
        # --- stage write: one tile-complete leading-axis DUS (the
        # per-row scatter cost 10+ ms/step at B=4096: every 1-row write
        # read-modify-writes a full (16, 128) tile — PERF.md r4) ---
        S = state.stage.shape[0]
        si = g % S
        stage2 = jax.lax.dynamic_update_slice(
            state.stage, rows.reshape(1, B, P * rows.shape[-1]), (si, 0, 0))
        stage_stamp2 = jax.lax.dynamic_update_slice(
            state.stage_stamp,
            jnp.where(active, state.count, -1)[None, :], (si, 0))
        if quant:
            stage_scale2 = jax.lax.dynamic_update_slice(
                state.stage_scale, scale_new[None], (si, 0, 0))

        def _merge(_):
            # one S-row per-stream scatter every S ticks: each staged
            # row goes to its stream's own ring position stamp % T
            # (bit-identical placement to the "stream" policy).  Flat-
            # view windowed scatters for the same layout reason as the
            # "stream" branch.
            b_ix = jnp.arange(B)
            valid = stage_stamp2 >= 0                         # (S, B)
            # invalid rows get DISTINCT out-of-bounds targets (T + i):
            # duplicate indices would void unique_indices even in drop
            # mode
            oob = T + jnp.arange(S)[:, None]
            idx = jnp.where(valid, stage_stamp2 % T, oob).T   # (B, S)
            D4 = state.cache.shape[-1]
            vals = jnp.swapaxes(stage2.reshape(S, B, P, D4), 0, 1)
            c2 = _scatter_rows_multi(state.cache, vals, idx)
            st2 = state.stamp.at[b_ix[:, None], idx].set(
                stage_stamp2.T, mode="drop", unique_indices=True)
            sc2 = (_scatter_rows_multi(
                state.scale[..., None],
                jnp.swapaxes(stage_scale2, 0, 1)[..., None],
                idx)[..., 0] if quant else state.scale)
            return c2, st2, sc2, jnp.full_like(stage_stamp2, -1)

        def no_merge(_):
            return (state.cache, state.stamp, state.scale, stage_stamp2)

        if merge == "force":
            cache, stamp, cscale, stage_stamp2 = _merge(None)
        elif merge == "never":
            cache, stamp, cscale, stage_stamp2 = no_merge(None)
        else:
            cache, stamp, cscale, stage_stamp2 = jax.lax.cond(
                (g + 1) % STAGE_S == 0, _merge, no_merge, None)
    elif slots == "stream":
        # per-stream ring position; frozen streams' indices are pushed
        # out of bounds and dropped, so a frozen tick touches NOTHING.
        # Writes go through the flat-view windowed scatter — the naive
        # 4-D `.at[b_ix, :, idx].set` gave the scan-carried cache a
        # scatter-preferred layout and cost a full-cache layout copy
        # per step (~10 ms at B=4096; r4 trace, PERF.md).
        idx = jnp.where(active, state.count % T, T)
        b_ix = jnp.arange(B)
        cache = _scatter_rows(state.cache, rows, idx)
        stamp = state.stamp.at[b_ix, idx].set(
            state.count, mode="drop", unique_indices=True)
        cscale = (_scatter_rows(state.scale[..., None],
                                scale_new[..., None], idx)[..., 0]
                  if quant else state.scale)
    elif slots == "global":
        # one dynamic_update_slice at the scalar global slot; frozen
        # streams' row content + stamp are preserved by a blend (only
        # self-collisions — two own-frames T global ticks apart — can
        # still drop a live row; see KVState docstring).
        D4 = state.cache.shape[-1]
        old_row = jax.lax.dynamic_slice(state.cache, (0, 0, g % T, 0),
                                        (B, P, 1, D4))
        new_row = jnp.where(active[:, None, None, None],
                            rows[:, :, None, :], old_row)
        # NOTE (r3): this DUS costs 3.25 ms/step at B=4096 — writing a
        # single T row of the (8,128)-tiled cache read-modify-writes
        # every touched tile (~8x amplification).  An aliased pallas DMA
        # write was attempted and is Mosaic-rejected: HBM memref slices
        # must be tile-aligned on the sublane dim ("Slice shape along
        # dimension 2 must be aligned to tiling (8), but is 1"), so the
        # byte-exact row write is not expressible either way (PERF.md).
        cache = jax.lax.dynamic_update_slice(state.cache, new_row,
                                             (0, 0, g % T, 0))
        if quant:
            old_sc = jax.lax.dynamic_slice(state.scale, (0, 0, g % T),
                                           (B, P, 1))
            new_sc = jnp.where(active[:, None, None],
                               scale_new[:, :, None], old_sc)
            cscale = jax.lax.dynamic_update_slice(state.scale, new_sc,
                                                  (0, 0, g % T))
        else:
            cscale = state.scale
        old_stamp = jax.lax.dynamic_slice(state.stamp, (0, g % T), (B, 1))
        new_stamp = jnp.where(active[:, None], state.count[:, None],
                              old_stamp)
        stamp = jax.lax.dynamic_update_slice(state.stamp, new_stamp,
                                             (0, g % T))
    else:
        raise ValueError(f"unknown slots policy {slots!r}")
    if quant_g:
        # frozen scales bypass the per-row scale plumbing of every slot
        # policy above (their `cscale` is just state.scale)
        cscale = gscale_new

    trunk = {"x": xc[:, None], "o1": o1[:, None], "o2": o2[:, None],
             "x1": x1[:, None], "x2": x2[:, None]}
    outs = heads_forward(params, trunk, cfg)
    probs = probs_from_outputs(outs, cfg)

    a_state = active[:, None, None]
    new_state = KVState(
        cache=cache,
        scale=cscale,
        lstm_h=jnp.where(a_state, h_new.astype(dtype), state.lstm_h),
        lstm_c=jnp.where(a_state, c_new.astype(dtype), state.lstm_c),
        count=state.count + active.astype(jnp.int32),
        stamp=stamp,
        step=g + 1,
        stage=stage2,
        stage_stamp=stage_stamp2,
        stage_scale=stage_scale2,
    )
    return new_state, {k: v[:, -1] for k, v in probs.items()}


# ---------------------------------------------------------------------------
# Fast path: seamless streaming conv + incremental KV
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class FastState:
    """KVState plus the streaming-conv input tails (fast serving path).

    conv: per-layer (B*2, C, k-s) carried inputs — see
    models/encoder.py `encode_chunk_streaming`.
    """

    kv: KVState
    conv: Dict[str, jax.Array]


def init_fast_state(cfg: VapConfig, batch: int = 1,
                    dtype=jnp.float32, quant: bool | str = False,
                    staged: bool = False,
                    conv_impl: str = "conv") -> FastState:
    from vap_realtime_tpu.models.encoder import init_conv_stream_state

    if conv_impl == "fused":
        from vap_realtime_tpu.ops.pallas.encoder import (
            init_conv_stream_state_fused,
        )
        conv = init_conv_stream_state_fused(batch * 2, cfg.encoder_dim,
                                            dtype)
    else:
        conv = init_conv_stream_state(batch * 2, cfg.encoder_dim, dtype)
    return FastState(
        kv=init_kv_state(cfg, batch, dtype, quant, staged),
        conv=conv,
    )


def fast_step(params: Params, state: FastState, new: jax.Array,
              cfg: VapConfig, active: jax.Array | None = None,
              slots: str = "global", attend_impl: str = "einsum",
              conv_impl: str = "conv", conv_chunks: int = 1,
              merge: str = "auto"
              ) -> Tuple[FastState, Dict[str, jax.Array]]:
    """One fast-path frame: new (B, 2, 16000//frame_hz) FRESH samples
    only (no 320-sample overlap) -> probabilities.

    Encoder = seamless streaming conv (72% of the chunked conv FLOPs,
    zero overlap recompute); trunk = incremental KV attention.  Fast-path
    numerics: identical to one seamless valid conv over the whole stream
    (encode_sequence_streaming_oracle); deviates from the reference's
    per-chunk pad+trim recipe near stream start and by the 320-sample
    alignment — use `kv_step`/`stream_step` for reference numerics.

    conv_chunks > 1 sub-batches the ENCODER (conv stack + LSTM +
    downsample) into that many sequential lax.map slices: the conv0/1
    activation transients — the measured HBM capacity binder at large B
    (VERDICT r4: int8 serving OOMs at B=12,288 while the state budget
    allows ~42k) — shrink by the same factor, trading a little
    scheduling overlap for stream capacity.  Numerics identical.
    """
    from vap_realtime_tpu.models.encoder import encode_chunk_streaming

    B = new.shape[0]
    D = cfg.dim
    dtype = state.kv.lstm_h.dtype
    if active is None:
        active = jnp.ones((B,), bool)

    flat = new.reshape(B * 2, -1)
    h0 = state.kv.lstm_h.reshape(B * 2, -1)
    c0 = state.kv.lstm_c.reshape(B * 2, -1)
    if conv_chunks > 1 and (B * 2) % conv_chunks == 0:
        k = conv_chunks
        split = lambda a: jax.tree_util.tree_map(
            lambda x: x.reshape(k, x.shape[0] // k, *x.shape[1:]), a)
        e, conv2, h_new, c_new = jax.lax.map(
            lambda xs: encode_chunk_streaming(
                params["encoder"], xs[0], xs[1], xs[2], xs[3],
                cfg.downsample_kernel, conv_impl),
            (split(flat), split(state.conv), split(h0), split(c0)))
        unsplit = lambda a: jax.tree_util.tree_map(
            lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), a)
        e, conv2, h_new, c_new = (unsplit(e), unsplit(conv2),
                                  unsplit(h_new), unsplit(c_new))
    else:
        e, conv2, h_new, c_new = encode_chunk_streaming(
            params["encoder"], flat, state.conv, h0, c0,
            cfg.downsample_kernel, conv_impl)
    e = e.reshape(B, 2, D).astype(dtype)

    act2 = jnp.repeat(active, 2)
    conv2 = {k: jnp.where(act2[:, None, None], v.astype(dtype),
                          state.conv[k])
             for k, v in conv2.items()}
    kv2, outs = _kv_core(params, state.kv, e,
                         h_new.reshape(B, 2, D), c_new.reshape(B, 2, D),
                         cfg, active, slots, attend_impl, merge)
    return FastState(kv=kv2, conv=conv2), outs


def run_frames_fast(params: Params, state: FastState, frames: jax.Array,
                    cfg: VapConfig, slots: str = "global",
                    attend_impl: str = "einsum"):
    """`lax.scan` of fast_step over (F, B, 2, frame_shift)."""

    def body(st, chunk):
        return fast_step(params, st, chunk, cfg, slots=slots,
                         attend_impl=attend_impl)

    return jax.lax.scan(body, state, frames)


# ---------------------------------------------------------------------------
# Hybrid path: incremental KV with periodic full-recompute resync
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class HybridState:
    """KVState plus the raw embedding ring needed to rebuild the cache.

    e_ctx: (B, 2, T, D) right-aligned embedding ring (newest at T-1) —
    encoder outputs are path-independent, so a full-trunk recompute from
    this ring reproduces the parity-exact (`stream_step`) values and
    flushes the StreamingLLM drift of the cached K/V.
    """

    kv: KVState
    e_ctx: jax.Array


def init_hybrid_state(cfg: VapConfig, batch: int = 1,
                      dtype=jnp.float32, quant: bool | str = False,
                      staged: bool = False) -> HybridState:
    """staged=True: the incremental branch uses the staged slot policy
    (exact "stream" semantics at global-slot cost; PERF.md r4)."""
    D, T = cfg.dim, cfg.context_frames
    return HybridState(
        kv=init_kv_state(cfg, batch, dtype, quant, staged),
        e_ctx=jnp.zeros((batch, 2, T, D), dtype),
    )


def _trunk_rows(params: Params, e_ctx: jax.Array, count: jax.Array,
                cfg: VapConfig):
    """Full masked trunk over the right-aligned embedding ring, capturing
    every sublayer's K/V (same values `kv_step` would have cached had no
    frame ever been dropped).

    Returns (probs_last: {name: (B, ...)}, rows: (B, P, T, 4*D)
    phase-major, ring order j=0..T-1 (oldest..newest) on the T axis).
    Mirrors streaming.trunk_full/_masked_layer with K/V capture;
    reference semantics rvap/vap_main/vap_main.py:272-307.
    """
    from vap_realtime_tpu.runtime.streaming import _masked_bias

    B, _, T, D = e_ctx.shape
    H = cfg.num_heads
    Dh = cfg.head_dim
    valid = jnp.minimum(count, T)
    base, key_ok = _masked_bias(cfg, valid, e_ctx.dtype)
    eye = jnp.eye(T, dtype=bool)
    allowed = key_ok[:, None, None, :] | eye[None, None]   # (B,1,T,T)
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    captured: Dict[str, jax.Array] = {}

    def attn(p, q_in, kv_in, k_name, v_name):
        q = linear(q_in, p["q"])
        k = linear(kv_in, p["k"])
        v = linear(kv_in, p["v"])
        captured[k_name], captured[v_name] = k, v
        split = lambda t: t.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        qh, kh, vh = split(q), split(k), split(v)
        s = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                       preferred_element_type=jnp.float32)
        s = s * (1.0 / math.sqrt(D))
        s = jnp.where(allowed, s + base[None].astype(jnp.float32), neg)
        a = jax.nn.softmax(s, axis=-1)
        y = jnp.einsum("bhij,bhjd->bhid", a.astype(q_in.dtype), vh,
                       preferred_element_type=jnp.float32)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, D).astype(q_in.dtype)
        return linear(y, p["proj"])

    def self_attn(x, layer, kn, vn):
        z = layer_norm(x, layer["ln_self"]["w"], layer["ln_self"]["b"])
        return attn(layer["attn"], z, z, kn, vn)

    def cross_attn(x, src, layer, kn, vn):
        z = layer_norm(x, layer["ln_src"]["w"], layer["ln_src"]["b"])
        return attn(layer["attn_cross"], z, src, kn, vn)

    def ffn(x, layer):
        h = layer_norm(x, layer["ln_ffn"]["w"], layer["ln_ffn"]["b"])
        return x + linear(gelu(linear(h, layer["ffn"]["w1"])),
                          layer["ffn"]["w2"])

    xs = [e_ctx[:, 0], e_ctx[:, 1]]
    for li, layer in enumerate(params["ar_channel"]["layers"]):
        for ch in (0, 1):
            a = self_attn(xs[ch], layer, f"ch{li}.{ch}.k", f"ch{li}.{ch}.v")
            xs[ch] = ffn(xs[ch] + a, layer)
    o1, o2 = xs

    x1, x2 = o1, o2
    for li, layer in enumerate(params["ar"]["layers"]):
        pre = (x1, x2)
        new = []
        for tw in (0, 1):
            x, other = pre[tw], pre[1 - tw]
            x = x + self_attn(x, layer, f"x{li}.{tw}.sk", f"x{li}.{tw}.sv")
            c = cross_attn(x, other, layer, f"x{li}.{tw}.ck",
                           f"x{li}.{tw}.cv")
            x = ffn(x + c, layer)
            new.append(x)
        x1, x2 = new

    xc = combinator(params["ar"]["combinator"], x1, x2)
    trunk = {"x": xc, "o1": o1, "o2": o2, "x1": x1, "x2": x2}
    outs = heads_forward(params, trunk, cfg)
    probs = probs_from_outputs(outs, cfg)
    layout = cache_layout(cfg)
    rows = jnp.stack(
        [jnp.concatenate([captured[n]
                          for n in layout[4 * ph:4 * ph + 4]], axis=-1)
         for ph in range(len(layout) // 4)], axis=1)   # (B, P, T, 4D)
    return {k: v[:, -1] for k, v in probs.items()}, rows


def hybrid_step(params: Params, state: HybridState, chunk: jax.Array,
                cfg: VapConfig, active: jax.Array | None = None,
                resync_every: int = 0, attend_impl: str = "einsum",
                resync_mode: str = "auto", merge: str = "auto"
                ) -> Tuple[HybridState, Dict[str, jax.Array]]:
    """Incremental KV step with periodic full-recompute resync.

    Every `resync_every`-th tick (global cadence; 0 = never) the trunk
    is recomputed from the raw embedding ring: that frame's outputs are
    PARITY-EXACT (identical to `stream_step`) and the whole fused cache
    is rewritten with drift-free K/V, so inter-resync deviation is
    bounded by at most `resync_every` frames of StreamingLLM drift
    instead of growing with stream length.  Costs one O(T^2) trunk per
    resync (amortized: +T/resync_every relative FLOPs).
    """
    B = chunk.shape[0]
    D = cfg.dim
    dtype = state.kv.lstm_h.dtype
    if active is None:
        active = jnp.ones((B,), bool)

    flat = chunk.reshape(B * 2, -1)
    e, h_new, c_new = encode_chunk(
        params["encoder"], flat, state.kv.lstm_h.reshape(B * 2, -1),
        state.kv.lstm_c.reshape(B * 2, -1), cfg.downsample_kernel)
    e = e.reshape(B, 2, D).astype(dtype)
    kv2, e_ctx, outs = _hybrid_core(
        params, state.kv, state.e_ctx, e, h_new.reshape(B, 2, D),
        c_new.reshape(B, 2, D), cfg, active, resync_every, attend_impl,
        resync_mode, merge)
    return HybridState(kv=kv2, e_ctx=e_ctx), outs


def _hybrid_core(params: Params, kv: KVState, e_ctx_prev: jax.Array,
                 e: jax.Array, h_new: jax.Array, c_new: jax.Array,
                 cfg: VapConfig, active: jax.Array, resync_every: int,
                 attend_impl: str = "einsum", resync_mode: str = "auto",
                 merge: str = "auto"):
    """Post-encoder hybrid step: ring append + cond(resync, incremental).

    Shared by `hybrid_step` (chunked parity encoder) and
    `fast_hybrid_step` (seamless streaming encoder) — the resync trunk is
    encoder-agnostic because it recomputes from the raw embedding ring,
    whichever encoder produced it.  Returns (kv2, e_ctx, outs).

    resync_mode (STATIC): "auto" = in-graph lax.cond on
    (step+1) % resync_every (required under lax.scan); "never"/"force"
    = the caller owns the cadence host-side (runtime/arena.py) or via a
    resync-aligned blocked scan (run_frames_*_hybrid host_cadence) —
    the cond-free forms avoid the branch's cache-sized temporaries and
    any cost of the in-graph conditional.  merge: forwarded to the
    incremental branch's staged-slot write (see _kv_core).
    """
    T = cfg.context_frames
    # LSTM/ring dtype, NOT kv.cache.dtype: with quant_cache the cache is
    # int8 and casting the recurrent state to it would truncate tanh-range
    # values to 0 on every resync frame (ADVICE r3, high).
    dtype = kv.lstm_h.dtype

    # append to the embedding ring (frozen streams unchanged)
    rolled = jnp.roll(e_ctx_prev, -1, axis=2).at[:, :, -1, :].set(e)
    e_ctx = jnp.where(active[:, None, None, None], rolled, e_ctx_prev)

    staged_kv = kv.stage.ndim == 3

    def incr(_):
        kv2, outs = _kv_core(params, kv, e, h_new, c_new, cfg, active,
                             "staged" if staged_kv else "stream",
                             attend_impl, merge)
        return kv2, outs

    def resync(_):
        count2 = kv.count + active.astype(jnp.int32)
        probs, rows = _trunk_rows(params, e_ctx, count2, cfg)
        # realign ring order j to each stream's OWN slot c_j % T where
        # c_j = count2-1 - (T-1-j); reads are stamp-based so only the
        # eviction order needs this alignment with future kv writes.
        s = jnp.arange(T)[None, :]
        jj = (s - count2[:, None]) % T                     # row for slot s
        cache2 = jnp.take_along_axis(rows, jj[:, None, :, None], axis=2)
        c_at = count2[:, None] - 1 - (T - 1 - jj)          # frame idx (B,T)
        stamp2 = jnp.where(c_at >= 0, c_at, -1)
        a = active[:, None, None]
        if kv.scale.ndim == 3:                 # int8 cache: requantize
            cache2, scale2 = quantize_rows(cache2)
        elif kv.scale.ndim == 4:               # frozen scales ("global")
            # unset streams calibrate from the WHOLE rebuilt ring (a
            # better estimate than the single-frame init); set streams
            # keep their frozen scale and clamp, as everywhere else
            B2, P2, T2, D42 = cache2.shape
            f = cache2.astype(jnp.float32).reshape(B2, P2, T2, 4,
                                                   D42 // 4)
            amax = jnp.max(jnp.abs(f), axis=(2, 4))[:, :, None, :]
            fresh = jnp.maximum(amax * (QG_MARGIN / 127.0), 1e-8)
            scale2 = jnp.where((kv.scale == 0)
                               & active[:, None, None, None],
                               fresh, kv.scale)
            sc = jnp.where(scale2 == 0, 1.0, scale2)     # (B, P, 1, 4)
            cache2 = jnp.clip(jnp.round(f / sc[..., None]), -127, 127
                              ).astype(jnp.int8).reshape(B2, P2, T2, D42)
        else:
            cache2 = cache2.astype(dtype)
            scale2 = kv.scale
        kv2 = KVState(
            cache=cache2,
            scale=scale2,
            lstm_h=jnp.where(a, h_new.astype(dtype), kv.lstm_h),
            lstm_c=jnp.where(a, c_new.astype(dtype), kv.lstm_c),
            count=count2,
            stamp=stamp2,
            step=kv.step + 1,
            stage=kv.stage,
            # resync rewrote EVERY row into the ring — staged rows must
            # be invalidated or they would attend TWICE (a staged row
            # and its ring rewrite share a stamp)
            stage_stamp=(jnp.full_like(kv.stage_stamp, -1)
                         if kv.stage_stamp.ndim == 2
                         else kv.stage_stamp),
            stage_scale=kv.stage_scale,
        )
        return kv2, probs

    if resync_mode == "force":
        kv2, outs = resync(None)
    elif resync_mode == "never" or resync_every <= 0:
        kv2, outs = incr(None)
    else:
        is_resync = (kv.step + 1) % resync_every == 0
        kv2, outs = jax.lax.cond(is_resync, resync, incr, None)
    return kv2, e_ctx, outs


# ---------------------------------------------------------------------------
# Fast-hybrid path: streaming conv encoder + incremental KV + periodic resync
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class FastHybridState:
    """FastState plus the embedding ring for resync.

    The resync trunk recomputes from the ring of FAST (seamless
    streaming-conv) embeddings, so resync frames are exact w.r.t. a full
    trunk over the fast encoder's own embeddings — it flushes the
    StreamingLLM K/V drift; the (documented, bounded) encoder-numerics
    delta vs the reference's chunked pad+trim recipe remains (see
    `fast_step`).
    """

    kv: KVState
    conv: Dict[str, jax.Array]
    e_ctx: jax.Array


def init_fast_hybrid_state(cfg: VapConfig, batch: int = 1,
                           dtype=jnp.float32, quant: bool | str = False,
                           staged: bool = False) -> FastHybridState:
    from vap_realtime_tpu.models.encoder import init_conv_stream_state

    D, T = cfg.dim, cfg.context_frames
    return FastHybridState(
        kv=init_kv_state(cfg, batch, dtype, quant, staged),
        conv=init_conv_stream_state(batch * 2, cfg.encoder_dim, dtype),
        e_ctx=jnp.zeros((batch, 2, T, D), dtype),
    )


def fast_hybrid_step(params: Params, state: FastHybridState, new: jax.Array,
                     cfg: VapConfig, active: jax.Array | None = None,
                     resync_every: int = 0, attend_impl: str = "einsum",
                     resync_mode: str = "auto", merge: str = "auto"
                     ) -> Tuple[FastHybridState, Dict[str, jax.Array]]:
    """Fast path with periodic drift-flushing resync.

    new: (B, 2, 16000//frame_hz) FRESH samples (fast framing).  Every
    `resync_every`-th tick the trunk recomputes from the embedding ring:
    that frame's outputs are EXACT w.r.t. the full-trunk-over-fast-
    embeddings oracle (`resync_every=1` degenerates to it) and the cache
    is rewritten drift-free, so inter-resync deviation is bounded by at
    most `resync_every` frames of StreamingLLM drift (VERDICT r2 item 4).
    """
    from vap_realtime_tpu.models.encoder import encode_chunk_streaming

    B = new.shape[0]
    D = cfg.dim
    dtype = state.kv.lstm_h.dtype
    if active is None:
        active = jnp.ones((B,), bool)

    flat = new.reshape(B * 2, -1)
    e, conv2, h_new, c_new = encode_chunk_streaming(
        params["encoder"], flat, state.conv,
        state.kv.lstm_h.reshape(B * 2, -1),
        state.kv.lstm_c.reshape(B * 2, -1), cfg.downsample_kernel)
    e = e.reshape(B, 2, D).astype(dtype)

    act2 = jnp.repeat(active, 2)
    conv2 = {k: jnp.where(act2[:, None, None], v.astype(dtype),
                          state.conv[k])
             for k, v in conv2.items()}
    kv2, e_ctx, outs = _hybrid_core(
        params, state.kv, state.e_ctx, e, h_new.reshape(B, 2, D),
        c_new.reshape(B, 2, D), cfg, active, resync_every, attend_impl,
        resync_mode, merge)
    return FastHybridState(kv=kv2, conv=conv2, e_ctx=e_ctx), outs


def run_frames_fast_hybrid(params: Params, state: FastHybridState,
                           frames: jax.Array, cfg: VapConfig,
                           resync_every: int, attend_impl: str = "einsum",
                           host_cadence: bool = False):
    """`lax.scan` of fast_hybrid_step over (F, B, 2, frame_shift).

    host_cadence=True compiles the RESYNC-ALIGNED blocked form instead
    of a per-step lax.cond: an outer scan over resync blocks, each =
    (resync_every - 1) cond-free incremental steps + 1 cond-free resync
    step.  Requires state.kv.step % resync_every == 0 (fresh states)
    and F % resync_every == 0.  Same math, same cadence — this is the
    scan-shaped twin of the arena's host-side dispatch.
    """

    def body(st, chunk):
        return fast_hybrid_step(params, st, chunk, cfg,
                                resync_every=resync_every,
                                attend_impl=attend_impl)

    if not host_cadence:
        return jax.lax.scan(body, state, frames)

    F = frames.shape[0]
    R = resync_every
    assert F % R == 0, (F, R)

    def incr_body(st, chunk):
        return fast_hybrid_step(params, st, chunk, cfg,
                                resync_every=R,
                                attend_impl=attend_impl,
                                resync_mode="never")

    def block(st, chunk_block):               # (R, B, 2, L)
        st, outs1 = jax.lax.scan(incr_body, st, chunk_block[:R - 1])
        st, out_r = fast_hybrid_step(params, st, chunk_block[R - 1], cfg,
                                     resync_every=R,
                                     attend_impl=attend_impl,
                                     resync_mode="force")
        outs = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b[None]], axis=0),
            outs1, out_r)
        return st, outs

    blocks = frames.reshape((F // R, R) + frames.shape[1:])
    st, outs = jax.lax.scan(block, state, blocks)
    return st, jax.tree_util.tree_map(
        lambda a: a.reshape((F,) + a.shape[2:]), outs)


def run_frames_hybrid(params: Params, state: HybridState, frames: jax.Array,
                      cfg: VapConfig, resync_every: int):
    """`lax.scan` of hybrid_step over (F, B, 2, frame_samples)."""

    def body(st, chunk):
        return hybrid_step(params, st, chunk, cfg,
                           resync_every=resync_every)

    return jax.lax.scan(body, state, frames)


def run_frames_kv(params: Params, state: KVState, frames: jax.Array,
                  cfg: VapConfig, slots: str = "global"):
    """`lax.scan` of kv_step over (F, B, 2, frame_samples).

    All streams are active every frame, so the default "global" slot
    policy is exactly equivalent to "stream" (count == step throughout)
    at the cheapest write cost.
    """

    def body(st, chunk):
        return kv_step(params, st, chunk, cfg, slots=slots)

    return jax.lax.scan(body, state, frames)
