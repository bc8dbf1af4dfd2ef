"""StreamArena — slot-based multi-stream serving state (HBM-resident).

The XLA-static-shape answer to ragged stream lifecycles (SURVEY.md §7.3):
a fixed-capacity arena of stream slots with per-slot validity counters.
Admission = reset a free slot's recurrent state (its stale cache rows are
masked out by the age/validity test, so no cache clearing is needed);
eviction = return the slot to the free list.  Every tick steps the FULL
batch in one jitted dispatch; empty slots process silence and their
outputs are ignored.

This is the "batched multi-stream serving: state arena, stream
add/remove" component (SURVEY.md §7.2 item 4, BASELINE configs[3]).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.runtime import incremental, streaming


def jit_pinned(fn, *protos, donate_argnums=()):
    """jit `fn` with DEFAULT entry/exit layouts pinned on every array.

    Without this, XLA picks the per-stream row scatter's preferred
    {3,1,0,2} entry layout for the KV cache and inserts full-cache
    layout COPIES (2.9 GB each at B=4096) around the pallas attend
    launches, whose custom-call operand layouts are fixed at the
    default — measured ~10 ms/tick (r4 trace; PERF.md).  Pinning every
    array argument and result to the default (descending) layout
    compiles to ZERO full-cache copies.  EVERY jit whose results feed a
    pinned jit must itself be pinned (jit rejects mismatched arg
    layouts instead of copying).  No-op on CPU (tests).

    protos: one array / ShapeDtypeStruct pytree per positional arg.
    """
    if jax.default_backend() == "cpu":
        return jax.jit(fn)
    from jax.experimental import layout as jl
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]

    def fmt(x):
        return jl.Format(jl.Layout(tuple(range(x.ndim))),
                         SingleDeviceSharding(dev))

    in_f = jax.tree_util.tree_map(fmt, protos)
    out_f = jax.tree_util.tree_map(fmt, jax.eval_shape(fn, *protos))
    # donation: per-tick serving otherwise allocates a fresh multi-GB
    # state each step while the old one awaits deferred deallocation —
    # measured RESOURCE_EXHAUSTED after a few ticks at capacity 4096
    # through the relay.  Callers must REPLACE their state with the
    # result (arena.step/warmup/add_stream do).
    return jax.jit(fn, in_shardings=in_f, out_shardings=out_f,
                   donate_argnums=donate_argnums)


def _reset_slot(state, mask: jax.Array):
    """Zero the recurrent state + validity counters of every slot where
    `mask` ((B,) bool) is set.

    Mask-based so ANY number of slots resets in ONE fixed-shape jitted
    call: per-slot index calls serialize one device round trip per new
    connection (~25 ms each through a remote device link — a 4096-conn
    ramp spent 100+ s in resets before this, r4)."""
    if isinstance(state, incremental.FastHybridState):
        m2 = jnp.repeat(mask, 2)
        return incremental.FastHybridState(
            kv=_reset_slot(state.kv, mask),
            conv={k: jnp.where(m2[:, None, None], 0.0, v)
                  for k, v in state.conv.items()},
            e_ctx=state.e_ctx,  # masked by count (right-aligned validity)
        )
    if isinstance(state, incremental.FastState):
        # conv tails are stored per CHANNEL-stream (B*2 leading axis):
        # slot i owns rows 2i and 2i+1
        m2 = jnp.repeat(mask, 2)
        return incremental.FastState(
            kv=_reset_slot(state.kv, mask),
            conv={k: jnp.where(m2[:, None, None], 0.0, v)
                  for k, v in state.conv.items()},
        )
    if isinstance(state, incremental.HybridState):
        return incremental.HybridState(
            kv=_reset_slot(state.kv, mask),
            e_ctx=state.e_ctx,  # masked by count (right-aligned validity)
        )
    if isinstance(state, incremental.KVState):
        return incremental.KVState(
            cache=state.cache,  # stale rows masked by stamp
            # per-row scales (ndim 3) are only read for live rows and
            # may stay; the FROZEN per-stream scales of quant="global"
            # (ndim 4) must re-calibrate on the new stream's first frame
            scale=(jnp.where(mask[:, None, None, None], 0.0, state.scale)
                   if state.scale.ndim == 4 else state.scale),
            lstm_h=jnp.where(mask[:, None, None], 0.0, state.lstm_h),
            lstm_c=jnp.where(mask[:, None, None], 0.0, state.lstm_c),
            count=jnp.where(mask, 0, state.count),
            stamp=jnp.where(mask[:, None], -1, state.stamp),
            step=state.step,
            stage=state.stage,  # stale staged rows masked by stage_stamp
            stage_stamp=(jnp.where(mask[None, :], -1, state.stage_stamp)
                         if state.stage_stamp.ndim == 2
                         else state.stage_stamp),
            stage_scale=state.stage_scale,
        )
    return streaming.StreamState(
        lstm_h=jnp.where(mask[:, None, None], 0.0, state.lstm_h),
        lstm_c=jnp.where(mask[:, None, None], 0.0, state.lstm_c),
        e_ctx=state.e_ctx,  # masked by count (right-aligned validity)
        count=jnp.where(mask, 0, state.count),
    )


class StreamArena:
    """Fixed-capacity batched streaming engine with slot lifecycle."""

    def __init__(self, cfg: VapConfig, params, capacity: int = 64,
                 path: str = "kv", dtype=jnp.float32, slots: str = "staged",
                 resync_every: Optional[int] = None,
                 attend_impl: str = "einsum",
                 quant_cache: bool | str = False,
                 wire_dtype=np.float32, conv_impl: str = "conv",
                 conv_chunks: int = 1):
        """wire_dtype: dtype of the chunks fed to step() — np.float32
        (normalized audio) or np.int16 (raw samples; normalized /32768
        on device — quarters the host->device transfer, the serving
        bottleneck on slow host links).

        conv_impl / conv_chunks (fast path): streaming-conv encoder
        implementation and encoder sub-batching factor (transient HBM
        capacity lever — see incremental.fast_step)."""
        self.cfg = cfg
        self.capacity = capacity
        self.path = path
        self.wire_dtype = wire_dtype
        # fast path consumes FRESH samples only (frame_shift, no
        # 320-sample overlap); all other paths take full overlapped frames
        self.chunk_samples = (cfg.frame_shift
                              if path in ("fast", "fast_hybrid")
                              else cfg.frame_samples)
        self.params = jax.device_put(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params))
        staged = slots == "staged"
        # staged fast/kv paths: the merge cadence moves HOST-side (two
        # jitted variants) — the in-graph lax.cond merge holds a
        # cache-sized temporary (a cond branch cannot write the carried
        # cache in place), which binds serving capacity at large B
        # (see incremental._kv_core `merge`)
        self._host_merge = staged and path in ("fast", "kv")
        self._tick = 0
        self._resync_every = 0
        step_merge_fn = None
        step_resync_fn = None
        if path == "fast":
            self.state = incremental.init_fast_state(cfg, capacity, dtype,
                                                     quant_cache, staged,
                                                     conv_impl)

            def mk_fast(merge):
                return lambda p, st, ch, act: incremental.fast_step(
                    p, st, ch, cfg, act, slots=slots,
                    attend_impl=attend_impl, conv_impl=conv_impl,
                    conv_chunks=conv_chunks, merge=merge)

            step_fn = mk_fast("never" if self._host_merge else "auto")
            if self._host_merge:
                step_merge_fn = mk_fast("force")
        elif path == "fast_hybrid":
            n = resync_every if resync_every is not None \
                else cfg.context_frames
            self._resync_every = n
            self.state = incremental.init_fast_hybrid_state(
                cfg, capacity, dtype, quant_cache, staged)

            def mk_fh(rm, mg):
                return lambda p, st, ch, act: incremental.fast_hybrid_step(
                    p, st, ch, cfg, act, n, attend_impl,
                    resync_mode=rm, merge=mg)

            step_fn = mk_fh("never", "never" if staged else "auto")
            if staged:
                step_merge_fn = mk_fh("never", "force")
            step_resync_fn = mk_fh("force", "never")
        elif path == "hybrid":
            n = resync_every if resync_every is not None \
                else cfg.context_frames
            self._resync_every = n
            self.state = incremental.init_hybrid_state(cfg, capacity, dtype,
                                                       quant_cache, staged)

            def mk_h(rm, mg):
                return lambda p, st, ch, act: incremental.hybrid_step(
                    p, st, ch, cfg, act, n, resync_mode=rm, merge=mg)

            step_fn = mk_h("never", "never" if staged else "auto")
            if staged:
                step_merge_fn = mk_h("never", "force")
            step_resync_fn = mk_h("force", "never")
        elif path == "kv":
            self.state = incremental.init_kv_state(cfg, capacity, dtype,
                                                   quant_cache, staged)
            # "staged" slots (default): per-stream ring semantics (a
            # stream's context is exactly its last T own frames no
            # matter how arena ticks interleave — the isolation
            # contract) at global-slot write cost via the frame-major
            # stage.  "global" shortens a d-duty-cycle stream's context
            # to ~d*T after wrap; "stream" is the per-frame scatter.

            def mk_kv(merge):
                return lambda p, st, ch, act: incremental.kv_step(
                    p, st, ch, cfg, act, slots=slots, merge=merge)

            step_fn = mk_kv("never" if self._host_merge else "auto")
            if self._host_merge:
                step_merge_fn = mk_kv("force")
        else:
            step_fn = lambda p, st, ch, act: streaming.stream_step(
                p, st, ch, cfg, act)
            self.state = streaming.init_stream_state(cfg, capacity, dtype)
        def make_cast(raw_fn):
            def step_cast(p, st, ch, act):
                # chunks arrive float32 or raw int16; cast/normalize on
                # device (free: fuses into the first conv)
                x = ch.astype(dtype)
                if ch.dtype == jnp.int16:
                    x = x * jnp.asarray(1.0 / 32768.0, dtype)
                return raw_fn(p, st, x, act)
            return step_cast

        cs = jax.ShapeDtypeStruct((capacity, 2, self.chunk_samples),
                                  jnp.dtype(wire_dtype))
        ap = jax.ShapeDtypeStruct((capacity,), jnp.bool_)
        self._step = jit_pinned(make_cast(step_fn), self.params,
                                self.state, cs, ap, donate_argnums=(1,))
        self._step_merge = (jit_pinned(make_cast(step_merge_fn),
                                       self.params, self.state, cs, ap,
                                       donate_argnums=(1,))
                            if step_merge_fn is not None else None)
        self._step_resync = (jit_pinned(make_cast(step_resync_fn),
                                        self.params, self.state, cs, ap,
                                        donate_argnums=(1,))
                             if step_resync_fn is not None else None)
        self._reset = jit_pinned(
            _reset_slot, self.state,
            jax.ShapeDtypeStruct((capacity,), jnp.bool_),
            donate_argnums=(0,))
        self._free: List[int] = list(range(capacity))
        self._active: Dict[int, bool] = {}
        self._lock = threading.Lock()
        self._zero = np.zeros((capacity, 2, self.chunk_samples),
                              wire_dtype)

    # --- lifecycle ---------------------------------------------------------

    @property
    def n_active(self) -> int:
        return len(self._active)

    def add_stream(self) -> Optional[int]:
        """Claim a slot; returns its id or None when full."""
        with self._lock:
            if not self._free:
                return None
            slot = self._free.pop()
            self._active[slot] = True
        self.reset_slot(slot)
        return slot

    def remove_stream(self, slot: int) -> None:
        with self._lock:
            if self._active.pop(slot, None) is not None:
                self._free.append(slot)

    def reset_slot(self, slot: int) -> None:
        """Reset a slot's stream state WITHOUT touching the free list —
        for external slot managers (native ingest engine) that own the
        slot lifecycle themselves."""
        self.reset_slots([slot])

    def reset_slots(self, slots) -> None:
        """Reset MANY slots in one fixed-shape jitted call (per-slot
        calls cost one device round trip each; a connection ramp can
        carry thousands per tick)."""
        mask = np.zeros((self.capacity,), bool)
        mask[list(slots)] = True
        self.state = self._reset(self.state, jnp.asarray(mask))

    # --- stepping ----------------------------------------------------------

    def warmup(self) -> None:
        # All-frozen step: compiles + warms.  Frozen ticks touch no
        # stream's cache rows in either slot policy ("stream" drops the
        # scatter; "global" blends frozen rows through unchanged), so this
        # is safe at any point in the arena's life, not just startup.
        st, out = self._dispatch_step()(self.params, self.state,
                                        jnp.asarray(self._zero),
                                        jnp.zeros((self.capacity,), bool))
        # the state arg is DONATED: keep the (semantically identical)
        # result, the input buffer is gone
        self.state = st
        jax.block_until_ready(out)
        # compile + warm the merge-/resync-tick variants too (a frozen
        # empty-stage merge drops every scatter row; a frozen resync
        # rewrites only stamp-invalid rows — both state-neutral), so no
        # compile stall lands mid-serving on the first cadence tick
        for fn in (self._step_merge, self._step_resync):
            if fn is None:
                continue
            st, out = fn(self.params, self.state,
                         jnp.asarray(self._zero),
                         jnp.zeros((self.capacity,), bool))
            self._tick += 1
            self.state = st
            jax.block_until_ready(out)

    def _dispatch_step(self):
        """The jitted step for THIS tick, advancing the host mirror of
        the device step counter: the staged-merge cadence
        ((g+1) % STAGE_S == 0) and the hybrid resync cadence
        ((g+1) % resync_every == 0) are decided HERE so the merge
        scatter / resync rewrite run in cond-free jits whose donated
        cache aliases in place (see __init__).  Resync supersedes merge
        (the resync rewrite invalidates the stage)."""
        g = self._tick
        self._tick += 1
        if (self._step_resync is not None
                and (g + 1) % self._resync_every == 0):
            return self._step_resync
        if (self._step_merge is not None
                and (g + 1) % incremental.STAGE_S == 0):
            return self._step_merge
        return self._step

    def step(self, chunks: Dict[int, np.ndarray]) -> Dict[int, Dict]:
        """chunks: {slot: (2, chunk_samples)} for streams with a fresh
        frame this tick (chunk_samples = frame_shift on the fast path,
        frame_samples elsewhere); all other slots are FROZEN (state
        untouched).

        With the default ``slots="staged"`` policy (and its unamortized
        twin ``"stream"``) a stream's results depend ONLY on its own
        frame sequence — never on tick/packet interleaving across
        streams, including after the KV ring wraps.  (With
        ``slots="global"`` the guarantee weakens after wrap: a stream
        active on a fraction d of ticks keeps ~d*T of its own context —
        rows go invalid, outputs stay well-formed.)

        Returns {slot: {output_name: np.ndarray}} for the slots in
        `chunks`.
        """
        out = self.step_device(chunks)
        # ONE batched device_get (np.asarray per key costs one host
        # round trip EACH — 5x the latency through a remote device link)
        out_np = jax.device_get(out)
        return {slot: {k: v[slot] for k, v in out_np.items()}
                for slot in chunks}

    def step_device(self, chunks: Dict[int, np.ndarray]):
        """Dispatch one tick and return the DEVICE output dict without
        reading it back — callers that pipeline ticks (server_native)
        fetch the previous tick's results while this one runs, hiding
        the host<->device round trips behind compute."""
        batch = self._zero.copy()
        act = np.zeros((self.capacity,), bool)
        for slot, chunk in chunks.items():
            batch[slot] = chunk
            act[slot] = True
        self.state, out = self._dispatch_step()(self.params, self.state,
                                                jnp.asarray(batch),
                                                jnp.asarray(act))
        return out

    def step_device_batch(self, frames: np.ndarray, slots: np.ndarray):
        """`step_device` for callers that already hold the FULL
        (capacity, 2, chunk_samples) slot-major frame array (the native
        ingest poll buffer): no capacity-sized zero copy, no per-slot
        Python loop (~25 ms/tick at 8192 streams).  Rows not in `slots`
        may hold stale audio — they are masked by the active flag, so
        no stream state reads them."""
        act = np.zeros((self.capacity,), bool)
        act[slots] = True
        self.state, out = self._dispatch_step()(self.params, self.state,
                                                jnp.asarray(frames),
                                                jnp.asarray(act))
        return out
