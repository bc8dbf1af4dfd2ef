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


def _reset_slot(state, idx: jax.Array):
    """Zero one slot's recurrent state + validity counter (jit-friendly)."""
    if isinstance(state, incremental.FastHybridState):
        rows = jnp.stack([2 * idx, 2 * idx + 1])
        return incremental.FastHybridState(
            kv=_reset_slot(state.kv, idx),
            conv={k: v.at[rows].set(0.0) for k, v in state.conv.items()},
            e_ctx=state.e_ctx,  # masked by count (right-aligned validity)
        )
    if isinstance(state, incremental.FastState):
        # conv tails are stored per CHANNEL-stream (B*2 leading axis):
        # slot idx owns rows 2*idx and 2*idx+1
        rows = jnp.stack([2 * idx, 2 * idx + 1])
        return incremental.FastState(
            kv=_reset_slot(state.kv, idx),
            conv={k: v.at[rows].set(0.0) for k, v in state.conv.items()},
        )
    if isinstance(state, incremental.HybridState):
        return incremental.HybridState(
            kv=_reset_slot(state.kv, idx),
            e_ctx=state.e_ctx,  # masked by count (right-aligned validity)
        )
    if isinstance(state, incremental.KVState):
        return incremental.KVState(
            cache=state.cache,  # stale rows masked by stamp
            scale=state.scale,  # ditto (scales only read for live rows)
            lstm_h=state.lstm_h.at[idx].set(0.0),
            lstm_c=state.lstm_c.at[idx].set(0.0),
            count=state.count.at[idx].set(0),
            stamp=state.stamp.at[idx].set(-1),
            step=state.step,
            stage=state.stage,  # stale staged rows masked by stage_stamp
            stage_stamp=(state.stage_stamp.at[:, idx].set(-1)
                         if state.stage_stamp.ndim == 2
                         else state.stage_stamp),
            stage_scale=state.stage_scale,
        )
    return streaming.StreamState(
        lstm_h=state.lstm_h.at[idx].set(0.0),
        lstm_c=state.lstm_c.at[idx].set(0.0),
        e_ctx=state.e_ctx,  # masked by count (right-aligned validity)
        count=state.count.at[idx].set(0),
    )


class StreamArena:
    """Fixed-capacity batched streaming engine with slot lifecycle."""

    def __init__(self, cfg: VapConfig, params, capacity: int = 64,
                 path: str = "kv", dtype=jnp.float32, slots: str = "staged",
                 resync_every: Optional[int] = None,
                 attend_impl: str = "einsum", quant_cache: bool = False):
        self.cfg = cfg
        self.capacity = capacity
        self.path = path
        # fast path consumes FRESH samples only (frame_shift, no
        # 320-sample overlap); all other paths take full overlapped frames
        self.chunk_samples = (cfg.frame_shift
                              if path in ("fast", "fast_hybrid")
                              else cfg.frame_samples)
        self.params = jax.device_put(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params))
        staged = slots == "staged"
        if path == "fast":
            self.state = incremental.init_fast_state(cfg, capacity, dtype,
                                                     quant_cache, staged)
            step_fn = lambda p, st, ch, c, act: incremental.fast_step(
                p, st, ch, c, act, slots=slots, attend_impl=attend_impl)
            self._step = jax.jit(step_fn, static_argnums=3)
        elif path == "fast_hybrid":
            n = resync_every if resync_every is not None \
                else cfg.context_frames
            self.state = incremental.init_fast_hybrid_state(
                cfg, capacity, dtype, quant_cache)
            step_fn = lambda p, st, ch, c, act: \
                incremental.fast_hybrid_step(p, st, ch, c, act, n,
                                             attend_impl)
            self._step = jax.jit(step_fn, static_argnums=3)
        elif path == "hybrid":
            n = resync_every if resync_every is not None \
                else cfg.context_frames
            self.state = incremental.init_hybrid_state(cfg, capacity, dtype,
                                                       quant_cache)
            step_fn = lambda p, st, ch, c, act: incremental.hybrid_step(
                p, st, ch, c, act, n)
            self._step = jax.jit(step_fn, static_argnums=3)
        elif path == "kv":
            self.state = incremental.init_kv_state(cfg, capacity, dtype,
                                                   quant_cache, staged)
            # "stream" slots (default): per-stream ring positions make a
            # stream's context exactly its last T own frames no matter how
            # arena ticks interleave — required for the isolation contract
            # under real (jittery) traffic.  "global" is cheaper but
            # shortens a d-duty-cycle stream's context to ~d*T after wrap.
            step_fn = lambda p, st, ch, c, act: incremental.kv_step(
                p, st, ch, c, act, slots=slots)
            self._step = jax.jit(step_fn, static_argnums=3)
        else:
            self.state = streaming.init_stream_state(cfg, capacity, dtype)
            self._step = jax.jit(streaming.stream_step, static_argnums=3)
        self._reset = jax.jit(_reset_slot)
        self._free: List[int] = list(range(capacity))
        self._active: Dict[int, bool] = {}
        self._lock = threading.Lock()
        self._zero = np.zeros((capacity, 2, self.chunk_samples), np.float32)

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
        self.state = self._reset(self.state, jnp.asarray(slot))
        return slot

    def remove_stream(self, slot: int) -> None:
        with self._lock:
            if self._active.pop(slot, None) is not None:
                self._free.append(slot)

    def reset_slot(self, slot: int) -> None:
        """Reset a slot's stream state WITHOUT touching the free list —
        for external slot managers (native ingest engine) that own the
        slot lifecycle themselves."""
        self.state = self._reset(self.state, jnp.asarray(slot))

    # --- stepping ----------------------------------------------------------

    def warmup(self) -> None:
        # All-frozen step: compiles + warms.  Frozen ticks touch no
        # stream's cache rows in either slot policy ("stream" drops the
        # scatter; "global" blends frozen rows through unchanged), so this
        # is safe at any point in the arena's life, not just startup.
        st, out = self._step(self.params, self.state,
                             jnp.asarray(self._zero), self.cfg,
                             jnp.zeros((self.capacity,), bool))
        jax.block_until_ready(out)

    def step(self, chunks: Dict[int, np.ndarray]) -> Dict[int, Dict]:
        """chunks: {slot: (2, chunk_samples)} for streams with a fresh
        frame this tick (chunk_samples = frame_shift on the fast path,
        frame_samples elsewhere); all other slots are FROZEN (state
        untouched).

        With the default ``slots="stream"`` policy a stream's results
        depend ONLY on its own frame sequence — never on tick/packet
        interleaving across streams, including after the KV ring wraps.
        (With ``slots="global"`` the guarantee weakens after wrap: a
        stream active on a fraction d of ticks keeps ~d*T of its own
        context — rows go invalid, outputs stay well-formed.)

        Returns {slot: {output_name: np.ndarray}} for the slots in
        `chunks`.
        """
        batch = self._zero.copy()
        act = np.zeros((self.capacity,), bool)
        for slot, chunk in chunks.items():
            batch[slot] = chunk
            act[slot] = True
        self.state, out = self._step(self.params, self.state,
                                     jnp.asarray(batch), self.cfg,
                                     jnp.asarray(act))
        out_np = {k: np.asarray(v) for k, v in out.items()}
        return {slot: {k: v[slot] for k, v in out_np.items()}
                for slot in chunks}
