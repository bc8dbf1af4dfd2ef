"""VapEngine — user-facing streaming engine (the `VAPRealTime` analogue).

Wraps params + jitted step + carried state behind a simple `process()`
call.  Unlike the reference's mutable-everything class
(rvap/vap_main/vap_main.py:185-335), all state is an explicit pytree and
the compute is one jitted dispatch; the class only does host-side
bookkeeping (accumulating 10 ms hops into model frames is the caller's or
server's job, as in the reference).

Five serving paths:
- "full":   parity-exact full recompute per frame (reference semantics)
- "kv":     incremental KV-cache step (exact until the context window
            slides; see runtime/incremental.py)
- "hybrid": KV step with a full-recompute resync every `resync_every`
            frames — resync frames are parity-exact and flush the
            cached-K/V drift, bounding inter-resync deviation
- "fast":   seamless streaming conv + KV — consumes FRESH samples only
            (chunk length = frame_shift, no 320-sample overlap); the
            throughput path (bench headline).  attend_impl selects the
            attention backend ("einsum" | "grouped" | "pallas").
- "fast_hybrid": fast with a periodic trunk resync from the embedding
            ring every `resync_every` frames — resync frames are exact
            w.r.t. the full-trunk-over-fast-embeddings oracle and flush
            the cached-K/V drift (tests/test_incremental.py).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.runtime import incremental, streaming

Params = Dict[str, Any]


class VapEngine:
    CALC_PROCESS_TIME_INTERVAL = 100  # telemetry cadence (vap_main.py:190)

    def __init__(self, cfg: Optional[VapConfig] = None,
                 params: Optional[Params] = None,
                 vap_model: Optional[str] = None,
                 cpc_model: Optional[str] = None,
                 checkpoint_npz: Optional[str] = None,
                 path: str = "kv", batch: int = 1,
                 dtype=jnp.float32, resync_every: Optional[int] = None,
                 attend_impl: str = "einsum",
                 quant_cache: bool | str = False,
                 slots: Optional[str] = None, conv_impl: str = "conv",
                 conv_chunks: int = 1):
        self.cfg = cfg or VapConfig()
        self.batch = batch
        self.path = path
        self.attend_impl = attend_impl
        # quant_cache: int8 KV cache — half the HBM traffic / double the
        # capacity of bf16; applies to kv/fast/hybrid paths.
        #   True / "row": per-row dequant scales, ~2e-5 output deviation
        #   (tests/test_incremental.py) but two in-kernel dequant passes;
        #   "global": per-stream frozen scales folded OUTSIDE the attend
        #   kernels — the faster serving form (PERF.md r5)
        self.quant_cache = quant_cache
        self.resync_every = (resync_every if resync_every is not None
                             else self.cfg.context_frames)
        # KV write-slot policy (see incremental.KVState): since r4 every
        # kv-family path defaults to "staged" — exact "stream" semantics
        # (per-stream isolation) at amortized global-slot write cost
        # (frame-major stage + one S-row merge scatter per S ticks)
        if slots is None:
            # "staged" = exact per-stream isolation (same contract as
            # "stream") at global-slot cost (PERF.md r4)
            slots = "staged"
        self.slots = slots
        staged = slots == "staged"

        if params is None:
            if checkpoint_npz:
                from vap_realtime_tpu.weights.convert import load_pytree_npz
                params = load_pytree_npz(checkpoint_npz)
            elif vap_model and cpc_model:
                from vap_realtime_tpu.weights.convert import (
                    load_torch_checkpoint,
                )
                params = load_torch_checkpoint(
                    vap_model, cpc_model, self.cfg.channel_layers,
                    self.cfg.cross_layers)
            else:
                raise ValueError(
                    "provide params, checkpoint_npz, or vap_model+cpc_model")
        self.params = jax.device_put(
            jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params))

        if path == "kv":
            def _kstep(p, st, ch, c, act=None):
                return incremental.kv_step(p, st, ch, c, act, slots=slots,
                                           attend_impl=attend_impl)

            self._step = jax.jit(_kstep, static_argnums=3)
            self.state = incremental.init_kv_state(self.cfg, batch, dtype,
                                                   quant_cache, staged)
        elif path == "fast":
            def _fstep(p, st, ch, c, act=None):
                return incremental.fast_step(p, st, ch, c, act, slots=slots,
                                             attend_impl=attend_impl,
                                             conv_impl=conv_impl,
                                             conv_chunks=conv_chunks)

            self._step = jax.jit(_fstep, static_argnums=3)
            self.state = incremental.init_fast_state(self.cfg, batch, dtype,
                                                     quant_cache, staged,
                                                     conv_impl)
        elif path == "full":
            self._step = jax.jit(streaming.stream_step, static_argnums=3)
            self.state = streaming.init_stream_state(self.cfg, batch, dtype)
        elif path == "hybrid":
            n = self.resync_every

            def _hstep(p, st, ch, c, act=None):
                return incremental.hybrid_step(p, st, ch, c, act, n)

            self._step = jax.jit(_hstep, static_argnums=3)
            self.state = incremental.init_hybrid_state(self.cfg, batch,
                                                       dtype, quant_cache,
                                                       staged)
        elif path == "fast_hybrid":
            n = self.resync_every

            def _fhstep(p, st, ch, c, act=None):
                return incremental.fast_hybrid_step(p, st, ch, c, act, n,
                                                    attend_impl)

            self._step = jax.jit(_fhstep, static_argnums=3)
            self.state = incremental.init_fast_hybrid_state(
                self.cfg, batch, dtype, quant_cache, staged)
        else:
            raise ValueError(
                f"unknown path {path!r} (use 'kv', 'full', 'hybrid', "
                "'fast', or 'fast_hybrid')")

        # latest results, reference-style fields (vap_main.py:235-241)
        self.result: Dict[str, Any] = {}
        self.result_last_time = -1.0
        self.process_time_abs = -1.0
        self._proc_times: list = []
        self._last_interval_time = time.time()

    @property
    def audio_frame_size(self) -> int:
        return self.chunk_samples

    @property
    def chunk_samples(self) -> int:
        """Samples the engine consumes per frame: frame_shift (fresh
        samples only) on the fast path, frame_samples (with the
        320-sample overlap) elsewhere."""
        return (self.cfg.frame_shift
                if self.path in ("fast", "fast_hybrid")
                else self.cfg.frame_samples)

    @property
    def frame_contxt_padding(self) -> int:
        from vap_realtime_tpu.config import FRAME_CONTEXT_PADDING
        return (0 if self.path in ("fast", "fast_hybrid")
                else FRAME_CONTEXT_PADDING)

    def warmup(self) -> None:
        """Compile the step ahead of the first real frame."""
        z = jnp.zeros((self.batch, 2, self.chunk_samples), jnp.float32)
        st, out = self._step(self.params, self.state, z, self.cfg)
        jax.block_until_ready(out)

    def process_batch(self, chunk: np.ndarray) -> Dict[str, np.ndarray]:
        """chunk: (B, 2, chunk_samples) -> dict of (B, ...) numpy results."""
        chunk = np.asarray(chunk, np.float32)
        if chunk.shape != (self.batch, 2, self.chunk_samples):
            raise ValueError(
                f"expected chunk shape {(self.batch, 2, self.chunk_samples)}"
                f" (batch, channels, samples), got {chunk.shape}")
        t0 = time.time()
        self.state, out = self._step(self.params, self.state,
                                     jnp.asarray(chunk), self.cfg)
        out = {k: np.asarray(v) for k, v in out.items()}
        self.result = out
        self.result_last_time = time.time()
        self._telemetry(time.time() - t0)
        self.process_time_abs = time.time()
        return out

    def process(self, x1: np.ndarray, x2: np.ndarray) -> Dict[str, Any]:
        """Single-stream convenience (batch must be 1): the reference
        `process_vap(x1, x2)` signature (vap_main.py:249)."""
        assert self.batch == 1, "use process_batch for batched engines"
        chunk = np.stack([np.asarray(x1, np.float32),
                          np.asarray(x2, np.float32)])[None]
        out = self.process_batch(chunk)
        return {k: v[0] for k, v in out.items()}

    def _telemetry(self, dt: float) -> None:
        self._proc_times.append(dt)
        if len(self._proc_times) > self.CALC_PROCESS_TIME_INTERVAL:
            avg = float(np.mean(self._proc_times))
            rate = len(self._proc_times) / (time.time()
                                            - self._last_interval_time)
            self._last_interval_time = time.time()
            print(f"[VAP] Average processing time: {avg:.5f} [sec], "
                  f"#process/sec: {rate:.3f}")
            self._proc_times = []
