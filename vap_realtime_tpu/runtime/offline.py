"""Offline batch runner — the `vap_offline.py` analogue (CSV output).

Slides a frame-size window with shift = frame - 320 over two WAVs and
writes `time_sec,p_now(0=left),p_now(1=right),p_future(0=left),
p_future(1=right)` rows, byte-format-compatible with the reference output
(rvap/vap_main/vap_offline.py:39-88, golden file output_offline.txt).

Unlike the reference (one Python-loop forward per frame), all frames are
pre-windowed and run through ONE jitted `lax.scan` — the whole file is a
single device dispatch.

Run: python -m vap_realtime_tpu.runtime.offline \
        --input_wav_left a.wav --input_wav_right b.wav \
        --checkpoint_npz weights.npz --vap_process_rate 20 \
        --context_len_sec 2.5 --filename_output out.csv
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.io.audio import read_wav
from vap_realtime_tpu.runtime import incremental, streaming


def run_offline(params, audio: np.ndarray, cfg: VapConfig,
                path: str = "full", attend_impl: str = "einsum",
                quant_cache: bool = False) -> Dict[str, np.ndarray]:
    """audio: (2, N) float32 -> dict of per-frame outputs + timestamps."""
    if path in ("fast", "fast_hybrid"):
        # fast paths consume disjoint fresh-sample chunks; frame k
        # summarizes audio ending at (k+1)*frame_shift (no 320-sample
        # look-ahead — documented fast-path alignment)
        shift = cfg.frame_shift
        F = audio.shape[-1] // shift
        frames = np.stack([audio[..., i * shift:(i + 1) * shift]
                           for i in range(F)])[:, None]   # (F, 1, 2, S')
        if path == "fast_hybrid":
            state = incremental.init_fast_hybrid_state(cfg, 1,
                                                       quant=quant_cache)
            run = jax.jit(
                lambda p, st, fr, c: incremental.run_frames_fast_hybrid(
                    p, st, fr, c, c.context_frames), static_argnums=3)
        else:
            state = incremental.init_fast_state(cfg, 1, quant=quant_cache)
            run = jax.jit(
                lambda p, st, fr, c: incremental.run_frames_fast(
                    p, st, fr, c, attend_impl=attend_impl), static_argnums=3)
        _, outs = run(params, state, jnp.asarray(frames), cfg)
        outs = {k: np.asarray(v[:, 0]) for k, v in outs.items()}
        outs["t"] = (np.arange(F) + 1) * shift / cfg.sample_rate
        return outs
    frames = streaming.frame_audio(audio, cfg)[:, None]  # (F, 1, 2, S)
    if path == "kv":
        state = incremental.init_kv_state(cfg, 1, quant=quant_cache)
        run = jax.jit(incremental.run_frames_kv, static_argnums=3)
    elif path == "hybrid":
        state = incremental.init_hybrid_state(cfg, 1, quant=quant_cache)
        run = jax.jit(
            lambda p, st, fr, c: incremental.run_frames_hybrid(
                p, st, fr, c, c.context_frames), static_argnums=3)
    else:
        state = streaming.init_stream_state(cfg, 1)
        run = jax.jit(streaming.run_frames, static_argnums=3)
    _, outs = run(params, state, jnp.asarray(frames), cfg)
    outs = {k: np.asarray(v[:, 0]) for k, v in outs.items()}
    F = frames.shape[0]
    outs["t"] = (np.arange(F) * cfg.frame_shift
                 + cfg.frame_samples) / cfg.sample_rate
    return outs


def write_csv(path: str, outs: Dict[str, np.ndarray]) -> None:
    with open(path, "w") as f:
        f.write("time_sec,p_now(0=left),p_now(1=right),"
                "p_future(0=left),p_future(1=right)\n")
        for i in range(len(outs["t"])):
            f.write(f"{outs['t'][i]},{outs['p_now'][i, 0]},"
                    f"{outs['p_now'][i, 1]},{outs['p_future'][i, 0]},"
                    f"{outs['p_future'][i, 1]}\n")


def main(argv: Optional[list] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vap_model", type=str, default=None,
                    help="reference-format torch state_dict (.pt)")
    ap.add_argument("--cpc_model", type=str, default=None)
    ap.add_argument("--checkpoint_npz", type=str, default=None,
                    help="framework-native npz pytree checkpoint")
    ap.add_argument("--synthetic_weights", action="store_true",
                    help="deterministic test weights (no checkpoint needed)")
    ap.add_argument("--filename_output", type=str,
                    default="output_offline.txt")
    ap.add_argument("--input_wav_left", type=str, required=True)
    ap.add_argument("--input_wav_right", type=str, required=True)
    ap.add_argument("--vap_process_rate", type=int, default=20)
    ap.add_argument("--context_len_sec", type=float, default=2.5)
    ap.add_argument("--engine_path",
                    choices=["full", "kv", "hybrid", "fast", "fast_hybrid"],
                    default="full",
                    help="'full' = parity-exact recompute, 'kv' = "
                         "incremental KV cache, 'fast' = streaming conv "
                         "+ KV (throughput path)")
    ap.add_argument("--quant_cache", nargs="?", const=True,
                    default=False, choices=[True, "row", "global"],
                    help="int8 KV cache (half HBM traffic, 2x stream "
                         "capacity): bare/'row' = per-row dequant "
                         "scales (~2e-5 deviation); 'global' = frozen "
                         "per-stream scales folded outside the attend "
                         "kernels (the fast int8 form, PERF.md r5)")
    ap.add_argument("--attend_impl",
                    choices=["einsum", "grouped", "pallas", "pallas3"],
                    default="einsum")
    args = ap.parse_args(argv)

    cfg = VapConfig(frame_hz=args.vap_process_rate,
                    context_len_sec=args.context_len_sec)

    if args.synthetic_weights:
        from vap_realtime_tpu.weights.synthetic import synthetic_params
        params = synthetic_params(cfg.frame_hz)
    elif args.checkpoint_npz:
        from vap_realtime_tpu.weights.convert import load_pytree_npz
        params = load_pytree_npz(args.checkpoint_npz)
    elif args.vap_model and args.cpc_model:
        from vap_realtime_tpu.weights.convert import load_torch_checkpoint
        params = load_torch_checkpoint(args.vap_model, args.cpc_model)
    else:
        ap.error("need --checkpoint_npz, --vap_model+--cpc_model, "
                 "or --synthetic_weights")

    left, sr_l = read_wav(args.input_wav_left)
    right, sr_r = read_wav(args.input_wav_right)
    if sr_l != cfg.sample_rate or sr_r != cfg.sample_rate:
        raise SystemExit(f"expected {cfg.sample_rate} Hz WAVs, "
                         f"got {sr_l}/{sr_r}")
    if left.ndim > 1:
        left = left[:, 0]
    if right.ndim > 1:
        right = right[:, 0]
    n = min(len(left), len(right))
    audio = np.stack([left[:n], right[:n]])

    params = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, params))
    outs = run_offline(params, audio, cfg, args.engine_path,
                       quant_cache=args.quant_cache,
                       attend_impl=args.attend_impl)
    write_csv(args.filename_output, outs)
    print(f"Generated output file: {args.filename_output} "
          f"({len(outs['t'])} frames)")


if __name__ == "__main__":
    main()
