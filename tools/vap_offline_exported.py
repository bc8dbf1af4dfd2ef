"""Offline runner driving an EXPORTED StableHLO artifact.

Reference analogue: tools/vap_offline_onnx.py — runs the static-context
exported graph with externally-managed state (zero-initialized context
deque) and writes the same CSV as the normal offline runner.  This
validates that the exported artifact reproduces the framework outputs —
the parity role the reference's onnx2tf elementwise-close check plays.

Run: python tools/vap_offline_exported.py --artifact vap20.stablehlo \
        --params vap20.npz --input_wav_left l.wav --input_wav_right r.wav
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", required=True, help=".stablehlo file")
    ap.add_argument("--params", required=True, help=".npz params")
    ap.add_argument("--input_wav_left", required=True)
    ap.add_argument("--input_wav_right", required=True)
    ap.add_argument("--filename_output", default="output_offline_exported.txt")
    ap.add_argument("--vap_process_rate", type=int, default=20)
    args = ap.parse_args(argv)

    from jax import export as jexport

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.io.audio import read_wav
    from vap_realtime_tpu.runtime.streaming import frame_audio
    from vap_realtime_tpu.weights.convert import load_pytree_npz

    cfg = VapConfig(frame_hz=args.vap_process_rate)
    with open(args.artifact, "rb") as f:
        exported = jexport.deserialize(f.read())
    params = jax.tree_util.tree_map(jnp.asarray,
                                    load_pytree_npz(args.params))
    call = jax.jit(exported.call)

    left, _ = read_wav(args.input_wav_left)
    right, _ = read_wav(args.input_wav_right)
    if left.ndim > 1:
        left = left[:, 0]
    if right.ndim > 1:
        right = right[:, 0]
    n = min(len(left), len(right))
    audio = np.stack([left[:n], right[:n]])
    frames = frame_audio(audio, cfg)

    # derive the artifact's static context length from its input avals
    # (the flat avals list starts with the params pytree leaves; the
    # context inputs are the (1, T, D) 3-D avals near the end)
    ctx_aval = next(a for a in reversed(exported.in_avals)
                    if len(a.shape) == 3 and a.shape[0] == 1)
    T_ctx, D = ctx_aval.shape[1], ctx_aval.shape[2]
    ctx1 = jnp.zeros((1, T_ctx, D))
    ctx2 = jnp.zeros((1, T_ctx, D))
    h = jnp.zeros((2, D))
    c = jnp.zeros((2, D))

    rows = []
    for f_i in range(frames.shape[0]):
        t = (f_i * cfg.frame_shift + cfg.frame_samples) / cfg.sample_rate
        (p_now, p_fut, _v1, _v2, e1, e2, h, c) = call(
            params, jnp.asarray(frames[f_i, 0:1]),
            jnp.asarray(frames[f_i, 1:2]), ctx1, ctx2, h, c)
        ctx1 = jnp.concatenate([ctx1, e1[None]], axis=1)[:, 1:]
        ctx2 = jnp.concatenate([ctx2, e2[None]], axis=1)[:, 1:]
        p_now = np.asarray(p_now)
        p_fut = np.asarray(p_fut)
        rows.append((t, p_now[0], p_now[1], p_fut[0], p_fut[1]))

    with open(args.filename_output, "w") as f:
        f.write("time_sec,p_now(0=left),p_now(1=right),"
                "p_future(0=left),p_future(1=right)\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print(f"Generated output file: {args.filename_output} ({len(rows)})")


if __name__ == "__main__":
    main()
