"""Export the static VAP step to a serialized StableHLO artifact.

Reference analogue: tools/export_vap_onnx.py (ONNX dynamic + static
99-frame exports) and the browser latency harnesses
(tools/vap_offline_onnxweb.html / vap_offline_tfjs.html).

Produces:
- <out>.stablehlo : serialized jax.export artifact (portable; reload with
  jax.export.deserialize and call on any JAX backend / PJRT plugin)
- <out>.npz       : params pytree checkpoint
- optional --benchmark: reloads the artifact and reports per-inference
  latency over N runs on zero inputs — the analogue of the reference's
  in-browser 10-run benchmark.

Run: python tools/export_static.py --checkpoint_npz w.npz --out vap20hz \
        [--synthetic_weights] [--frame_hz 20] [--benchmark]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vap_realtime_tpu.config import VapConfig  # noqa: E402
from vap_realtime_tpu.runtime.static import make_static_fn  # noqa: E402
from vap_realtime_tpu.weights.convert import (  # noqa: E402
    load_pytree_npz, save_pytree_npz,
)


def export_artifact(params, cfg: VapConfig, context_frames: int = 99,
                    dynamic: bool = False):
    """Static-shape export by default; `dynamic=True` exports with a
    SYMBOLIC context length (the reference also ships a dynamic-axes
    ONNX export; tools/export_vap_onnx.py:45-60)."""
    from jax import export as jexport

    fn, example = make_static_fn(cfg, context_frames)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    if dynamic:
        T = jexport.symbolic_shape("T")[0]
        D, S = cfg.dim, cfg.frame_samples
        args = (
            jax.ShapeDtypeStruct((1, S), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
            jax.ShapeDtypeStruct((1, T, D), jnp.float32),
            jax.ShapeDtypeStruct((1, T, D), jnp.float32),
            jax.ShapeDtypeStruct((2, D), jnp.float32),
            jax.ShapeDtypeStruct((2, D), jnp.float32),
        )
        exported = jexport.export(jax.jit(fn))(params, *args)
    else:
        exported = jexport.export(jax.jit(fn))(params, *example)
    return exported, example


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vap_model", default=None)
    ap.add_argument("--cpc_model", default=None)
    ap.add_argument("--checkpoint_npz", default=None)
    ap.add_argument("--synthetic_weights", action="store_true")
    ap.add_argument("--frame_hz", type=int, default=20)
    ap.add_argument("--context_len_sec", type=float, default=2.5)
    ap.add_argument("--context_frames", type=int, default=99,
                    help="static context length (reference export: 99)")
    ap.add_argument("--dynamic", action="store_true",
                    help="export with a symbolic context length")
    ap.add_argument("--out", default="vap_static")
    ap.add_argument("--benchmark", action="store_true")
    ap.add_argument("--bench_runs", type=int, default=10)
    args = ap.parse_args(argv)

    cfg = VapConfig(frame_hz=args.frame_hz,
                    context_len_sec=args.context_len_sec)
    if args.synthetic_weights:
        from vap_realtime_tpu.weights.synthetic import synthetic_params
        params = synthetic_params(cfg.frame_hz)
    elif args.checkpoint_npz:
        params = load_pytree_npz(args.checkpoint_npz)
    elif args.vap_model and args.cpc_model:
        from vap_realtime_tpu.weights.convert import load_torch_checkpoint
        params = load_torch_checkpoint(args.vap_model, args.cpc_model)
    else:
        ap.error("need weights (--checkpoint_npz / --vap_model+--cpc_model"
                 " / --synthetic_weights)")

    exported, example = export_artifact(params, cfg, args.context_frames,
                                        dynamic=args.dynamic)
    blob = exported.serialize()
    with open(args.out + ".stablehlo", "wb") as f:
        f.write(blob)
    save_pytree_npz(args.out + ".npz", params)
    print(f"wrote {args.out}.stablehlo ({len(blob)} bytes) and "
          f"{args.out}.npz")

    if args.benchmark:
        from jax import export as jexport

        reloaded = jexport.deserialize(blob)
        params_dev = jax.tree_util.tree_map(jnp.asarray, params)
        call = jax.jit(reloaded.call)
        out = call(params_dev, *example)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.bench_runs):
            out = call(params_dev, *example)
        np.asarray(out[0])  # force readback sync
        dt = (time.perf_counter() - t0) / args.bench_runs
        print(f"latency: {dt * 1e3:.2f} ms/inference "
              f"({args.bench_runs} runs, zero inputs, "
              f"ctx={args.context_frames})")


if __name__ == "__main__":
    main()
