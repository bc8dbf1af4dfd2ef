"""Export weights + self-test fixture for the in-browser VAP runner.

Reference analogue: tools/vap_offline_onnxweb.html / vap_offline_tfjs.html
(in-browser static-graph inference + 10-run latency benchmark).  Those
rely on CDN-hosted onnxruntime-web / tf.js; this exporter instead feeds
`clients/web_runner/` — a dependency-free JavaScript implementation of
the static step (runtime/static.py) — with:

- weights.bin   little-endian float32, all params concatenated
- manifest.json {params: {dotted.name: {offset, shape}}, cfg: {...},
                 selftest: {x1, x2, expected p_now/p_future/vad, atol}}

The self-test fixture is computed with the JAX static step on a seeded
input, so opening index.html verifies the JS implementation end-to-end
(PASS/FAIL shown in the page) before the latency benchmark runs.

Run: python tools/export_web.py --synthetic_weights --out web_artifacts
     python tools/export_web.py --checkpoint_npz w.npz --context_frames 99
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so a
# plain setdefault would silently leave us on the TPU relay — force CPU
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # host-side tool


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint_npz", default=None)
    ap.add_argument("--synthetic_weights", action="store_true")
    ap.add_argument("--frame_hz", type=int, default=20)
    ap.add_argument("--context_frames", type=int, default=99,
                    help="static context size (reference export: 99)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "vap_realtime_tpu", "clients", "web_runner", "artifacts"))
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.runtime.static import make_static_fn
    from vap_realtime_tpu.weights.convert import _flatten

    cfg = VapConfig(frame_hz=args.frame_hz)
    if args.synthetic_weights:
        from vap_realtime_tpu.weights.synthetic import synthetic_params
        params = synthetic_params(cfg.frame_hz)
    else:
        from vap_realtime_tpu.weights.convert import load_pytree_npz
        params = load_pytree_npz(args.checkpoint_npz)
    params = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32),
                                    params)

    flat = _flatten(params)
    os.makedirs(args.out, exist_ok=True)
    manifest = {"params": {}, "cfg": {
        "frame_hz": cfg.frame_hz,
        "frame_samples": cfg.frame_samples,
        "context_frames": args.context_frames,
        "dim": cfg.dim,
        "num_heads": cfg.num_heads,
        "channel_layers": cfg.channel_layers,
        "cross_layers": cfg.cross_layers,
        "downsample_kernel": cfg.downsample_kernel,
    }}
    off = 0
    with open(os.path.join(args.out, "weights.bin"), "wb") as f:
        for name in sorted(flat):
            arr = flat[name].astype("<f4")
            manifest["params"][name] = {"offset": off,
                                        "shape": list(arr.shape)}
            f.write(arr.tobytes())
            off += arr.size

    # self-test fixture: one static step on a seeded input
    fn, example = make_static_fn(cfg, args.context_frames)
    fn = jax.jit(fn)
    rs = np.random.RandomState(7)
    x1 = (rs.randn(1, cfg.frame_samples) * 0.1).astype(np.float32)
    x2 = (rs.randn(1, cfg.frame_samples) * 0.1).astype(np.float32)
    e1c = np.zeros(example[2].shape, np.float32)
    e2c = np.zeros(example[3].shape, np.float32)
    h = np.zeros(example[4].shape, np.float32)
    c = np.zeros(example[5].shape, np.float32)
    jp = jax.tree_util.tree_map(jnp.asarray, params)
    p_now, p_fut, vad1, vad2, e1, e2, hn, cn = [
        np.asarray(y) for y in fn(jp, x1, x2, e1c, e2c, h, c)]
    manifest["selftest"] = {
        "seed_note": "x1/x2 ~ 0.1*N(0,1) from the fixture below",
        "x1": x1[0].round(6).tolist(),
        "x2": x2[0].round(6).tolist(),
        "expected": {
            "p_now": p_now.tolist(),
            "p_future": p_fut.tolist(),
            "vad": [float(vad1[-1]), float(vad2[-1])],
            "e1_head": e1[0, :8].tolist(),
        },
        "atol": 2e-4,
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    print(f"wrote {args.out}/weights.bin ({off * 4} bytes) + manifest.json")


if __name__ == "__main__":
    main()
