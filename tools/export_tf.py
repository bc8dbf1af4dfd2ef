"""Export the static VAP step to TensorFlow SavedModel / TFLite.

Reference analogue: tools/export_vap_tflite_tfjs.py (onnx2tf +
tensorflowjs).  The JAX-native route is jax2tf -> SavedModel ->
TFLiteConverter.  TensorFlow is NOT part of this image's baked deps, so
this tool degrades with a clear error; on a machine with tf installed it
produces the artifacts.

Run: python tools/export_tf.py --checkpoint_npz w.npz --out vap_tf
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint_npz", default=None)
    ap.add_argument("--synthetic_weights", action="store_true")
    ap.add_argument("--frame_hz", type=int, default=20)
    ap.add_argument("--context_frames", type=int, default=99)
    ap.add_argument("--out", default="vap_tf")
    ap.add_argument("--tflite", action="store_true")
    args = ap.parse_args(argv)

    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:
        raise SystemExit(
            f"TensorFlow export requires tensorflow + jax2tf ({e}). "
            "Use tools/export_static.py for the portable StableHLO "
            "artifact instead.")

    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.runtime.static import make_static_fn

    cfg = VapConfig(frame_hz=args.frame_hz)
    if args.synthetic_weights:
        from vap_realtime_tpu.weights.synthetic import synthetic_params
        params = synthetic_params(cfg.frame_hz)
    else:
        from vap_realtime_tpu.weights.convert import load_pytree_npz
        params = load_pytree_npz(args.checkpoint_npz)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    fn, example = make_static_fn(cfg, args.context_frames)
    tf_fn = tf.function(
        jax2tf.convert(lambda *a: fn(params, *a), with_gradient=False),
        input_signature=[tf.TensorSpec(x.shape, tf.float32)
                         for x in example],
        autograph=False)
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, args.out)
    print(f"wrote SavedModel to {args.out}/")

    if args.tflite:
        conv = tf.lite.TFLiteConverter.from_concrete_functions(
            [tf_fn.get_concrete_function()], module)
        conv.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
        blob = conv.convert()
        with open(args.out + ".tflite", "wb") as f:
            f.write(blob)
        print(f"wrote {args.out}.tflite ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
