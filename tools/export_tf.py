"""Export the static VAP step to TensorFlow SavedModel / TFLite.

Reference analogue: tools/export_vap_tflite_tfjs.py (onnx2tf +
tensorflowjs).  The JAX-native route is jax2tf -> SavedModel ->
TFLiteConverter; `--check` replays random inputs through the converted
TFLite interpreter and asserts elementwise closeness against the JAX
static step (the reference's `check_onnx_tf_outputs_elementwise_close`
contract, export_vap_tflite_tfjs.py:25).

Run: python tools/export_tf.py --synthetic_weights --tflite --check
     python tools/export_tf.py --checkpoint_npz w.npz --out vap_tf
(If tensorflow is unavailable the tool degrades with a clear error;
tools/export_static.py produces the portable StableHLO artifact.)
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
    ap.add_argument("--check", action="store_true",
                    help="elementwise-close check of the TFLite graph "
                         "vs the JAX step (atol)")
    ap.add_argument("--atol", type=float, default=1e-3,
                    help="tolerance on probability outputs (measured "
                         "r2: p_now/p_future <= 4.6e-4, vad <= 4.5e-4)")
    args = ap.parse_args(argv)

    # exports run host-side; never touch (or contend for) a TPU
    # sitecustomize pins JAX_PLATFORMS=axon at interpreter start, so a
    # plain setdefault would silently leave us on the TPU relay — force CPU
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

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

        if args.check:
            import numpy as np

            interp = tf.lite.Interpreter(model_content=blob)
            runner = interp.get_signature_runner("serving_default")
            rs = np.random.RandomState(0)
            inputs = [rs.randn(*x.shape).astype(np.float32) * 0.1
                      for x in example]
            flat_want, _ = jax.tree_util.tree_flatten(fn(params, *inputs))
            want = [np.asarray(y) for y in flat_want]
            # signature names are positional: args_tf_i / output_i
            res = runner(**{f"args_tf_{i}": v
                            for i, v in enumerate(inputs)})
            got = [res[f"output_{i}"] for i in range(len(want))]
            # outputs 0-3 are the consumed probabilities (p_now,
            # p_future, vad1, vad2) — held to --atol; 4-7 are carried
            # state (e1, e2, h, c) where TFLite's flex erf/rsqrt kernels
            # drift ~1e-2 without affecting downstream probabilities
            # (measured r2) — held to a documented looser bound.
            ok = True
            for i, (g, w) in enumerate(zip(got, want)):
                d = float(np.abs(g - w).max())
                tol = args.atol if i < 4 else 5e-2
                ok &= d <= tol
                print(f"  output[{i}] shape {g.shape}: max|diff| {d:.2e}"
                      f" (tol {tol})")
            assert ok, "TFLite outputs deviate from JAX beyond tolerance"
            print(f"close-check OK (probability atol {args.atol})")


if __name__ == "__main__":
    main()
