"""Per-stream HBM state budget: where capacity (not compute) caps
streams/chip (VERDICT r2 item 9).

Walks the actual serving-state pytrees (no hand arithmetic) and prints
bytes/stream per path/dtype plus the stream capacity of a 16 GB v5e
chip after params + a workspace reserve.  Pure host-side computation
(shapes only — nothing is allocated on a device).

Run: python tools/hbm_budget.py [--markdown]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize pins JAX_PLATFORMS=axon before we run — force CPU
# (shape-only tool; must never touch or contend for the TPU relay)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

HBM_BYTES = 16 * 1024**3           # v5e: 16 GB HBM per chip
WORKSPACE_FRACTION = 0.10          # XLA scratch/activations reserve


def state_bytes(state, batch: int) -> int:
    import jax

    leaves = jax.tree_util.tree_leaves(state)
    total = 0
    for leaf in leaves:
        n = 1
        for d in leaf.shape:
            n *= d
        total += n * leaf.dtype.itemsize
    # `step` & co are O(1) scalars; everything else scales with batch
    return total // batch


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.runtime import incremental, streaming
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    B = 8  # probe batch (per-stream bytes are batch-invariant)

    params = jax.tree_util.tree_map(jnp.asarray, synthetic_params(20))
    params_bytes = sum(
        int(np.prod(p.shape)) * 2  # bf16 serving params
        for p in jax.tree_util.tree_leaves(params)
        for np in [__import__("numpy")])

    rows = []
    with jax.ensure_compile_time_eval():
        for path, init in [
            ("full", streaming.init_stream_state),
            ("kv", incremental.init_kv_state),
            ("fast", incremental.init_fast_state),
            ("hybrid", incremental.init_hybrid_state),
            ("fast_hybrid", incremental.init_fast_hybrid_state),
        ]:
            for dtype, label in [(jnp.bfloat16, "bf16"),
                                 (jnp.float32, "f32")]:
                st = jax.eval_shape(lambda i=init, d=dtype: i(cfg, B, d))
                per = state_bytes(st, B)
                usable = HBM_BYTES * (1 - WORKSPACE_FRACTION) - params_bytes
                cap = int(usable // per)
                rows.append((path, label, per, cap))
            if path == "full":
                continue
            # int8 KV cache variants (bf16 compute state)
            for quant, label in [(True, "int8 row-scales (q8)"),
                                 ("global", "int8 frozen scales (q8g)")]:
                st = jax.eval_shape(
                    lambda i=init, q=quant: i(cfg, B, jnp.bfloat16, q))
                per = state_bytes(st, B)
                usable = HBM_BYTES * (1 - WORKSPACE_FRACTION) - params_bytes
                rows.append((path, label, per, int(usable // per)))

    hdr = ("path", "state dtype", "bytes/stream", "capacity cap @16GB v5e")
    if args.markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for path, label, per, cap in rows:
            print(f"| {path} | {label} | {per:,} | {cap:,} streams |")
    else:
        print(f"params (bf16): {params_bytes/1e6:.1f} MB; reserve "
              f"{WORKSPACE_FRACTION:.0%} workspace")
        for path, label, per, cap in rows:
            print(f"{path:12s} {label:5s} {per/1024:8.1f} KiB/stream "
                  f"-> <= {cap:,} streams/chip")


if __name__ == "__main__":
    main()
