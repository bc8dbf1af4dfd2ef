"""Multi-device scaling-efficiency sweep (dp training + sharded serving).

BASELINE.md deliverable: "multi-host (N>=2) stream-sharded data parallel,
scaling-efficiency sweep".  On real multi-chip hardware this measures
true scaling over ICI; on a single-chip dev box run it on the virtual CPU
mesh to validate the sharding/collective program:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/scaling_sweep.py --devices 1,2,4,8

For multi-host pods, initialize `jax.distributed` first (one process per
host) — the mesh helper picks up all global devices.
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


def measure(fn, args, sync, reps=5):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--per_device_batch", type=int, default=4)
    ap.add_argument("--streams_per_device", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--out", default=None,
                    help="write a JSON artifact (rows + environment note)")
    args = ap.parse_args()

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from vap_realtime_tpu.runtime.streaming import (
        init_stream_state, stream_step,
    )
    from vap_realtime_tpu.train.step import make_optimizer, train_step
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    avail = len(jax.devices())
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    params0 = jax.tree_util.tree_map(jnp.asarray, synthetic_params(20))
    rs = np.random.RandomState(0)
    L = int(args.seconds * 16000)
    n_frames = (L // 160 - 2) // cfg.downsample_kernel

    print(f"{'n_dev':>5} {'train ms':>10} {'train eff':>10} "
          f"{'serve ms':>10} {'serve eff':>10}")
    base_train = base_serve = None
    rows = []
    for n in [int(x) for x in args.devices.split(",") if int(x) <= avail]:
        mesh = make_mesh(n)
        params = replicate(mesh, params0)
        tx = make_optimizer(params=params)
        opt_state = replicate(mesh, tx.init(params))

        B = args.per_device_batch * n
        batch = shard_batch(mesh, {
            "waveform": rs.randn(B, 2, L).astype(np.float32) * 0.1,
            "vad": (rs.rand(B, n_frames + 40, 2) > 0.5).astype(np.float32),
        })
        tstep = jax.jit(train_step, static_argnums=(3, 4))
        t_train = measure(
            lambda p, o, b: tstep(p, o, b, tx, cfg),
            (params, opt_state, batch),
            lambda out: np.asarray(out[2]["loss"]))

        S = args.streams_per_device * n
        state = shard_batch(mesh, init_stream_state(cfg, S))
        chunk = shard_batch(mesh, jnp.zeros((S, 2, cfg.frame_samples),
                                            jnp.float32))
        sstep = jax.jit(stream_step, static_argnums=3)
        t_serve = measure(
            lambda p, st, ch: sstep(p, st, ch, cfg), (params, state, chunk),
            lambda out: np.asarray(out[1]["p_now"]).ravel()[:1])

        if base_train is None:
            base_train, base_serve = t_train, t_serve
        # efficiency: constant per-device work => ideal time is flat
        eff_t = base_train / t_train
        eff_s = base_serve / t_serve
        print(f"{n:>5} {t_train*1e3:>10.1f} {eff_t:>9.1%} "
              f"{t_serve*1e3:>10.1f} {eff_s:>9.1%}")
        rows.append({
            "n_devices": n,
            "train_ms": round(t_train * 1e3, 1),
            "serve_ms": round(t_serve * 1e3, 1),
            # real-hardware metric: constant per-device work => flat time
            "train_eff_flat_time": round(eff_t, 4),
            "serve_eff_flat_time": round(eff_s, 4),
            # virtual shared-host metric: N virtual devices time-share one
            # CPU, so ideal time is N*t1; deviation = sharding/collective
            # overhead of the dp program itself
            "train_overhead_vs_shared_ideal": round(
                t_train / (n * base_train) - 1.0, 4),
            "serve_overhead_vs_shared_ideal": round(
                t_serve / (n * base_serve) - 1.0, 4),
        })

    if args.out:
        import json
        art = {
            "tool": "tools/scaling_sweep.py",
            "platform": jax.default_backend(),
            "n_devices_available": avail,
            "per_device_batch": args.per_device_batch,
            "streams_per_device": args.streams_per_device,
            "rows": rows,
            "environment_note": (
                "Run on jax's virtual CPU mesh "
                "(xla_force_host_platform_device_count): the N virtual "
                "devices TIME-SHARE one physical host, so wall time grows "
                "~N-fold by construction and the flat-time efficiency "
                "column is NOT a hardware scaling measurement.  The "
                "meaningful virtual-mesh number is "
                "*_overhead_vs_shared_ideal: how much slower the sharded "
                "program runs than N*t1 — the sharding + collective "
                "overhead of the dp program (BASELINE.md deliverable; "
                "reference DDP anchor train/train.py:316-321).  On real "
                "multi-chip hardware rerun this tool as-is for the true "
                "sweep; this environment exposes a single TPU chip."),
        }
        with open(args.out, "w") as f:
            json.dump(art, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
