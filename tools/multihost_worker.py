"""Multi-host (multi-process) smoke worker — run N copies of this, one
per "host", to exercise the real jax.distributed path on CPU:

    python tools/multihost_worker.py --coordinator localhost:PORT \
        --num_processes 2 --process_id 0 --out /tmp/w0.json

Each worker: initializes jax.distributed, builds the GLOBAL mesh, sums
fleet metrics with `all_host_metrics`, and runs one real dp-sharded VAP
train step over a global batch assembled from per-process local shards
(the jax.distributed replacement for the reference's Lightning
DDPStrategy, train/train.py:316-321).  Results are written as JSON for
the launcher (tests/test_multihost.py) to assert.
"""

import argparse
import json
import os
import sys

# CPU backend with 2 virtual devices per process, BEFORE jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from vap_realtime_tpu.parallel.distributed import (
        all_host_metrics, global_batch, init_distributed,
    )

    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    pid = jax.process_index()

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.models.vap import init_vap_params
    from vap_realtime_tpu.parallel.mesh import make_mesh, replicate
    from vap_realtime_tpu.train.trainer import (
        OptConfig, make_train_step, make_tx,
    )

    mesh = make_mesh()  # global: num_processes x 2 virtual devices
    n_global = mesh.devices.size

    # --- fleet metrics over the real collective path
    fleet = all_host_metrics({"streams": 10.0 * (pid + 1), "frames": 5.0})

    # --- one real dp train step over a global batch
    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    rng = jax.random.PRNGKey(0)
    params = replicate(mesh, init_vap_params(rng, cfg))
    tx = make_tx(params, OptConfig())
    opt_state = replicate(mesh, tx.init(params))
    step = make_train_step(tx, cfg)

    rs = np.random.RandomState(100 + pid)  # different data per "host"
    local = {
        "waveform": 0.1 * rs.randn(2, 2, 8000).astype(np.float32),
        # vad spans audio duration + 2 s projection horizon at frame_hz
        "vad": (rs.rand(2, 50, 2) > 0.5).astype(np.float32),
    }
    batch = global_batch(mesh, local)
    assert batch["waveform"].shape[0] == 2 * args.num_processes

    with mesh:
        params, opt_state, metrics = step(params, opt_state, batch, rng)
    loss = float(metrics["loss"])

    # params stay replica-consistent across hosts: checksum must agree
    checksum = float(sum(jnp.sum(jnp.abs(x))
                         for x in jax.tree_util.tree_leaves(params)))
    sums = all_host_metrics({"checksum": checksum, "loss": loss})

    with open(args.out, "w") as f:
        json.dump({
            "process_id": pid,
            "process_count": jax.process_count(),
            "global_devices": n_global,
            "fleet_streams": fleet["streams"],
            "fleet_frames": fleet["frames"],
            "loss": loss,
            "checksum": checksum,
            "checksum_sum": sums["checksum"],
            "loss_sum": sums["loss"],
        }, f)
    print(f"[worker {pid}] ok loss={loss:.4f}")


if __name__ == "__main__":
    main()
