"""vap_realtime_tpu — TPU-native Voice Activity Projection framework.

A from-scratch JAX/XLA/Pallas implementation of realtime Voice Activity
Projection (VAP) for continuous turn-taking prediction, with the full
capability surface of the reference system (inokoj/VAP-Realtime):

- CPC waveform encoder (strided conv stack + GRU context network)
- channel-wise GPT + stereo cross-attention GPT with AliBi attention
- 256-class discrete VA-projection head, p_now / p_future aggregation
- vap / vap_bc (backchannel) / vap_nod (nodding) model variants
- streaming runtime with incremental KV-cache (no full-context recompute)
- batched multi-stream serving with HBM-resident per-stream state
- byte-compatible TCP wire protocol, offline CSV runner, training stack

Architecture is TPU-first: pure-functional stateless step over pytree
state, static shapes, `lax.scan` over frames, sharded stream batches over
`jax.sharding.Mesh`, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

from vap_realtime_tpu.config import VapConfig  # noqa: F401


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "Vap":
        from vap_realtime_tpu.api import Vap
        return Vap
    if name == "VapEngine":
        from vap_realtime_tpu.runtime.engine import VapEngine
        return VapEngine
    if name == "VapModel":
        from vap_realtime_tpu.models.vap import VapModel
        return VapModel
    raise AttributeError(name)
