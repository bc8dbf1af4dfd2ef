"""Training step: loss, grads, optimizer update — pjit/dp-ready.

Loss contract from the reference (train/train.py:583-630 `shared_step`):
``loss = loss_vap(CE over projection labels) + loss_vad(BCE)`` where
labels come from the future VAD window and the encoder is frozen
(train/model.py:184-186) — gradients flow only through the downsample,
transformers, and heads.

Data parallelism: shard the batch's leading axis over a `dp` mesh and
jit — XLA inserts the gradient all-reduce over ICI from the shardings
(replacing the reference's Lightning DDP/NCCL; train/train.py:316-321).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.models import objective as obj
from vap_realtime_tpu.models.vap import forward_waveform

Params = Dict[str, Any]


def compute_loss(params: Params, batch: Dict[str, jax.Array], cfg: VapConfig,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """batch: {"waveform": (B, 2, L), "vad": (B, Tv, 2)} with Tv extending
    `horizon` frames past the audio frames (train/README.md:44-55)."""
    outs = forward_waveform(params, batch["waveform"], cfg, rng)
    labels = obj.get_labels(batch["vad"], cfg.bin_frames())
    l_vap = obj.loss_vap(outs["logits"], labels)
    vad_logits = jnp.concatenate([outs["vad1"], outs["vad2"]], axis=-1)
    l_vad = obj.loss_vad(vad_logits, batch["vad"])
    loss = l_vap + l_vad
    return loss, {"loss": loss, "loss_vap": l_vap, "loss_vad": l_vad}


def freeze_encoder_mask(params: Params) -> Params:
    """Trainability mask: encoder conv/LSTM frozen, downsample trainable
    (reference freeze: rvap/vap_main/encoder.py:48-51 freezes `encoder.*`
    i.e. the CPC stack, while `downsample` stays trainable)."""
    m = jax.tree_util.tree_map(lambda _: True, params)
    enc = m["encoder"]
    for key in list(enc.keys()):
        frozen = key.startswith("conv") or key.startswith("norm") \
            or key == "lstm"
        enc[key] = jax.tree_util.tree_map(lambda _: not frozen, enc[key])
    return m


def make_optimizer(lr: float = 3.63e-4, weight_decay: float = 1e-3,
                   params: Optional[Params] = None,
                   betas=(0.9, 0.999)) -> optax.GradientTransformation:
    """AdamW lr 3.63e-4, wd 1e-3 (reference OptConfig, train/train.py:27-64)
    with the encoder frozen via a trainability mask."""
    tx = optax.adamw(lr, b1=betas[0], b2=betas[1],
                     weight_decay=weight_decay)
    if params is not None:
        mask = freeze_encoder_mask(params)
        tx = optax.chain(
            optax.masked(tx, mask),
        )
    return tx


def train_step(params: Params, opt_state, batch: Dict[str, jax.Array],
               tx: optax.GradientTransformation, cfg: VapConfig,
               rng: Optional[jax.Array] = None):
    """One SGD step; jit with `tx`/`cfg` static (closure or partial)."""
    (loss, metrics), grads = jax.value_and_grad(
        compute_loss, has_aux=True)(params, batch, cfg, rng)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics
