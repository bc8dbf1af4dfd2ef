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
    metrics = {"loss_vap": l_vap, "loss_vad": l_vad}

    # Head fine-tuning terms for the bc/nod variants.  The reference ships
    # the objective functions (rvap/vap_bc/objective.py:216-308) but not a
    # bc/nod trainer; wiring: each extra label track present in the batch
    # adds its head's loss on top of the trunk loss.
    if cfg.mode == "bc" and "bc_class" in batch:
        # 3-class head (none / react continuer / emo assessment),
        # CE like loss_lid (rvap/vap_bc/vap_bc_main.py:137,272-284)
        l_bc = obj.loss_lid(outs["bc_logits"], batch["bc_class"])
        loss = loss + l_bc
        metrics["loss_bc"] = l_bc
    elif cfg.mode == "nod":
        if "nod_class" in batch:
            l_nod = obj.loss_lid(outs["nod_logits"], batch["nod_class"])
            loss = loss + l_nod
            metrics["loss_nod"] = l_nod
        if "bc_frame" in batch:
            bc_labels = obj.get_labels_bc(batch["bc_frame"], cfg.frame_hz)
            l_bc = obj.loss_bc(jnp.squeeze(outs["bc_logits"], -1), bc_labels)
            loss = loss + l_bc
            metrics["loss_bc"] = l_bc
    if cfg.lid_classify > 0 and "lid_class" in batch:
        key = ("lid_logits" if cfg.lid_classify == 1
               else "lid_middle_logits")
        l_lid = obj.loss_lid(outs[key], batch["lid_class"])
        loss = loss + l_lid
        metrics["loss_lid"] = l_lid

    metrics["loss"] = loss
    return loss, metrics


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
