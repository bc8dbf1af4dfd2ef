"""Training CLI — the `train/train.py` analogue (optax + dp sharding).

Capability contract from the reference (train/train.py):
- AdamW lr 3.63e-4, wd 1e-3, betas (0.9, 0.999) (OptConfig :27-49)
- ReduceLROnPlateau on val_loss: factor 0.5, patience 2 (:602-619)
- EarlyStopping on val_loss, patience 10 (:263-273)
- ModelCheckpoint: keep the best checkpoint, name embeds epoch/val_loss
  (:248-256); resume via --resume_from
- SymmetricSpeakers channel flip p=0.5 on train batches (callbacks.py)
- loss = CE(vap projection labels) + BCE(vad); encoder frozen
- validation: loss + turn-taking event metrics (hs/hs2/ls/...)
- multi-device: dp over the batch via NamedSharding (replaces DDP)

Run: python -m vap_realtime_tpu.train.trainer \
        --data_train_path train.csv --data_val_path val.csv [...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vap_realtime_tpu.config import VapConfig, add_argparse_args, args_to_conf
from vap_realtime_tpu.models import objective as obj
from vap_realtime_tpu.models.vap import forward_waveform, init_vap_params
from vap_realtime_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from vap_realtime_tpu.train.data import DataConfig, VapDataLoader
from vap_realtime_tpu.train.events import EventConfig, TurnTakingEvents
from vap_realtime_tpu.train.metrics import (
    event_metrics, extract_prediction_and_targets,
)
from vap_realtime_tpu.train.step import freeze_encoder_mask
from vap_realtime_tpu.weights.convert import (
    load_pytree_npz, save_pytree_npz,
)


@dataclass
class OptConfig:
    """Reference OptConfig defaults (train/train.py:27-64)."""

    learning_rate: float = 3.63e-4
    weight_decay: float = 1e-3
    betas: tuple = (0.9, 0.999)
    lr_scheduler_factor: float = 0.5
    lr_scheduler_patience: int = 2
    early_stopping_patience: int = 10
    max_epochs: int = 100
    seed: int = 0


def make_tx(params, opt: OptConfig):
    """Masked AdamW with an injectable learning rate (for plateau decay)."""
    mask = freeze_encoder_mask(params)

    @optax.inject_hyperparams
    def make(learning_rate):
        return optax.masked(
            optax.adamw(learning_rate, b1=opt.betas[0], b2=opt.betas[1],
                        weight_decay=opt.weight_decay), mask)

    return make(learning_rate=opt.learning_rate)


def loss_fn(params, batch, cfg: VapConfig, rng):
    outs = forward_waveform(params, batch["waveform"], cfg, rng)
    labels = obj.get_labels(batch["vad"], cfg.bin_frames())
    l_vap = obj.loss_vap(outs["logits"], labels)
    vad_logits = jnp.concatenate([outs["vad1"], outs["vad2"]], axis=-1)
    l_vad = obj.loss_vad(vad_logits, batch["vad"])
    return l_vap + l_vad, {"loss_vap": l_vap, "loss_vad": l_vad}


def make_train_step(tx, cfg: VapConfig, augment: bool = False):
    """Jitted SGD step; optional on-device waveform augmentation
    (noise + STFT freq-mask, the noise-robust "MC" recipe —
    reference train/transforms.py via AudioAugmentationCallback)."""
    if augment:
        from vap_realtime_tpu.train.transforms import augment_batch

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        if augment:
            rng, aug_rng = jax.random.split(rng)
            batch = dict(batch,
                         waveform=augment_batch(batch["waveform"], aug_rng))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, cfg, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **aux}
    return step


def make_eval_step(cfg: VapConfig):
    @jax.jit
    def step(params, batch):
        loss, aux = loss_fn(params, batch, cfg, None)
        outs = forward_waveform(params, batch["waveform"], cfg, None)
        probs = jax.nn.softmax(outs["logits"], axis=-1)
        return {"loss": loss, **aux,
                "p_now": obj.p_now(probs, cfg.n_bins),
                "p_future": obj.p_future(probs, cfg.n_bins)}
    return step


def evaluate(params, loader, eval_step, cfg: VapConfig,
             eventer: Optional[TurnTakingEvents], mesh) -> Dict[str, float]:
    losses = []
    all_preds: Dict[str, list] = {}
    all_targets: Dict[str, list] = {}
    for batch in loader:
        sbatch = shard_batch(mesh, batch)
        out = eval_step(params, sbatch)
        losses.append(float(out["loss"]))
        if eventer is not None:
            events = eventer(batch["vad"])
            preds, targets = extract_prediction_and_targets(
                np.asarray(out["p_now"]), np.asarray(out["p_future"]),
                events)
            for k, v in preds.items():
                if v is not None:
                    all_preds.setdefault(k, []).append(v)
                    all_targets.setdefault(k, []).append(targets[k])
    metrics = {"loss": float(np.mean(losses)) if losses else float("nan")}
    if all_preds:
        flat_p = {k: np.concatenate(v) for k, v in all_preds.items()}
        flat_t = {k: np.concatenate(v) for k, v in all_targets.items()}
        metrics.update(event_metrics(flat_p, flat_t))
    return metrics


def save_train_state(path: str, params, opt_state, rng, meta: Dict) -> None:
    """Full-state checkpoint: params + optimizer state + PRNG key +
    scheduler/early-stop counters — everything `fit` needs to continue
    EXACTLY as if uninterrupted (the capability the reference stubs out,
    train/train.py:323-329).  Atomic write (tmp + rename)."""
    from vap_realtime_tpu.weights.convert import _flatten

    flat = {f"params/{k}": v for k, v in _flatten(
        jax.tree_util.tree_map(np.asarray, params)).items()}
    for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
        flat[f"opt/{i:05d}"] = np.asarray(leaf)
    flat["rng"] = np.asarray(rng)
    flat["meta_json"] = np.asarray(json.dumps(meta))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def is_full_train_state(path: str) -> bool:
    with np.load(path, allow_pickle=False) as data:
        return "meta_json" in data.files


def load_train_state(path: str):
    """-> (params_tree, opt_leaves, rng, meta).  The optimizer leaves are
    re-attached to a freshly built tx.init treedef by the caller."""
    from vap_realtime_tpu.weights.convert import _unflatten

    with np.load(path, allow_pickle=False) as data:
        params = _unflatten({k[len("params/"):]: data[k]
                             for k in data.files if k.startswith("params/")})
        opt_keys = sorted(k for k in data.files if k.startswith("opt/"))
        opt_leaves = [data[k] for k in opt_keys]
        rng = jnp.asarray(data["rng"])
        meta = json.loads(str(data["meta_json"]))
    return params, opt_leaves, rng, meta


def find_best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Pick min-val_loss checkpoint by filename (evaluation.py:97-120)."""
    best, best_loss = None, float("inf")
    if not os.path.isdir(ckpt_dir):
        return None
    for f in os.listdir(ckpt_dir):
        m = re.search(r"val_([0-9.]+)\.npz$", f)
        if m:
            loss = float(m.group(1).rstrip("."))
            if loss < best_loss:
                best, best_loss = os.path.join(ckpt_dir, f), loss
    return best


def fit(vap_cfg: VapConfig, data_cfg: DataConfig, opt_cfg: OptConfig,
        event_cfg: Optional[EventConfig] = None,
        ckpt_dir: str = "runs/vap", init_params=None,
        resume_from: Optional[str] = None, augment: bool = False,
        n_devices: Optional[int] = None, log_fn=print) -> Dict[str, float]:
    os.makedirs(ckpt_dir, exist_ok=True)
    mesh = make_mesh(n_devices)
    rng = jax.random.PRNGKey(opt_cfg.seed)

    resume = None
    if resume_from and is_full_train_state(resume_from):
        init_params, opt_leaves, rng, resume = load_train_state(resume_from)
    elif resume_from:
        init_params = load_pytree_npz(resume_from)  # params-only warm start
    elif init_params is None:
        init_params = init_vap_params(rng, vap_cfg)
    params = replicate(mesh, jax.tree_util.tree_map(jnp.asarray,
                                                    init_params))
    tx = make_tx(params, opt_cfg)
    opt_state = tx.init(params)
    if resume is not None:
        opt_state = replicate(mesh, jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt_state),
            [jnp.asarray(x) for x in opt_leaves]))

    step_fn = make_train_step(tx, vap_cfg, augment=augment)
    eval_fn = make_eval_step(vap_cfg)
    eventer = TurnTakingEvents(event_cfg) if event_cfg else None

    train_loader = VapDataLoader(data_cfg.train_path, data_cfg,
                                 shuffle=True, train=True,
                                 seed=opt_cfg.seed)
    val_loader = (VapDataLoader(data_cfg.val_path, data_cfg, shuffle=False,
                                train=False)
                  if data_cfg.val_path else None)

    best_val = float("inf")
    plateau = 0
    early = 0
    lr = opt_cfg.learning_rate
    start_epoch = 0
    history = {}
    if resume is not None:
        best_val = resume["best_val"]
        plateau = resume["plateau"]
        early = resume["early"]
        lr = resume["lr"]
        start_epoch = resume["epoch"] + 1
        log_fn(f"resumed full train state from {resume_from} "
               f"(next epoch {start_epoch}, lr={lr:.2e})")

    for epoch in range(start_epoch, opt_cfg.max_epochs):
        t0 = time.time()
        losses = []
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            rng, sub = jax.random.split(rng)
            sbatch = shard_batch(mesh, batch)
            params, opt_state, metrics = step_fn(params, opt_state,
                                                 sbatch, sub)
            losses.append(metrics["loss"])
        train_loss = float(jnp.mean(jnp.stack(losses))) if losses else None

        msg = f"epoch {epoch}: train_loss={train_loss:.4f} " \
              f"({time.time()-t0:.1f}s, lr={lr:.2e})"
        history = {"epoch": epoch, "train_loss": train_loss, "lr": lr}

        if val_loader is not None:
            val = evaluate(params, val_loader, eval_fn, vap_cfg, eventer,
                           mesh)
            val_loss = val["loss"]
            msg += f" val_loss={val_loss:.4f}"
            if "hs2_balanced_accuracy" in val:
                msg += f" hs2_bacc={val['hs2_balanced_accuracy']:.3f}"
            history.update({f"val_{k}": v for k, v in val.items()})

            # checkpoint best (ModelCheckpoint top-1 semantics)
            if val_loss < best_val:
                best_val = val_loss
                plateau = 0
                early = 0
                path = os.path.join(
                    ckpt_dir, f"vap_epoch{epoch}-val_{val_loss:.5f}.npz")
                save_pytree_npz(
                    path, jax.tree_util.tree_map(np.asarray, params))
                msg += f" [saved {os.path.basename(path)}]"
            else:
                plateau += 1
                early += 1
                # ReduceLROnPlateau factor 0.5 patience 2
                if plateau > opt_cfg.lr_scheduler_patience:
                    lr *= opt_cfg.lr_scheduler_factor
                    opt_state.hyperparams["learning_rate"] = jnp.asarray(
                        lr, jnp.float32)
                    plateau = 0
                    msg += f" [lr -> {lr:.2e}]"
                if early >= opt_cfg.early_stopping_patience:
                    # keep last.npz current even on the early-stop exit
                    # (otherwise it would be one epoch stale — or missing
                    # entirely if the stop fires on this run's first epoch)
                    save_train_state(
                        os.path.join(ckpt_dir, "last.npz"), params,
                        opt_state, rng,
                        {"epoch": epoch, "lr": lr, "best_val": best_val,
                         "plateau": plateau, "early": early})
                    log_fn(msg + " [early stop]")
                    break
        # full-state "last" checkpoint: resuming from it continues the
        # run exactly (optimizer moments, lr, plateau/early counters, PRNG)
        save_train_state(
            os.path.join(ckpt_dir, "last.npz"), params, opt_state, rng,
            {"epoch": epoch, "lr": lr, "best_val": best_val,
             "plateau": plateau, "early": early})
        log_fn(msg)

    history["params"] = jax.tree_util.tree_map(np.asarray, params)
    return history


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    add_argparse_args(ap)
    for f, t, d in [("data_train_path", str, None),
                    ("data_val_path", str, None),
                    ("data_test_path", str, None),
                    ("data_batch_size", int, 8),
                    ("data_audio_duration", float, 20.0),
                    ("opt_learning_rate", float, 3.63e-4),
                    ("opt_weight_decay", float, 1e-3),
                    ("opt_max_epochs", int, 100),
                    ("opt_early_stopping_patience", int, 10),
                    ("opt_seed", int, 0),
                    ("ckpt_dir", str, "runs/vap"),
                    ("resume_from", str, None)]:
        ap.add_argument(f"--{f}", type=t, default=d)
    ap.add_argument("--augment", action="store_true",
                    help="noise-robust (MC) waveform augmentation")
    args = ap.parse_args(argv)

    vap_cfg = args_to_conf(args)
    data_cfg = DataConfig(
        train_path=args.data_train_path, val_path=args.data_val_path,
        test_path=args.data_test_path, batch_size=args.data_batch_size,
        audio_duration=args.data_audio_duration, frame_hz=vap_cfg.frame_hz,
    )
    opt_cfg = OptConfig(
        learning_rate=args.opt_learning_rate,
        weight_decay=args.opt_weight_decay,
        max_epochs=args.opt_max_epochs,
        early_stopping_patience=args.opt_early_stopping_patience,
        seed=args.opt_seed,
    )
    event_cfg = EventConfig(frame_hz=vap_cfg.frame_hz,
                            max_time=data_cfg.audio_duration)
    fit(vap_cfg, data_cfg, opt_cfg, event_cfg, ckpt_dir=args.ckpt_dir,
        resume_from=args.resume_from, augment=args.augment)


if __name__ == "__main__":
    main()
