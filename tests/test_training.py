"""Training-stack smoke: data pipeline, fit loop, checkpointing, eval CLI."""

import os

import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.train.data import (
    DataConfig, VapDataLoader, synthetic_manifest, vad_list_to_onehot,
)
from vap_realtime_tpu.train.events import EventConfig
from vap_realtime_tpu.train.trainer import OptConfig, find_best_checkpoint, fit


def test_vad_list_to_onehot():
    vad = vad_list_to_onehot([[[0.0, 0.5]], [[0.25, 1.0]]], duration=2.0,
                             frame_hz=20)
    assert vad.shape == (40, 2)
    assert vad[:10, 0].sum() == 10
    assert vad[10:, 0].sum() == 0
    assert vad[5:20, 1].sum() == 15


def test_dataloader(tmp_path):
    path = synthetic_manifest(str(tmp_path), n_rows=5, duration=3.0)
    cfg = DataConfig(train_path=path, batch_size=2, audio_duration=3.0,
                     frame_hz=20)
    loader = VapDataLoader(path, cfg, shuffle=True, train=True)
    batches = list(loader)
    assert len(batches) == 2  # drops last partial
    b = batches[0]
    assert b["waveform"].shape == (2, 2, 3 * 16000)
    assert b["vad"].shape == (2, int(5.0 * 20), 2)


def test_full_resume_equals_uninterrupted(tmp_path):
    """fit 1 epoch -> resume from the full-state checkpoint for 1 more
    epoch == a 2-epoch uninterrupted run: identical final params
    (optimizer moments, lr/plateau/early counters, PRNG stream, and
    epoch-seeded shuffles/flips all restored)."""
    import jax

    path = synthetic_manifest(str(tmp_path), n_rows=4, duration=3.0)
    vap_cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    data_cfg = DataConfig(train_path=path, val_path=path, batch_size=2,
                          audio_duration=3.0, frame_hz=20)

    hist2 = fit(vap_cfg, data_cfg, OptConfig(max_epochs=2, seed=3),
                ckpt_dir=str(tmp_path / "full"), log_fn=lambda m: None)

    fit(vap_cfg, data_cfg, OptConfig(max_epochs=1, seed=3),
        ckpt_dir=str(tmp_path / "a"), log_fn=lambda m: None)
    hist_r = fit(vap_cfg, data_cfg, OptConfig(max_epochs=2, seed=3),
                 ckpt_dir=str(tmp_path / "b"),
                 resume_from=str(tmp_path / "a" / "last.npz"),
                 log_fn=lambda m: None)

    assert hist_r["epoch"] == hist2["epoch"] == 1
    flat2 = jax.tree_util.tree_leaves(hist2["params"])
    flatr = jax.tree_util.tree_leaves(hist_r["params"])
    for a, b in zip(flat2, flatr):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)
    assert hist_r["train_loss"] == hist2["train_loss"]


def test_fit_and_evaluate(tmp_path):
    """Two-epoch fit on a tiny synthetic dataset: loss finite+decreasing,
    best checkpoint saved, evaluation CLI writes score.csv."""
    path = synthetic_manifest(str(tmp_path), n_rows=4, duration=3.0)
    vap_cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    data_cfg = DataConfig(train_path=path, val_path=path, batch_size=2,
                          audio_duration=3.0, frame_hz=20)
    opt_cfg = OptConfig(max_epochs=2, learning_rate=1e-3, seed=0)
    event_cfg = EventConfig(frame_hz=20, max_time=3.0,
                            min_context_time=0.5)
    ckpt_dir = str(tmp_path / "run")

    logs = []
    hist = fit(vap_cfg, data_cfg, opt_cfg, event_cfg, ckpt_dir=ckpt_dir,
               log_fn=logs.append)
    assert np.isfinite(hist["train_loss"])
    assert hist["train_loss"] < 7.0  # ~ln(256)+BCE at init, must not blow up
    ckpt = find_best_checkpoint(ckpt_dir)
    assert ckpt is not None and os.path.exists(ckpt)

    from vap_realtime_tpu.train.evaluation import run_evaluation
    out = run_evaluation(ckpt, vap_cfg,
                         DataConfig(test_path=path, batch_size=2,
                                    audio_duration=3.0, frame_hz=20),
                         event_cfg, out_root=str(tmp_path / "eval"))
    assert os.path.exists(out)
    rows = open(out).read().splitlines()
    assert rows[0] == "metric,value"
    assert any(r.startswith("test_loss,") for r in rows)
