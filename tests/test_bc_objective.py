"""bc/nod fine-tuning objectives vs torch reference semantics.

Pins get_labels_bc (0.5 s future shift, 2 s truncation, zero tail —
rvap/vap_bc/objective.py:216-236), loss_bc (BCE-with-logits + pos_weight,
:295-296) and loss_vad_mono (:302-308) against torch.nn.functional and a
literal re-execution of the reference's label loop.
"""

import numpy as np
import pytest

from vap_realtime_tpu.models import objective as obj


def reference_labels_bc(bc_frame: np.ndarray, frame_hz: int) -> np.ndarray:
    """Literal loop transcription of the reference get_labels_bc."""
    shift = int(0.5 * frame_hz)
    append = int(2.0 * frame_hz)
    out = np.zeros((bc_frame.shape[0], bc_frame.shape[1] - append),
                   dtype=bc_frame.dtype)
    for b in range(bc_frame.shape[0]):
        for i in range(shift, bc_frame.shape[1] - append):
            out[b, i - shift] = bc_frame[b, i]
    return out


@pytest.mark.parametrize("frame_hz", [10, 20, 50])
def test_get_labels_bc_matches_reference_loop(frame_hz):
    rng = np.random.RandomState(0)
    n = 8 * frame_hz  # 8 s
    bc = (rng.rand(3, n) > 0.8).astype(np.float32)
    got = np.asarray(obj.get_labels_bc(bc, frame_hz))
    want = reference_labels_bc(bc, frame_hz)
    assert got.shape == want.shape == (3, n - 2 * frame_hz)
    np.testing.assert_array_equal(got, want)
    # the last `shift` frames must be zero (no future signal)
    assert got[:, -int(0.5 * frame_hz):].sum() == 0


@pytest.mark.parametrize("pos_weight", [1.0, 3.5])
def test_loss_bc_matches_torch(pos_weight):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(4, 40).astype(np.float32)
    y = (rng.rand(4, 40) > 0.7).astype(np.float32)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(y),
        pos_weight=torch.tensor([pos_weight])).item()
    got = float(obj.loss_bc(x, y, pos_weight))
    assert got == pytest.approx(want, abs=1e-6)


def test_loss_vad_mono_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    logits = rng.randn(4, 30, 1).astype(np.float32)
    vad = (rng.rand(4, 36, 2) > 0.5).astype(np.float32)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits).squeeze(),
        torch.tensor(vad[:, :30, 1])).item()
    got = float(obj.loss_vad_mono(logits, vad))
    assert got == pytest.approx(want, abs=1e-6)


def test_train_step_bc_nod_losses():
    """compute_loss adds head losses when the batch carries the tracks."""
    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.train.step import compute_loss
    from vap_realtime_tpu.weights.synthetic import synthetic_params

    rng = np.random.RandomState(3)
    L = 16000  # 1 s at 20 Hz -> 20 frames
    wav = rng.randn(2, 2, L).astype(np.float32) * 0.1
    n_frames = 20
    vad = (rng.rand(2, n_frames + 40, 2) > 0.5).astype(np.float32)

    cfg = VapConfig(frame_hz=20, context_len_sec=1.0, mode="nod")
    params = jax.tree_util.tree_map(jnp.asarray,
                                    synthetic_params(20, mode="nod"))
    batch = {
        "waveform": wav, "vad": vad,
        "nod_class": rng.randint(0, 4, (2, n_frames)).astype(np.int32),
        "bc_frame": (rng.rand(2, n_frames + 40) > 0.8).astype(np.float32),
    }
    loss, metrics = compute_loss(params, batch, cfg)
    assert np.isfinite(float(loss))
    assert "loss_nod" in metrics and "loss_bc" in metrics
    base = float(metrics["loss_vap"] + metrics["loss_vad"])
    assert float(loss) == pytest.approx(
        base + float(metrics["loss_nod"]) + float(metrics["loss_bc"]),
        rel=1e-5)
