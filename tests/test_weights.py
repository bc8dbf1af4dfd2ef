"""Weight import paths: torch checkpoint loading, npz roundtrip, losses."""

import numpy as np
import pytest

from vap_realtime_tpu.weights.convert import (
    convert_state_dict, load_pytree_npz, save_pytree_npz,
)
from vap_realtime_tpu.weights.synthetic import (
    synthetic_cpc_weights, synthetic_vap_state_dict,
)

torch = pytest.importorskip("torch")


def test_torch_checkpoint_roundtrip(tmp_path):
    """torch.save'd reference-format checkpoints -> identical pytree as
    the torch-free converter on the raw arrays."""
    from vap_realtime_tpu.weights.convert import load_torch_checkpoint

    cpc = synthetic_cpc_weights()
    sd = synthetic_vap_state_dict(20)
    torch.save({"weights": {k: torch.from_numpy(v) for k, v in cpc.items()}},
               tmp_path / "cpc.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               tmp_path / "vap.pt")

    via_torch = load_torch_checkpoint(str(tmp_path / "vap.pt"),
                                      str(tmp_path / "cpc.pt"))
    direct = convert_state_dict(sd, cpc)

    import jax

    for a, b in zip(jax.tree_util.tree_leaves(via_torch),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_pytree_roundtrip(tmp_path):
    tree = {"a": {"b": np.arange(6).reshape(2, 3).astype(np.float32)},
            "layers": [{"w": np.ones((2, 2))}, {"w": np.zeros((2, 2))}]}
    path = str(tmp_path / "t.npz")
    save_pytree_npz(path, tree)
    back = load_pytree_npz(path)
    assert isinstance(back["layers"], list) and len(back["layers"]) == 2
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["layers"][1]["w"], np.zeros((2, 2)))


def test_losses_match_torch():
    """loss_vap (CE) and loss_vad (BCE-with-logits) vs torch functional."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from vap_realtime_tpu.models.objective import loss_vad, loss_vap

    rs = np.random.RandomState(0)
    logits = rs.randn(2, 10, 256).astype(np.float32)
    labels = rs.randint(0, 256, (2, 10))
    ours = float(loss_vap(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(F.cross_entropy(
        torch.from_numpy(logits).reshape(-1, 256),
        torch.from_numpy(labels).reshape(-1)))
    assert abs(ours - theirs) < 1e-5

    vad_logits = rs.randn(2, 10, 2).astype(np.float32)
    vad = (rs.rand(2, 12, 2) > 0.5).astype(np.float32)
    ours = float(loss_vad(jnp.asarray(vad_logits), jnp.asarray(vad)))
    theirs = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(vad_logits), torch.from_numpy(vad[:, :10])))
    assert abs(ours - theirs) < 1e-5
