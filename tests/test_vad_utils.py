"""VAD utilities, entropy output, context-limit modes."""

import jax
import jax.numpy as jnp
import numpy as np

from vap_realtime_tpu.config import VapConfig
from vap_realtime_tpu.utils.vad import (
    vad_fill_silences, vad_omit_spikes, vad_onehot_to_vad_list,
)
from vap_realtime_tpu.weights.synthetic import synthetic_audio, synthetic_params


def test_vad_fill_and_omit():
    vad = np.zeros((20, 2), np.float32)
    vad[0:5, 0] = 1
    vad[6:10, 0] = 1   # 1-frame pause at 5
    vad[15, 1] = 1     # 1-frame spike
    filled = vad_fill_silences(vad, max_fill_time=0.02, frame_hz=50)
    assert filled[5, 0] == 1.0
    assert filled[15, 1] == 1.0  # untouched channel
    omitted = vad_omit_spikes(vad, max_omit_time=0.02, frame_hz=50)
    assert omitted[15, 1] == 0.0
    assert omitted[0:5, 0].sum() == 5  # long activity kept


def test_vad_onehot_to_list_roundtrip():
    from vap_realtime_tpu.train.data import vad_list_to_onehot

    vl = [[[0.1, 0.5], [0.54, 1.0]], [[0.2, 0.4]]]
    onehot = vad_list_to_onehot(vl, duration=1.2, frame_hz=50)
    back = vad_onehot_to_vad_list(onehot[None], frame_hz=50,
                                  ipu_thresh_time=0.01)[0]
    assert back[0] == [[0.1, 0.5], [0.54, 1.0]]
    assert back[1] == [[0.2, 0.4]]
    # with a generous IPU threshold the two ch0 segments merge
    merged = vad_onehot_to_vad_list(onehot[None], frame_hz=50,
                                    ipu_thresh_time=0.1)[0]
    assert merged[0] == [[0.1, 1.0]]


def test_entropy_output():
    from vap_realtime_tpu.models.vap import forward_context, probs_from_outputs

    cfg = VapConfig(frame_hz=20)
    params = synthetic_params(20)
    rs = np.random.RandomState(0)
    e = jnp.asarray(0.3 * rs.randn(1, 10, 256).astype(np.float32))
    probs = probs_from_outputs(forward_context(params, e, e, cfg), cfg)
    H = np.asarray(probs["H"])
    assert H.shape == (1, 10)
    assert np.all(H >= 0) and np.all(H <= 8.0 + 1e-5)  # 256 states = 8 bits


def test_context_limit_band_mask_consistency():
    """Attention band mask: full-recompute and KV paths must agree."""
    from vap_realtime_tpu.runtime.incremental import (
        init_kv_state, run_frames_kv,
    )
    from vap_realtime_tpu.runtime.streaming import (
        frame_audio, init_stream_state, run_frames,
    )

    cfg = VapConfig(frame_hz=20, context_len_sec=2.0, context_limit=10)
    params = synthetic_params(20)
    frames = jnp.asarray(
        frame_audio(synthetic_audio(16000 * 2), cfg)[:, None])
    _, full = jax.jit(run_frames, static_argnums=3)(
        params, init_stream_state(cfg, 1), frames, cfg)
    _, kv = jax.jit(run_frames_kv, static_argnums=3)(
        params, init_kv_state(cfg, 1), frames, cfg)
    np.testing.assert_allclose(np.asarray(kv["p_now"]),
                               np.asarray(full["p_now"]), atol=2e-5)


def test_context_limited_cpc_encoding():
    """Truncated-context CPC mode produces the right shape and differs
    from the unlimited encoding (context actually truncated)."""
    from vap_realtime_tpu.models.encoder import (
        encode_sequence, encode_sequence_limited,
    )

    params = synthetic_params(20)["encoder"]
    wav = jnp.asarray(synthetic_audio(16000 * 3)[:1])  # (1, L)
    full = encode_sequence(params, wav, 5)
    lim = encode_sequence_limited(params, wav, 5, limit_sec=1.0)
    assert lim.shape == full.shape
    # early frames (inside the limit) differ only by the zero left-pad;
    # late frames must differ because history is truncated
    d_late = float(jnp.max(jnp.abs(lim[:, -1] - full[:, -1])))
    assert d_late > 1e-6
