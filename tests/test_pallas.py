"""Pallas kernel parity (interpret mode on CPU; compiled path on TPU).

These kernels are OPTIONAL accelerators — the default paths use XLA ops.
Parity contract: identical math to ops.basic / models.encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vap_realtime_tpu.models.encoder import cpc_conv_stack
from vap_realtime_tpu.ops.basic import channel_norm, conv1d, lstm
from vap_realtime_tpu.ops.pallas.cpc_conv import (
    cpc_conv_tail, pack_tail_params, tail_out_len,
)
from vap_realtime_tpu.ops.pallas.lstm import lstm_pallas
from vap_realtime_tpu.weights.synthetic import synthetic_params


def test_tail_out_len():
    assert tail_out_len(224) == [56, 28, 14, 7]    # 20 Hz chunk
    assert tail_out_len(384) == [96, 48, 24, 12]   # 10 Hz chunk
    assert tail_out_len(128) == [32, 16, 8, 4]     # 50 Hz chunk


def test_conv_tail_parity():
    params = synthetic_params(20)["encoder"]
    rs = np.random.RandomState(0)
    wav = jnp.asarray(0.1 * rs.randn(4, 1120).astype(np.float32))

    ref = cpc_conv_stack(params, wav)             # (4, 7, 256)

    # conv0 + norm + relu via the XLA ops, then the Pallas tail
    x = wav[:, None, :]
    x0 = jax.nn.relu(channel_norm(
        conv1d(x, params["conv0"]["w"], params["conv0"]["b"], 5, 3),
        params["norm0"]["w"], params["norm0"]["b"]))
    x0 = jnp.swapaxes(x0, 1, 2)                   # (4, 224, 256)

    out = cpc_conv_tail(x0, pack_tail_params(params), block_b=4,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_lstm_kernel_parity():
    rs = np.random.RandomState(1)
    B, T, H = 8, 5, 256
    x = jnp.asarray(0.1 * rs.randn(B, T, H).astype(np.float32))
    h0 = jnp.asarray(0.1 * rs.randn(B, H).astype(np.float32))
    c0 = jnp.asarray(0.1 * rs.randn(B, H).astype(np.float32))
    s = 1 / np.sqrt(H)
    w_ih = jnp.asarray(rs.uniform(-s, s, (4 * H, H)).astype(np.float32))
    w_hh = jnp.asarray(rs.uniform(-s, s, (4 * H, H)).astype(np.float32))
    b_ih = jnp.asarray(rs.uniform(-s, s, 4 * H).astype(np.float32))
    b_hh = jnp.asarray(rs.uniform(-s, s, 4 * H).astype(np.float32))

    y0, hT0, cT0 = lstm(x, h0, c0, w_ih, w_hh, b_ih, b_hh)
    y1, hT1, cT1 = lstm_pallas(x, h0, c0, w_ih, w_hh, b_ih, b_hh,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT1), np.asarray(hT0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT1), np.asarray(cT0), atol=1e-5)
