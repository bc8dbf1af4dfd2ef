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


class TestFusedAttend:
    """Pallas fused single-query KV-step attention (ops/pallas/attend.py)
    vs the einsum reference, interpret mode on CPU."""

    def _inputs(self, B=8, T=12, n=8, D=256, seed=0):
        import numpy as np
        import jax.numpy as jnp
        rs = np.random.RandomState(seed)
        # phase-major cache: (B, P, T, 4D), global slot s -> phase s//4
        cache = jnp.asarray(
            rs.randn(B, n // 4, T, 4 * D).astype(np.float32) * 0.3)
        q = jnp.asarray(rs.randn(B, D).astype(np.float32) * 0.3)
        kc = jnp.asarray(rs.randn(B, D).astype(np.float32) * 0.3)
        vc = jnp.asarray(rs.randn(B, D).astype(np.float32) * 0.3)
        # realistic ages incl. dead rows
        age = rs.randint(1, T + 1, size=(B, T)).astype(np.float32)
        age[:, -2:] = 2e9  # dead rows
        return cache, q, kc, vc, jnp.asarray(age)

    def test_matches_einsum_reference(self):
        import numpy as np
        from vap_realtime_tpu.ops.pallas.attend import (
            attend_reference, fused_attend,
        )

        cache, q, kc, vc, age = self._inputs()
        for slot_k, slot_v in [(0, 1), (4, 5)]:
            got = fused_attend(cache, q, kc, vc, age, slot_k=slot_k,
                               slot_v=slot_v, block=8, interpret=True)
            want = attend_reference(cache, q, kc, vc, age, slot_k=slot_k,
                                    slot_v=slot_v)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5)

    def test_pair_matches_einsum_reference(self):
        """fused_attend_pair (the serving kernel: one launch per layer
        phase over one contiguous cache plane) == per-pair reference,
        for BOTH kernel bodies (r3 broadcast and v3 compact-softmax)."""
        import numpy as np
        import jax.numpy as jnp
        from vap_realtime_tpu.ops.pallas.attend import (
            attend_reference, fused_attend_pair,
        )

        cache, q, kc, vc, age = self._inputs()
        q2 = jnp.stack([q, q * 0.5], axis=1)      # distinct twin queries
        kc2 = jnp.stack([kc, kc * 0.7], axis=1)
        vc2 = jnp.stack([vc, vc * 1.3], axis=1)
        for impl in ("bcast", "compact"):
            for pair_base in (0, 2):               # phases 0 and 1
                got = fused_attend_pair(cache, q2, kc2, vc2, age,
                                        pair_base=pair_base, block=8,
                                        interpret=True, impl=impl)
                for s in range(2):
                    pair = pair_base + s
                    want = attend_reference(
                        cache, q2[:, s], kc2[:, s], vc2[:, s], age,
                        slot_k=2 * pair, slot_v=2 * pair + 1)
                    np.testing.assert_allclose(
                        np.asarray(got[:, s]), np.asarray(want),
                        atol=2e-5, err_msg=f"pair {pair} impl {impl}")

    def test_pair_quantized_matches_reference(self):
        """Both kernel bodies on an int8 cache + per-row dequant scales
        == the einsum reference on the dequantized cache."""
        import numpy as np
        import jax.numpy as jnp
        from vap_realtime_tpu.ops.pallas.attend import (
            attend_reference, fused_attend_pair,
        )
        from vap_realtime_tpu.runtime.incremental import quantize_rows

        cache, q, kc, vc, age = self._inputs()
        B, P, T, D4 = cache.shape
        qcache, qscale = quantize_rows(cache)      # (B,P,T,4D) int8, (B,P,T)
        deq = (qcache.astype(jnp.float32)
               * qscale[:, :, :, None]).astype(cache.dtype)
        q2 = jnp.stack([q, q * 0.5], axis=1)
        kc2 = jnp.stack([kc, kc * 0.7], axis=1)
        vc2 = jnp.stack([vc, vc * 1.3], axis=1)
        for impl in ("bcast", "compact"):
            got = fused_attend_pair(qcache, q2, kc2, vc2, age,
                                    scale=qscale[:, 0], pair_base=0,
                                    block=8, interpret=True, impl=impl)
            for s in range(2):
                want = attend_reference(deq, q2[:, s], kc2[:, s],
                                        vc2[:, s], age,
                                        slot_k=2 * s, slot_v=2 * s + 1)
                np.testing.assert_allclose(
                    np.asarray(got[:, s]), np.asarray(want), atol=2e-4,
                    err_msg=f"impl {impl} set {s}")

    def test_all_rows_dead(self):
        """Cold start: only the current position is attendable."""
        import numpy as np
        import jax.numpy as jnp
        from vap_realtime_tpu.ops.pallas.attend import fused_attend

        cache, q, kc, vc, age = self._inputs()
        age = jnp.full_like(age, 2e9)
        got = fused_attend(cache, q, kc, vc, age, slot_k=0, slot_v=1,
                           block=8, interpret=True)
        # softmax collapses onto the current position -> out == v_cur
        np.testing.assert_allclose(np.asarray(got), np.asarray(vc),
                                   atol=2e-5)

    def test_kv_step_pallas_equals_einsum(self):
        """Full kv_step with attend_impl='pallas' (interpret) == einsum."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from vap_realtime_tpu.config import VapConfig
        from vap_realtime_tpu.runtime.incremental import init_kv_state, kv_step
        from vap_realtime_tpu.runtime.streaming import frame_audio
        from vap_realtime_tpu.weights.synthetic import (
            synthetic_audio, synthetic_params,
        )

        cfg = VapConfig(frame_hz=20, context_len_sec=1.0)
        params = synthetic_params(frame_hz=20)
        frames = frame_audio(synthetic_audio(16000), cfg)[:, None]

        step_e = jax.jit(lambda p, s, c: kv_step(p, s, c, cfg))
        step_p = jax.jit(lambda p, s, c: kv_step(p, s, c, cfg,
                                                 attend_impl="pallas"))
        step_3 = jax.jit(lambda p, s, c: kv_step(p, s, c, cfg,
                                                 attend_impl="pallas3"))
        se = sp = s3 = init_kv_state(cfg, 1)
        for f in frames[:6]:
            se, oe = step_e(params, se, jnp.asarray(f))
            sp, op = step_p(params, sp, jnp.asarray(f))
            s3, o3 = step_3(params, s3, jnp.asarray(f))
            for op_i, tag in ((op, "pallas"), (o3, "pallas3")):
                np.testing.assert_allclose(
                    np.asarray(op_i["p_now"]), np.asarray(oe["p_now"]),
                    atol=2e-5, err_msg=tag)
                np.testing.assert_allclose(
                    np.asarray(op_i["vad"]), np.asarray(oe["vad"]),
                    atol=2e-4, err_msg=tag)
        np.testing.assert_allclose(np.asarray(sp.cache),
                                   np.asarray(se.cache), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s3.cache),
                                   np.asarray(se.cache), atol=1e-5)


def test_fused_encoder_matches_streaming_oracle():
    """Fused conv-stack kernel (all modes) == the NCW streaming stack,
    frame by frame with carried state (f32: identical math, fp noise
    only)."""
    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.models.encoder import (
        cpc_conv_stack_streaming, init_conv_stream_state,
        init_cpc_encoder_params,
    )
    from vap_realtime_tpu.ops.pallas.encoder import (
        cpc_conv_stack_streaming_fused, init_conv_stream_state_fused,
    )

    p = init_cpc_encoder_params(jax.random.PRNGKey(0))
    B, L = 4, 800
    new = jnp.asarray(
        np.random.RandomState(0).randn(B, L).astype(np.float32) * 0.1)
    for mode in ("merge8", "taps20"):
        st_n = init_conv_stream_state(B)
        st_f = init_conv_stream_state_fused(B)
        for f in range(3):
            x = new * (1.0 + 0.1 * f)
            zn, st_n = cpc_conv_stack_streaming(p, x, st_n)
            zf, st_f = cpc_conv_stack_streaming_fused(p, x, st_f,
                                                      mode=mode)
            np.testing.assert_allclose(np.asarray(zf), np.asarray(zn),
                                       atol=2e-5, err_msg=f"{mode} f{f}")
        # carry equivalence (both impls store channels-last since r5 —
        # NCW carries paid a 64x lane-padding HBM tax at large B)
        for i in range(5):
            np.testing.assert_allclose(np.asarray(st_f[f"c{i}"]),
                                       np.asarray(st_n[f"c{i}"]),
                                       atol=2e-5, err_msg=f"c{i}")


def test_channel_norm_relu_kernel_matches():
    """One-pass ChannelNorm+ReLU kernel == ops.basic.channel_norm +
    relu on NCW activations."""
    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.ops.basic import channel_norm
    from vap_realtime_tpu.ops.pallas.channorm import channel_norm_relu

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(6, 256, 40).astype(np.float32))
    w = jnp.asarray(rs.randn(256, 1).astype(np.float32))
    b = jnp.asarray(rs.randn(256, 1).astype(np.float32))
    ref = jax.nn.relu(channel_norm(x, w, b))
    got = channel_norm_relu(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_normk_streaming_stack_matches():
    """NCW convs + fused-norm kernel == the plain streaming stack."""
    import jax
    import jax.numpy as jnp

    from vap_realtime_tpu.models.encoder import (
        cpc_conv_stack_streaming, cpc_conv_stack_streaming_normk,
        init_conv_stream_state, init_cpc_encoder_params,
    )

    p = init_cpc_encoder_params(jax.random.PRNGKey(0))
    B, L = 4, 800
    new = jnp.asarray(
        np.random.RandomState(0).randn(B, L).astype(np.float32) * 0.1)
    st_a, st_b = init_conv_stream_state(B), init_conv_stream_state(B)
    for f in range(3):
        x = new * (1.0 + 0.1 * f)
        za, st_a = cpc_conv_stack_streaming(p, x, st_a)
        zb, st_b = cpc_conv_stack_streaming_normk(p, x, st_b)
        np.testing.assert_allclose(np.asarray(zb), np.asarray(za),
                                   atol=1e-5)
        for i in range(5):
            np.testing.assert_allclose(np.asarray(st_b[f"c{i}"]),
                                       np.asarray(st_a[f"c{i}"]),
                                       atol=1e-5)
