"""Library Vap API: wav-driven end-to-end with the KV engine."""

import numpy as np

from tests.conftest import load_golden_stream
from vap_realtime_tpu.api import Vap, hf_checkpoint_file
from vap_realtime_tpu.io.audio import write_wav
from vap_realtime_tpu.io.sources import Wav
from vap_realtime_tpu.weights.synthetic import synthetic_params


def test_hf_checkpoint_names():
    assert hf_checkpoint_file("vap", 20, 2.5, "jp") == (
        "maai-kyoto/vap_jp", "vap_state_dict_jp_20hz_2500msec.pt")
    assert hf_checkpoint_file("vap", 10, 5.0, "en") == (
        "maai-kyoto/vap_en", "vap_state_dict_eng_10hz_5000msec.pt")
    assert hf_checkpoint_file("bc", 10, 5.0) == (
        "maai-kyoto/vap_bc_jp", "vap-bc_state_dict_erica_10hz_5000msec.pt")
    assert hf_checkpoint_file("nod", 20, 3.0) == (
        "maai-kyoto/vap_nod_jp", "vap-nod_state_dict_erica_20hz_3000msec.pt")


def test_vap_library_end_to_end(tmp_path):
    golden = load_golden_stream("stream_vap_20hz.npz")
    audio = golden["audio"]
    left = str(tmp_path / "l.wav")
    right = str(tmp_path / "r.wav")
    write_wav(left, audio[0], 16000)
    write_wav(right, audio[1], 16000)

    vap = Vap(mode="vap", frame_rate=20, context_len_sec=2.5,
              mic1=Wav(left, realtime=False), mic2=Wav(right, realtime=False),
              params=synthetic_params(20), engine_path="kv")
    vap.start_process()
    results = [vap.get_result() for _ in range(10)]
    vap.stop_process()
    assert vap._thread is None  # worker joined: clean interpreter exit

    assert all("p_now" in r and "p_future" in r and "vad" in r
               for r in results)
    got = np.array([r["p_now"] for r in results])
    # library worker prepends 320 zero samples (reference model.py:98-100),
    # same alignment as the server; KV engine is exact pre-slide, WAV is
    # 16-bit quantized -> compare loosely against the offline golden trend
    assert got.shape == (10, 2)
    assert np.all((got > 0.3) & (got < 0.7))
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-3)
