"""Wire-protocol byte compatibility (reference: rvap/common/util.py)."""

import struct

import numpy as np

from vap_realtime_tpu.io import wire


def _reference_pack_floatarray(arr):
    """Literal reimplementation of the reference's per-sample packing
    (rvap/common/util.py:73-80) to check byte identity."""
    b = b""
    for v in arr:
        b += struct.pack("<d", v)
    return b


def test_audio_roundtrip():
    rs = np.random.RandomState(0)
    a1 = rs.randn(160)
    a2 = rs.randn(160)
    b = wire.conv_2floatarray_2_bytearray(a1, a2)
    assert len(b) == 2560  # README.md:164-186 contract
    r1, r2 = wire.conv_bytearray_2_2floatarray(b)
    np.testing.assert_array_equal(r1, a1)
    np.testing.assert_array_equal(r2, a2)
    # interleaving order [ch1, ch2] per sample
    assert struct.unpack("<d", b[:8])[0] == a1[0]
    assert struct.unpack("<d", b[8:16])[0] == a2[0]


def test_floatarray_bytes_identical_to_reference():
    rs = np.random.RandomState(1)
    arr = rs.randn(17)
    assert wire.conv_floatarray_2_byte(arr) == _reference_pack_floatarray(arr)


def test_vap_result_roundtrip():
    rs = np.random.RandomState(2)
    result = {
        "t": 12.345,
        "x1": rs.randn(800), "x2": rs.randn(800),
        "p_now": [0.3, 0.7], "p_future": [0.4, 0.6],
        "vad": [0.9, 0.1],
    }
    b = wire.serialize_result(result, "vap")
    # layout: 8(t) + 5 x (4 + 8n)
    assert len(b) == 8 + (4 + 800 * 8) * 2 + (4 + 16) * 3
    back = wire.deserialize_result(b, "vap")
    assert back["t"] == result["t"]
    np.testing.assert_allclose(back["p_now"], result["p_now"])
    np.testing.assert_allclose(back["x1"], result["x1"])


def test_bc_nod_result_roundtrip():
    r_bc = {"t": 1.0, "x1": [0.1], "x2": [0.2],
            "p_bc_react": [0.5], "p_bc_emo": [0.25]}
    back = wire.deserialize_result(wire.serialize_result(r_bc, "bc"), "bc")
    assert back["p_bc_emo"] == [0.25]

    r_nod = {"t": 1.0, "x1": [0.1], "x2": [0.2], "p_bc": [0.5],
             "p_nod_short": [0.1], "p_nod_long": [0.2],
             "p_nod_long_p": [0.3]}
    back = wire.deserialize_result(wire.serialize_result(r_nod, "nod"),
                                   "nod")
    assert back["p_nod_long_p"] == [0.3]


def test_framing():
    payload = b"hello world"
    framed = wire.frame_result(payload)
    assert framed[:4] == len(payload).to_bytes(4, "little")
    assert framed[4:] == payload


def test_serialize_results_batch_byte_identical():
    """Vectorized batch serializer == per-dict serialize_result, byte
    for byte, for every mode."""
    import numpy as np

    from vap_realtime_tpu.io import wire

    rs = np.random.RandomState(0)
    n, L = 5, 17
    t = 1234.5678
    for mode, keys in wire._KEYS.items():
        fields = {}
        for k in keys:
            width = L if k in ("x1", "x2") else rs.randint(1, 4)
            fields[k] = rs.randn(n, width)
        got = wire.serialize_results_batch(t, fields, mode)
        for i in range(n):
            payload = {"t": t}
            for k in keys:
                payload[k] = fields[k][i]
            want = wire.frame_result(
                wire.serialize_result(payload, mode))
            assert got[i] == want, (mode, i)
