"""Build a synthetic-weights parity fixture for tools/parity_real.py.

Creates, in OUTDIR:
- vap_20_vap.pt / cpc.pt — reference-format torch checkpoints with the
  deterministic synthetic weights (weights/synthetic.py)
- l.wav / r.wav — 16-bit synthetic audio pair
- golden.csv — the REFERENCE implementation's offline output on exactly
  the audio read back from those WAVs (vap_offline.py CSV format,
  rvap/vap_main/vap_offline.py:39-88)

tests/test_parity_tool.py runs this in a subprocess and then asserts
that `parity_real.py --vap_pt ... --golden ...` reports parity — proving
the whole real-checkpoint parity pipeline (convert -> offline run ->
frame diff) end-to-end; only the published weights themselves are
missing in this environment (see PARITY.md).

Run: python tools/make_synthetic_parity_fixture.py OUTDIR [seconds]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    outdir = sys.argv[1]
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    ref_root = sys.argv[3] if len(sys.argv) > 3 else "/root/reference"
    os.makedirs(outdir, exist_ok=True)

    from generate_golden import make_checkpoints, setup_reference
    from vap_realtime_tpu.io.audio import read_wav, write_wav
    from vap_realtime_tpu.weights.synthetic import synthetic_audio

    vap_pt, cpc_pt, _sd = make_checkpoints(outdir, 20, "vap")

    audio = synthetic_audio(int(seconds * 16000))
    write_wav(os.path.join(outdir, "l.wav"), audio[0], 16000)
    write_wav(os.path.join(outdir, "r.wav"), audio[1], 16000)
    # read BACK so the reference sees exactly the quantized samples the
    # parity tool will read
    left, _ = read_wav(os.path.join(outdir, "l.wav"))
    right, _ = read_wav(os.path.join(outdir, "r.wav"))

    setup_reference(ref_root)
    import torch
    from vap_main import VAPRealTime

    rt = VAPRealTime(vap_pt, cpc_pt, torch.device("cpu"), 20, 2.5)
    frame = rt.audio_frame_size
    shift = frame - rt.frame_contxt_padding
    n = min(len(left), len(right))

    csv = os.path.join(outdir, "golden.csv")
    with open(csv, "w") as f:
        f.write("time_sec,p_now(0=left),p_now(1=right),"
                "p_future(0=left),p_future(1=right)\n")
        for i in range(0, n, shift):
            if i + frame > n:
                break
            rt.process_vap(left[i:i + frame].astype(np.float64).copy(),
                           right[i:i + frame].astype(np.float64).copy())
            t = (i + frame) / 16000.0
            f.write(f"{t},{rt.result_p_now[0]},{rt.result_p_now[1]},"
                    f"{rt.result_p_future[0]},{rt.result_p_future[1]}\n")
    print(f"fixture written to {outdir} ({csv})")


if __name__ == "__main__":
    main()
