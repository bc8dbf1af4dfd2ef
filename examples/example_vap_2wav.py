"""Library API smoke: two WAV files -> live p_now / p_future stream.

Reference analogue: test_scripts/test_vap_module_2wav.py (console output
instead of the Tkinter plot).

Run: python examples/example_vap_2wav.py [--checkpoint_npz w.npz]
     (falls back to deterministic synthetic weights)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vap_realtime_tpu.api import Vap  # noqa: E402
from vap_realtime_tpu.io.sources import Wav  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint_npz", default=None)
    ap.add_argument("--wav1",
                    default=os.path.join(REPO, "sample/sample_ch1_16k.wav"))
    ap.add_argument("--wav2",
                    default=os.path.join(REPO, "sample/sample_ch2_16k.wav"))
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    params = None
    if not args.checkpoint_npz:
        from vap_realtime_tpu.weights.synthetic import synthetic_params
        params = synthetic_params(20)

    vap = Vap(mode="vap", frame_rate=20, context_len_sec=2.5,
              mic1=Wav(args.wav1), mic2=Wav(args.wav2),
              checkpoint_npz=args.checkpoint_npz, params=params)
    vap.start_process()
    for _ in range(args.frames):
        r = vap.get_result()
        print(f"t={r['t']:.2f} p_now=({r['p_now'][0]:.3f},"
              f"{r['p_now'][1]:.3f}) p_future=({r['p_future'][0]:.3f},"
              f"{r['p_future'][1]:.3f}) vad=({r['vad'][0]:.2f},"
              f"{r['vad'][1]:.2f})")


if __name__ == "__main__":
    main()
    # daemon source threads may be blocked in socket/jax calls; exit
    # hard to avoid noisy interpreter-teardown aborts
    os._exit(0)
