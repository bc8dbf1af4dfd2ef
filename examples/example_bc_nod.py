"""Backchannel + nodding head smoke over the sample WAVs.

Reference analogues: test_scripts/test_vap_bc_module_wav_mic.py and
test_vap_nod_module_wav_mic.py (WAV source instead of a microphone; for
a real mic pass `--mic` and the bc/nod channel layout is applied:
system = channel 1, user mic = channel 2, mic_bc.py:72-74).

Run: python examples/example_bc_nod.py --mode bc|nod [--mic]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vap_realtime_tpu.api import Vap  # noqa: E402
from vap_realtime_tpu.io.sources import Mic, Wav, Zero  # noqa: E402
from vap_realtime_tpu.weights.synthetic import synthetic_params  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["bc", "nod"], default="bc")
    ap.add_argument("--mic", action="store_true",
                    help="use a real microphone as the user channel")
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    # bc/nod predict channel-1 (system) behaviour given the user on
    # channel 2 — so the live source goes on mic2
    user = Mic() if args.mic else Wav(
        os.path.join(REPO, "sample/sample_ch2_16k.wav"))
    vap = Vap(mode=args.mode, frame_rate=10, context_len_sec=5.0,
              mic1=Zero(), mic2=user,
              params=synthetic_params(10, mode=args.mode))
    vap.start_process()
    for _ in range(args.frames):
        r = vap.get_result()
        if args.mode == "bc":
            print(f"t={r['t']:.2f} p_bc_react={r['p_bc_react']:.3f} "
                  f"p_bc_emo={r['p_bc_emo']:.3f}")
        else:
            print(f"t={r['t']:.2f} p_bc={r['p_bc']:.3f} "
                  f"short={r['p_nod_short']:.3f} "
                  f"long={r['p_nod_long']:.3f} "
                  f"long_p={r['p_nod_long_p']:.3f}")


if __name__ == "__main__":
    main()
    # daemon source threads may be blocked in socket/jax calls; exit
    # hard to avoid noisy interpreter-teardown aborts
    os._exit(0)
