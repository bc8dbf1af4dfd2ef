"""Loopback TCP smoke: two TCPTransmitter sources -> two TCPReceiver
inputs -> Vap, exercising the full wire path in-process.

Reference analogue: test_scripts/test_vap_module_2tcp.py.

Run: python examples/example_vap_2tcp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vap_realtime_tpu.api import Vap  # noqa: E402
from vap_realtime_tpu.io.sources import (  # noqa: E402
    TCPReceiver, TCPTransmitter, Wav,
)
from vap_realtime_tpu.weights.synthetic import synthetic_params  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rx1 = TCPReceiver(port=51007, channel=0)
    rx2 = TCPReceiver(port=51008, channel=0)
    rx1.start_process()
    rx2.start_process()
    time.sleep(0.2)

    tx1 = TCPTransmitter(
        Wav(os.path.join(REPO, "sample/sample_ch1_16k.wav")), port=51007)
    tx2 = TCPTransmitter(
        Wav(os.path.join(REPO, "sample/sample_ch2_16k.wav")), port=51008)
    tx1.start_process()
    tx2.start_process()

    vap = Vap(mode="vap", frame_rate=20, context_len_sec=2.5,
              mic1=rx1, mic2=rx2, params=synthetic_params(20))
    vap.start_process()
    for _ in range(40):
        r = vap.get_result()
        print(f"t={r['t']:.2f} p_now=({r['p_now'][0]:.3f},"
              f"{r['p_now'][1]:.3f})")


if __name__ == "__main__":
    main()
    # daemon source threads may be blocked in socket/jax calls; exit
    # hard to avoid noisy interpreter-teardown aborts
    os._exit(0)
