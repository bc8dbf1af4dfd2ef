"""Real-checkpoint parity: reproduce the reference's committed golden
output (rvap/vap_main/output_offline.txt, 5312 frames of p_now/p_future
at 20 Hz / 2.5 s context on the bundled jpn WAV pair) with the REAL
published weights, frame by frame.

Pipeline:
1. resolve checkpoints — --vap_pt/--cpc_pt paths, else download
   `maai-kyoto/vap_jp / vap_state_dict_jp_20hz_2500msec.pt` from the HF
   hub (vap_realtime/util.py:4-69) and the CPC 60k checkpoint from
   fbaipublicfiles (encoder_components.py:370-404);
2. convert the torch state_dicts to the framework pytree
   (weights/convert.py — includes the reference's manual downsample
   re-assignment, vap_main.py:203-212);
3. run the parity-exact offline path (runtime/offline.py, --engine_path
   full) over the jpn sample WAVs (reference input/wav_sample/);
4. diff every row against the committed golden CSV at --atol (1e-4).

Writes PARITY_REPORT.json next to the repo root and prints a summary.

Run: python tools/parity_real.py
     python tools/parity_real.py --vap_pt x.pt --cpc_pt cpc.pt \
         --wav_left jpn_inoue_16k.wav --wav_right jpn_sumida_16k.wav

Offline status (round 2, 2026-08-20): this environment has NO network
egress (DNS resolution fails) and the reference snapshot strips every
large blob (.MISSING_LARGE_BLOBS lists all .pt checkpoints and sample
WAVs), so steps 1 and 3 cannot acquire inputs here; the failure record
lives in PARITY.md.  The tool degrades with explicit per-step errors
and exits 2 when inputs are unavailable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPC_URL = ("https://dl.fbaipublicfiles.com/librilight/CPC_checkpoints/"
           "60k_epoch4-d0f474de.pt")
GOLDEN_DEFAULT = "/root/reference/rvap/vap_main/output_offline.txt"
WAV_LEFT_DEFAULT = "/root/reference/input/wav_sample/jpn_inoue_16k.wav"
WAV_RIGHT_DEFAULT = "/root/reference/input/wav_sample/jpn_sumida_16k.wav"


def resolve_vap_checkpoint(path: str | None, cache_dir: str) -> str:
    if path:
        if not os.path.exists(path):
            raise FileNotFoundError(f"--vap_pt {path} does not exist")
        return path
    from vap_realtime_tpu.api import load_vap_model
    print("downloading maai-kyoto/vap_jp vap_state_dict_jp_20hz_2500msec.pt"
          " from the HF hub ...")
    return load_vap_model("vap", 20, 2.5, "jp", cache_dir=cache_dir)


def resolve_cpc_checkpoint(path: str | None, cache_dir: str) -> str:
    if path:
        if not os.path.exists(path):
            raise FileNotFoundError(f"--cpc_pt {path} does not exist")
        return path
    dst = os.path.join(cache_dir, "60k_epoch4-d0f474de.pt")
    if os.path.exists(dst):
        return dst
    os.makedirs(cache_dir, exist_ok=True)
    print(f"downloading {CPC_URL} ...")
    urllib.request.urlretrieve(CPC_URL, dst)
    return dst


def parse_golden_csv(path: str):
    import numpy as np

    rows = []
    with open(path) as f:
        next(f)  # header
        for line in f:
            rows.append([float(x) for x in line.strip().split(",")])
    a = np.asarray(rows)
    return {"t": a[:, 0], "p_now": a[:, 1:3], "p_future": a[:, 3:5]}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vap_pt", default=None)
    ap.add_argument("--cpc_pt", default=None)
    ap.add_argument("--wav_left", default=WAV_LEFT_DEFAULT)
    ap.add_argument("--wav_right", default=WAV_RIGHT_DEFAULT)
    ap.add_argument("--golden", default=GOLDEN_DEFAULT)
    ap.add_argument("--atol", type=float, default=1e-4)
    ap.add_argument("--cache_dir",
                    default=os.path.expanduser("~/.cache/vap_parity"))
    ap.add_argument("--report", default=os.path.join(REPO,
                                                     "PARITY_REPORT.json"))
    args = ap.parse_args(argv)

    report = {"status": "incomplete", "steps": {}}

    def record(step, ok, detail):
        report["steps"][step] = {"ok": ok, "detail": detail}
        print(f"[{'ok' if ok else 'FAIL'}] {step}: {detail}")
        if not ok:
            report["status"] = f"blocked at {step}"
            with open(args.report, "w") as f:
                json.dump(report, f, indent=2)
            print(f"report written to {args.report}")

    # 1. checkpoints
    try:
        vap_pt = resolve_vap_checkpoint(args.vap_pt, args.cache_dir)
        cpc_pt = resolve_cpc_checkpoint(args.cpc_pt, args.cache_dir)
        record("checkpoints", True, f"{vap_pt} + {cpc_pt}")
    except Exception as e:  # noqa: BLE001 - report any acquisition failure
        record("checkpoints", False, f"{type(e).__name__}: {e}")
        return 2

    # 2. inputs
    missing = [p for p in (args.wav_left, args.wav_right, args.golden)
               if not os.path.exists(p)]
    if missing:
        record("inputs", False, f"missing: {missing} (stripped from the "
               "reference snapshot; pass --wav_left/--wav_right/--golden)")
        return 2
    record("inputs", True, f"{args.wav_left}, {args.wav_right}")

    # 3. convert + run the parity-exact offline path
    import numpy as np

    from vap_realtime_tpu.config import VapConfig
    from vap_realtime_tpu.io.audio import read_wav
    from vap_realtime_tpu.runtime.offline import run_offline
    from vap_realtime_tpu.weights.convert import load_torch_checkpoint

    cfg = VapConfig(frame_hz=20, context_len_sec=2.5)
    params = load_torch_checkpoint(vap_pt, cpc_pt, cfg.channel_layers,
                                   cfg.cross_layers)
    record("convert", True, "torch state_dicts -> pytree")

    left, rate_l = read_wav(args.wav_left)
    right, rate_r = read_wav(args.wav_right)
    assert rate_l == rate_r == 16000
    n = min(len(left), len(right))
    audio = np.stack([left[:n], right[:n]]).astype(np.float32)
    outs = run_offline(params, audio, cfg, path="full")
    record("run", True, f"{len(outs['t'])} frames")

    # 4. frame-by-frame diff
    golden = parse_golden_csv(args.golden)
    F = min(len(outs["t"]), len(golden["t"]))
    diffs = {}
    ok = True
    for key in ("p_now", "p_future"):
        d = np.abs(np.asarray(outs[key][:F]) - golden[key][:F])
        diffs[key] = {"max": float(d.max()), "mean": float(d.mean()),
                      "frames": int(F)}
        ok &= bool(d.max() <= args.atol)
    report["diffs"] = diffs
    report["atol"] = args.atol
    report["status"] = "parity ok" if ok else "PARITY FAILED"
    record("diff", ok, json.dumps(diffs))
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report written to {args.report}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
