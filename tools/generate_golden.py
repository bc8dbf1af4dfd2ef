"""Generate golden parity files by running the REFERENCE PyTorch model.

Loads the reference implementation from /root/reference (read-only), feeds
it deterministic synthetic weights + audio from
vap_realtime_tpu.weights.synthetic, and records frame-by-frame outputs and
intermediates into tests/golden/*.npz.  The committed .npz files are what
the test suite compares against, so tests run without torch or the
reference checkout.

Run:  python tools/generate_golden.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vap_realtime_tpu.weights.synthetic import (  # noqa: E402
    synthetic_audio, synthetic_cpc_weights, synthetic_vap_state_dict,
)

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


def setup_reference(ref_root: str):
    sys.path.insert(0, ref_root)
    sys.path.insert(0, os.path.join(ref_root, "rvap", "vap_main"))


def make_checkpoints(tmpdir: str, frame_hz: int, mode: str):
    import torch

    cpc_w = {k: torch.from_numpy(v)
             for k, v in synthetic_cpc_weights().items()}
    cpc_path = os.path.join(tmpdir, "cpc.pt")
    torch.save({"weights": cpc_w}, cpc_path)

    sd = {k: torch.from_numpy(v)
          for k, v in synthetic_vap_state_dict(frame_hz, mode).items()}
    vap_path = os.path.join(tmpdir, f"vap_{frame_hz}_{mode}.pt")
    torch.save(sd, vap_path)
    return vap_path, cpc_path, sd


def run_streaming(frame_hz: int, context_len_sec: float, seconds: float,
                  mode: str, tmpdir: str):
    """Drive the reference VAPRealTime offline loop on synthetic audio."""
    import torch
    import torch.nn as nn
    from vap_main import VAPRealTime

    vap_path, cpc_path, sd = make_checkpoints(tmpdir, frame_hz, mode)
    device = torch.device("cpu")
    rt = VAPRealTime(vap_path, cpc_path, device, frame_hz, context_len_sec)

    # variant heads share the trunk (vap_bc_main.py:137, vap_nod_main.py:137)
    bc_head = nod_head = None
    if mode == "bc":
        bc_head = nn.Linear(256, 3)
        bc_head.weight = nn.Parameter(sd["bc_head.weight"])
        bc_head.bias = nn.Parameter(sd["bc_head.bias"])
    elif mode == "nod":
        nod_head = nn.Linear(256, 4)
        nod_head.weight = nn.Parameter(sd["nod_head.weight"])
        nod_head.bias = nn.Parameter(sd["nod_head.bias"])
        bc_head = nn.Linear(256, 1)
        bc_head.weight = nn.Parameter(sd["bc_head.weight"])
        bc_head.bias = nn.Parameter(sd["bc_head.bias"])

    n_samples = int(seconds * 16000)
    audio = synthetic_audio(n_samples)
    frame = rt.audio_frame_size
    shift = frame - rt.frame_contxt_padding

    outs = {k: [] for k in ("t", "p_now", "p_future", "vad",
                            "p_bc_react", "p_bc_emo", "p_bc",
                            "p_nod_short", "p_nod_long", "p_nod_long_p")}
    embeddings = []
    for i in range(0, n_samples, shift):
        if i + frame > n_samples:
            break
        rt.process_vap(audio[0, i:i + frame].copy(),
                       audio[1, i:i + frame].copy())
        outs["t"].append((i + frame) / 16000.0)
        outs["p_now"].append(list(rt.result_p_now))
        outs["p_future"].append(list(rt.result_p_future))
        outs["vad"].append([float(rt.result_vad[0][0]),
                            float(rt.result_vad[1][0])])
        embeddings.append(rt.e1_context[-1].detach().numpy()[0, 0])

        if mode in ("bc", "nod"):
            with torch.no_grad():
                x1 = torch.cat(rt.e1_context, dim=1)
                x2 = torch.cat(rt.e2_context, dim=1)
                o1 = rt.vap.ar_channel(x1)["x"]
                o2 = rt.vap.ar_channel(x2)["x"]
                out = rt.vap.ar(o1, o2)["x"]
                if mode == "bc":
                    bc = bc_head(out)
                    outs["p_bc_react"].append(
                        float(bc.softmax(dim=-1)[0, -1, 1]))
                    outs["p_bc_emo"].append(
                        float(bc.softmax(dim=-1)[0, -1, 2]))
                else:
                    nod = nod_head(out)
                    outs["p_bc"].append(
                        float(bc_head(out).sigmoid()[0, -1, 0]))
                    outs["p_nod_short"].append(
                        float(nod.softmax(dim=-1)[0, -1, 1]))
                    outs["p_nod_long"].append(
                        float(nod.softmax(dim=-1)[0, -1, 2]))
                    outs["p_nod_long_p"].append(
                        float(nod.softmax(dim=-1)[0, -1, 3]))

    result = {
        "audio": audio,
        "t": np.array(outs["t"], np.float64),
        "p_now": np.array(outs["p_now"], np.float64),
        "p_future": np.array(outs["p_future"], np.float64),
        "vad": np.array(outs["vad"], np.float64),
        "e1": np.stack(embeddings).astype(np.float32),
    }
    for k in ("p_bc_react", "p_bc_emo", "p_bc", "p_nod_short",
              "p_nod_long", "p_nod_long_p"):
        if outs[k]:
            result[k] = np.array(outs[k], np.float64)
    return result


def run_unit_goldens(tmpdir: str):
    """Small tensors for unit-level parity: encoder pieces + trunk."""
    import torch
    from vap_main import VAPRealTime

    vap_path, cpc_path, _sd = make_checkpoints(tmpdir, 20, "vap")
    rt = VAPRealTime(vap_path, cpc_path, torch.device("cpu"), 20, 2.5)
    enc = rt.vap.encoder1

    rs = np.random.RandomState(99)
    chunk = (0.1 * rs.randn(1120)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(chunk)[None, None, :]
        conv_out = enc.encoder.gEncoder(x)           # (1, 256, 7)
        # fresh hidden for a reproducible single-chunk result
        enc.encoder.gAR.hidden = None
        emb = enc(x)                                  # (1, 1, 256)
        enc.encoder.gAR.hidden = None

        T = 50
        e1 = torch.from_numpy(0.3 * rs.randn(1, T, 256).astype(np.float32))
        e2 = torch.from_numpy(0.3 * rs.randn(1, T, 256).astype(np.float32))
        o1 = rt.vap.ar_channel(e1)["x"]
        o2 = rt.vap.ar_channel(e2)["x"]
        out = rt.vap.ar(o1, o2)
        logits = rt.vap.vap_head(out["x"])
        probs = logits.softmax(dim=-1)
        pn = rt.vap.objective.probs_next_speaker_aggregate(probs, 0, 1)
        pf = rt.vap.objective.probs_next_speaker_aggregate(probs, 2, 3)

        # label extraction parity
        vad = torch.from_numpy(
            (rs.rand(2, 200, 2) > 0.5).astype(np.float32))
        labels = rt.vap.objective.get_labels(vad)

    return {
        "chunk": chunk,
        "conv_out": conv_out.numpy()[0],
        "emb": emb.numpy()[0, 0],
        "e1": e1.numpy(), "e2": e2.numpy(),
        "o1": o1.numpy(), "o2": o2.numpy(),
        "trunk_x": out["x"].numpy(),
        "logits": logits.numpy(),
        "p_now": pn.numpy(), "p_future": pf.numpy(),
        "vad_in": vad.numpy(), "labels": labels.numpy(),
    }


def synthetic_vad_batch(n_batch=4, n_frames=1000, frame_hz=50, seed=5):
    """Speech-like alternating VAD with pauses/overlaps/backchannels."""
    rs = np.random.RandomState(seed)
    vad = np.zeros((n_batch, n_frames, 2), np.float32)
    for b in range(n_batch):
        t = 0
        spk = rs.randint(2)
        while t < n_frames:
            dur = rs.randint(frame_hz // 2, 4 * frame_hz)  # 0.5-4 s turns
            vad[b, t:t + dur, spk] = 1.0
            t += dur
            gap = rs.randint(3, frame_hz)                   # 60ms-1s gaps
            # occasional backchannel from the other speaker inside gaps
            if rs.rand() < 0.3:
                bs = t + rs.randint(0, max(gap - 5, 1))
                vad[b, bs:bs + rs.randint(3, frame_hz // 2), 1 - spk] = 1.0
            t += gap
            if rs.rand() < 0.7:
                spk = 1 - spk
    return vad


def run_events_golden(ref_root):
    """Run the reference TurnTakingEvents on deterministic VAD.

    torchaudio is unavailable, so stub the `audio` module that
    train/utils.py imports (only time_to_frames/load_waveform names)."""
    import sys
    import types

    import torch

    train_dir = os.path.join(ref_root, "train")
    fake_audio = types.ModuleType("audio")
    fake_audio.time_to_frames = lambda t, hop_time: int(t / hop_time)
    fake_audio.load_waveform = None
    sys.modules.setdefault("audio", fake_audio)
    sys.path.insert(0, train_dir)
    import events as ref_events  # noqa: E402 (reference train/events.py)

    conf = ref_events.EventConfig(equal_hold_shift=0)
    eventer = ref_events.TurnTakingEvents(conf)
    vad = synthetic_vad_batch()
    out = eventer(torch.from_numpy(vad))

    res = {"vad": vad}
    for key in ("shift", "hold", "long", "pred_shift", "short"):
        for b, regions in enumerate(out[key]):
            res[f"{key}_{b}"] = np.array(sorted(regions),
                                         np.int64).reshape(-1, 3)
    # sampled sets: record counts only (python-random dependent)
    res["n_pred_shift_neg"] = np.array(
        [len(x) for x in out["pred_shift_neg"]])
    res["n_pred_backchannel_neg"] = np.array(
        [len(x) for x in out["pred_backchannel_neg"]])
    res["n_pred_backchannel"] = np.array(
        [len(x) for x in out["pred_backchannel"]])
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()

    setup_reference(args.reference)
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    np.savez(os.path.join(GOLDEN_DIR, "events.npz"),
             **run_events_golden(args.reference))
    print("wrote events.npz")

    with tempfile.TemporaryDirectory() as tmp:
        np.savez(os.path.join(GOLDEN_DIR, "unit.npz"),
                 **run_unit_goldens(tmp))
        print("wrote unit.npz")

        for frame_hz, ctx, mode in [(20, 2.5, "vap"), (10, 5.0, "vap"),
                                    (10, 5.0, "bc"), (10, 5.0, "nod"),
                                    (50, 1.0, "vap")]:
            res = run_streaming(frame_hz, ctx, args.seconds, mode, tmp)
            name = f"stream_{mode}_{frame_hz}hz.npz"
            np.savez(os.path.join(GOLDEN_DIR, name), **res)
            print(f"wrote {name}: {res['p_now'].shape[0]} frames")


if __name__ == "__main__":
    main()
