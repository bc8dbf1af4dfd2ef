"""End-to-end proof of the real-checkpoint parity tool.

The published weights cannot be downloaded here (no egress; PARITY.md),
so this closes the loop structurally: reference-format synthetic .pt
checkpoints + WAVs + a golden CSV produced by the REAL reference
implementation (tools/make_synthetic_parity_fixture.py, subprocess),
then `tools/parity_real.py` must convert, run the parity-exact offline
path, and report frame-by-frame parity at atol 1e-4 — exactly what it
will do against output_offline.txt once the real checkpoints are
reachable.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tools", "make_synthetic_parity_fixture.py")


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference snapshot not available")
def test_parity_real_pipeline(tmp_path):
    out = str(tmp_path / "fixture")
    r = subprocess.run([sys.executable, FIXTURE, out, "4.0"],
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode(errors="replace")[-2000:]

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import parity_real

    report = str(tmp_path / "report.json")
    rc = parity_real.main([
        "--vap_pt", os.path.join(out, "vap_20_vap.pt"),
        "--cpc_pt", os.path.join(out, "cpc.pt"),
        "--wav_left", os.path.join(out, "l.wav"),
        "--wav_right", os.path.join(out, "r.wav"),
        "--golden", os.path.join(out, "golden.csv"),
        "--report", report,
    ])
    assert rc == 0
    rep = json.load(open(report))
    assert rep["status"] == "parity ok"
    assert rep["diffs"]["p_now"]["max"] <= 1e-4
    assert rep["diffs"]["p_now"]["frames"] >= 70
