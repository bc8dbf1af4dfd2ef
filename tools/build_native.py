"""Build the native components (g++ -> .so next to the sources).

Run: python tools/build_native.py
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")


def build() -> str:
    src = os.path.join(NATIVE, "ingest.cpp")
    out = os.path.join(NATIVE, "libvapingest.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) > os.path.getmtime(src)):
        return out
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           src, "-o", out]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print(build())
