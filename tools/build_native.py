#!/usr/bin/env python3
"""Build libslam_native.so (native telemetry + map loader).

No zmq headers ship in this image; the library declares the libzmq ABI
itself and links the runtime .so directly. Idempotent: skips the build if
the output is newer than the source.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "slam_native.cpp")
OUT = os.path.join(ROOT, "native", "libslam_native.so")


def build(force: bool = False) -> str | None:
    """Compile the native library; returns its path or None on failure."""
    if not force and os.path.exists(OUT) and \
            os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    libzmq = None
    for cand in ("/lib/x86_64-linux-gnu/libzmq.so.5",
                 "/usr/lib/x86_64-linux-gnu/libzmq.so.5",
                 "/usr/lib/libzmq.so.5"):
        if os.path.exists(cand):
            libzmq = cand
            break
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", OUT, SRC]
    if libzmq:
        cmd.append(libzmq)
    else:
        cmd.append("-lzmq")
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        err = getattr(e, "stderr", str(e))
        print(f"native build failed: {err}", file=sys.stderr)
        return None
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    sys.exit(0 if path else 1)
