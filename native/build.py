"""Build the native helpers: python native/build.py [--debug].

Produces sfmx/recon/_sfmx_native.so (ctypes, no pybind11 dependency).
"""
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
OUT = ROOT.parent / "sfmx" / "recon" / "_sfmx_native.so"


def main():
    debug = "--debug" in sys.argv
    flags = ["-O0", "-g"] if debug else ["-O3", "-DNDEBUG"]
    cmd = ["g++", "-std=c++17", "-shared", "-fPIC", *flags,
           str(ROOT / "tracks.cpp"), "-o", str(OUT)]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {OUT}")


if __name__ == "__main__":
    main()
