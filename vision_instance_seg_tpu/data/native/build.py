"""Build the native RLE codec: gcc -O3 -shared -> libmaskapi.so.

Usage: ``python -m vision_instance_seg_tpu.data.native.build``
(also invoked lazily on first import of the native wrapper).
"""

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "maskapi.c"
LIB = HERE / "libmaskapi.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force \
            and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = ["gcc", "-O3", "-march=native", "-shared", "-fPIC",
           str(SRC), "-o", str(LIB)]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
