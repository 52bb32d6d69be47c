"""Build the native extension in place: ``python -m fnft_tpu.native.build``."""

from __future__ import annotations

import pathlib
import subprocess
import sys
import sysconfig


def build() -> pathlib.Path:
    here = pathlib.Path(__file__).parent
    src = here / "_fnft_native.cpp"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = here / f"_fnft_native{suffix}"
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", str(src), "-o", str(out),
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}", file=sys.stderr)
