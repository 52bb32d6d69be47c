"""Build libfnft_tpu.so — the C ABI of the framework.

Usage: python -m fnft_tpu.capi.build [outdir]

Links against the running interpreter's libpython and bakes in this
interpreter path + the package root as defaults (both overridable at
runtime via FNFT_TPU_PYTHON / FNFT_TPU_PKG_ROOT).
"""

from __future__ import annotations

import pathlib
import shlex
import subprocess
import sys
import sysconfig

HERE = pathlib.Path(__file__).resolve().parent
PKG_ROOT = HERE.parents[1]  # directory containing the fnft_tpu package


def lib_path(outdir: pathlib.Path | None = None) -> pathlib.Path:
    return (outdir or HERE) / "libfnft_tpu.so"


def build(outdir: pathlib.Path | None = None, verbose: bool = True) -> pathlib.Path:
    out = lib_path(outdir)
    include = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ldver = sysconfig.get_config_var("LDVERSION") or \
        f"{sys.version_info[0]}.{sys.version_info[1]}"
    cmd = [
        "gcc", "-O2", "-fPIC", "-shared", "-std=c11",
        str(HERE / "fnft_tpu_capi.c"),
        f"-I{include}", f"-I{HERE}",
        f"-DFNFT_TPU_DEFAULT_PYTHON=\"{sys.executable}\"",
        f"-DFNFT_TPU_DEFAULT_PKG_ROOT=\"{PKG_ROOT}\"",
        f"-L{libdir}", f"-Wl,-rpath,{libdir}", f"-lpython{ldver}",
        "-o", str(out),
    ]
    if verbose:
        print(" ".join(shlex.quote(c) for c in cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    outdir = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else None
    print(build(outdir))
