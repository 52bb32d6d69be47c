"""C ABI of the framework (mirrors the reference's public C drivers).

``python -m fnft_tpu.capi.build`` produces ``libfnft_tpu.so``; C callers
include ``fnft_tpu.h`` (this directory) and link against it. See the
header for the contract and tests/test_capi.py for usage from both
ctypes and a standalone embedded-interpreter C program.
"""

from __future__ import annotations

import pathlib

HERE = pathlib.Path(__file__).resolve().parent


def lib_path() -> pathlib.Path:
    return HERE / "libfnft_tpu.so"


def header_path() -> pathlib.Path:
    return HERE / "fnft_tpu.h"


def have_capi() -> bool:
    return lib_path().exists()
