"""Native host-side components with automatic numpy fallback.

Build the extension in place with::

    python -m fnft_tpu.native.build

The public functions below transparently use the C++ implementation when
available.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - depends on whether the extension was built
    from fnft_tpu.native import _fnft_native as _ext
except ImportError:
    _ext = None


def have_native() -> bool:
    return _ext is not None


def newton_polygon_init(abs_coeffs: np.ndarray) -> np.ndarray:
    """Bini initial root guesses; C++ when built, numpy otherwise."""
    abs_coeffs = np.ascontiguousarray(abs_coeffs, dtype=np.float64)
    if _ext is not None:
        raw = _ext.newton_polygon_init(abs_coeffs)
        return np.frombuffer(raw, dtype=np.complex128).copy()
    from fnft_tpu.ops.roots import _newton_polygon_init

    return _newton_polygon_init(abs_coeffs)


def read_signal_batch(path: str, d: int, dtype=np.complex64, *,
                      offset_signals: int = 0, count: int = -1) -> np.ndarray:
    """Load a [B, D] batch of complex signals from a raw binary file."""
    dtype = np.dtype(dtype)
    if _ext is not None:
        raw = _ext.read_signal_batch(path, int(d),
                                     dtype == np.complex64,
                                     int(offset_signals), int(count))
        arr = np.frombuffer(raw, dtype=dtype)
    else:
        arr = np.fromfile(path, dtype=dtype)
        arr = arr[offset_signals * d:]
        if count >= 0:
            arr = arr[: count * d]
    b = arr.size // d
    return arr[: b * d].reshape(b, d).copy()
