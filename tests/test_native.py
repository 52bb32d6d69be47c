"""Native extension: build (if needed), equivalence with Python fallback."""

import importlib
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native():
    import fnft_tpu.native as nat

    if not nat.have_native():
        try:
            subprocess.run([sys.executable, "-m", "fnft_tpu.native.build"],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:  # no toolchain: fall back silently
            pytest.skip(f"cannot build native extension: {e}")
        importlib.reload(nat)
    if not nat.have_native():
        pytest.skip("native extension unavailable")
    return nat


def test_newton_polygon_matches_python(native):
    from fnft_tpu.ops.roots import _newton_polygon_init

    rng = np.random.default_rng(7)
    for n in (8, 65, 301):
        c = np.abs(rng.normal(size=n) * 10.0 ** rng.integers(-6, 6, size=n))
        c[rng.integers(0, n, size=2)] = 0.0  # exercise zero coefficients
        z_c = np.sort_complex(native.newton_polygon_init(c))
        z_py = np.sort_complex(_newton_polygon_init(c))
        np.testing.assert_allclose(z_c, z_py, rtol=1e-12)


def test_signal_batch_loader(native, tmp_path):
    rng = np.random.default_rng(3)
    q = (rng.normal(size=(7, 32)) + 1j * rng.normal(size=(7, 32)))
    for dtype in (np.complex64, np.complex128):
        path = tmp_path / f"sig_{np.dtype(dtype).name}.bin"
        q.astype(dtype).tofile(path)
        back = native.read_signal_batch(str(path), 32, dtype)
        assert back.shape == (7, 32)
        np.testing.assert_array_equal(back, q.astype(dtype))
        part = native.read_signal_batch(str(path), 32, dtype,
                                        offset_signals=3, count=2)
        np.testing.assert_array_equal(part, q.astype(dtype)[3:5])
