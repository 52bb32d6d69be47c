"""Double-float (float32-pair) arithmetic: the TPU high-precision path."""

import numpy as np
import jax.numpy as jnp

import fnft_tpu.ops.poly as poly
from fnft_tpu.ops.df64 import (
    cdf_from_c128,
    cdf_to_c128,
    df_add,
    df_from_f64,
    df_mul,
    df_to_f64,
    fft_df64,
    fmult2x2_tree_df64,
)


def test_df_primitives():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=512))
    y = jnp.asarray(rng.normal(size=512))
    add = df_to_f64(df_add(df_from_f64(x), df_from_f64(y)))
    mul = df_to_f64(df_mul(df_from_f64(x), df_from_f64(y)))
    assert float(jnp.max(jnp.abs(add - (x + y)))) < 5e-14
    assert float(jnp.max(jnp.abs(mul - (x * y)))) < 5e-14


def test_df64_fft_double_precision_class():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(3, 256)) + 1j * rng.normal(size=(3, 256))
    got = np.asarray(cdf_to_c128(fft_df64(cdf_from_c128(jnp.asarray(z)), 256)))
    ref = np.fft.fft(z, axis=-1)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-13
    back = np.asarray(cdf_to_c128(fft_df64(cdf_from_c128(jnp.asarray(ref)),
                                           256, inverse=True)))
    assert np.max(np.abs(back - z)) / np.max(np.abs(z)) < 1e-13


def test_df64_tree_beats_complex64_by_orders():
    rng = np.random.default_rng(2)
    n, c = 128, 3
    p = 0.5 * (rng.normal(size=(n, 2, 2, c)) + 1j * rng.normal(size=(n, 2, 2, c)))
    r_df, w_df = fmult2x2_tree_df64(jnp.asarray(p))
    r64, w64 = poly.fmult2x2_tree(jnp.asarray(p))
    r32, w32 = poly.fmult2x2_tree(jnp.asarray(p.astype(np.complex64)))
    assert int(w_df) == int(w64)
    scale = np.max(np.abs(np.asarray(r64)))
    dev_df = np.max(np.abs(np.asarray(r_df) - np.asarray(r64))) / scale
    dev_32 = np.max(np.abs(np.asarray(r32).astype(complex)
                           * 2.0 ** float(int(w32) - int(w64))
                           - np.asarray(r64))) / scale
    assert dev_df < 1e-11, dev_df
    assert dev_df < 1e-4 * max(dev_32, 1e-30)  # orders-of-magnitude win
