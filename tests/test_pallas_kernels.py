"""Pallas fused early tree levels (interpret mode on the CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

import fnft_tpu.ops.poly as poly
from fnft_tpu.ops.pallas_kernels import fused_tree_levels


@pytest.mark.parametrize("n,c,levels", [(1024, 3, 3), (512, 2, 2)])
def test_fused_levels_match_xla(n, c, levels):
    rng = np.random.default_rng(n + c)
    p = (rng.normal(size=(n, 2, 2, c))
         + 1j * rng.normal(size=(n, 2, 2, c))).astype(np.complex64)
    got = np.asarray(fused_tree_levels(jnp.asarray(p), levels, interpret=True))
    x = jnp.asarray(p)
    for _ in range(levels):
        x = poly._matpoly_product(x[..., 1::2, :, :, :], x[..., 0::2, :, :, :])
    ref = np.asarray(x)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6


def test_fused_tree_end_to_end_complex128():
    """Full tree with the fused stage enabled agrees with the XLA tree to
    double-precision accuracy (conditioning-safe comparison)."""
    rng = np.random.default_rng(7)
    n = 1024
    p = 0.1 * (rng.normal(size=(n, 2, 2, 3)) + 1j * rng.normal(size=(n, 2, 2, 3)))
    poly.set_fused_early_levels(3)
    try:
        r1, w1 = poly.fmult2x2_tree(jnp.asarray(p))
    finally:
        poly.set_fused_early_levels(0)
    r0, w0 = poly.fmult2x2_tree(jnp.asarray(p))
    assert int(w0) == int(w1)
    dev = np.max(np.abs(np.asarray(r0) - np.asarray(r1)))
    assert dev / np.max(np.abs(np.asarray(r0))) < 1e-8
