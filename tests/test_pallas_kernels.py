"""Pallas fused early tree levels (interpret mode on the CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

import fnft_tpu.ops.poly as poly
from fnft_tpu.ops.pallas_kernels import fused_tree_levels


# NB: levels=3 with c=3 compiles ~2 min in interpret mode on 1 CPU core
# (pure XLA compile of the unrolled products) — CI sticks to cheaper shapes
@pytest.mark.parametrize("n,c,levels", [(1024, 3, 2), (1024, 2, 3)])
def test_fused_levels_match_xla(n, c, levels):
    rng = np.random.default_rng(n + c)
    p = (rng.normal(size=(n, 2, 2, c))
         + 1j * rng.normal(size=(n, 2, 2, c))).astype(np.complex64)
    got, w = fused_tree_levels(jnp.asarray(p), levels, interpret=True)
    got = np.asarray(got)
    assert np.all(np.asarray(w) == 0)
    x = jnp.asarray(p)
    for _ in range(levels):
        x = poly._matpoly_product(x[..., 1::2, :, :, :], x[..., 0::2, :, :, :])
    ref = np.asarray(x)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 5e-6


def test_fused_levels_batched_and_normalized():
    """Leading batch dims + in-kernel per-subtree rescaling: stored * 2**w
    must reproduce the unnormalized product, with max|stored| in [1, 2)."""
    rng = np.random.default_rng(3)
    b, n, c, levels = 3, 512, 2, 2
    p = (rng.normal(size=(b, n, 2, 2, c))
         + 1j * rng.normal(size=(b, n, 2, 2, c))).astype(np.complex64)
    got, w = fused_tree_levels(jnp.asarray(p), levels, normalize=True,
                               interpret=True)
    got, w = np.asarray(got), np.asarray(w)
    assert got.shape[:2] == (b, n >> levels) and w.shape == (b, n >> levels)
    raw, w0 = fused_tree_levels(jnp.asarray(p), levels, interpret=True)
    raw = np.asarray(raw)
    restored = got * np.exp2(w)[..., None, None, None]
    assert np.max(np.abs(restored - raw)) / np.max(np.abs(raw)) < 5e-6
    mx = np.max(np.abs(np.stack([got.real, got.imag])), axis=(0, -3, -2, -1))
    assert np.all((mx >= 1.0) & (mx < 2.0))


def test_fused_tree_end_to_end_complex128():
    """Full tree with the fused stage enabled agrees with the XLA tree to
    double-precision accuracy (conditioning-safe comparison)."""
    rng = np.random.default_rng(7)
    n = 1024
    p = 0.1 * (rng.normal(size=(n, 2, 2, 3)) + 1j * rng.normal(size=(n, 2, 2, 3)))
    poly.set_fused_early_levels(2)
    try:
        r1, w1 = poly.fmult2x2_tree(jnp.asarray(p))
    finally:
        poly.set_fused_early_levels(None)
    r0, w0 = poly.fmult2x2_tree(jnp.asarray(p))
    assert int(w0) == int(w1)
    dev = np.max(np.abs(np.asarray(r0) - np.asarray(r1)))
    assert dev / np.max(np.abs(np.asarray(r0))) < 1e-8


def test_fused_tree_batched_matches_unbatched():
    """complex128: a random 512-matrix product amplifies f32 rounding by
    its Lyapunov growth (~1e-2 rel either path), so the layout-equality
    check runs in f64 where both orderings agree to ~1e-11."""
    rng = np.random.default_rng(11)
    b, n = 2, 512
    p = 0.3 * (rng.normal(size=(b, n, 2, 2, 2))
               + 1j * rng.normal(size=(b, n, 2, 2, 2)))
    poly.set_fused_early_levels(2)
    try:
        rb, wb = poly.fmult2x2_tree(jnp.asarray(p))
        r0, w0 = poly.fmult2x2_tree(jnp.asarray(p[0]))
    finally:
        poly.set_fused_early_levels(None)
    np.testing.assert_allclose(np.asarray(rb[0]), np.asarray(r0),
                               rtol=1e-8, atol=1e-9)
    assert int(wb[0]) == int(w0)
