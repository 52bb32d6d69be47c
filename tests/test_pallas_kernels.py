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


@pytest.mark.parametrize("deg,m", [(700, 700), (1500, 300), (300, 40)])
def test_repulsion_kernel_matches_xla(deg, m):
    """Pallas repulsion sum vs the XLA chunked path (c128 interpret: the
    kernel keeps f64 planes, so agreement is to accumulation order only)."""
    from fnft_tpu.ops.pallas_kernels import repulsion_sum
    from fnft_tpu.ops.roots import _repulsion_chunked

    rng = np.random.default_rng(deg + m)
    z_all = rng.normal(size=deg) + 1j * rng.normal(size=deg)
    idx = np.sort(rng.choice(deg, size=m, replace=False)).astype(np.int32)
    z_t = z_all[idx]
    got = np.asarray(repulsion_sum(jnp.asarray(z_all), jnp.asarray(z_t),
                                   jnp.asarray(idx), interpret=True))
    ref = np.asarray(_repulsion_chunked(jnp.asarray(z_all),
                                        jnp.asarray(z_t),
                                        jnp.asarray(idx), lowprec=False))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / scale < 1e-12


def test_repulsion_kernel_complex64_close():
    """f32-plane kernel vs the c64 XLA low-precision path: same precision
    class, so results agree to f32 accumulation noise."""
    from fnft_tpu.ops.pallas_kernels import repulsion_sum
    from fnft_tpu.ops.roots import _repulsion_chunked

    rng = np.random.default_rng(5)
    deg = 900
    z_all = (rng.normal(size=deg) + 1j * rng.normal(size=deg)).astype(
        np.complex64)
    idx = np.arange(deg, dtype=np.int32)
    got = np.asarray(repulsion_sum(jnp.asarray(z_all), jnp.asarray(z_all),
                                   jnp.asarray(idx), interpret=True))
    ref = np.asarray(_repulsion_chunked(jnp.asarray(z_all),
                                        jnp.asarray(z_all),
                                        jnp.asarray(idx)))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / scale < 1e-5


def test_repulsion_kernel_brute_force_oracle():
    """Direct O(deg^2) oracle including the self-exclusion semantics."""
    from fnft_tpu.ops.pallas_kernels import repulsion_sum

    rng = np.random.default_rng(9)
    deg, m = 97, 23  # deliberately not multiples of the tile sizes
    z_all = rng.normal(size=deg) + 1j * rng.normal(size=deg)
    idx = rng.choice(deg, size=m, replace=False).astype(np.int32)
    z_t = z_all[idx]
    ref = np.array([np.sum(1.0 / (z_t[i] - np.delete(z_all, idx[i])))
                    for i in range(m)])
    got = np.asarray(repulsion_sum(jnp.asarray(z_all), jnp.asarray(z_t),
                                   jnp.asarray(idx), interpret=True))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-12


def test_repulsion_forced_on_full_aberth_run():
    """poly_roots with the kernel forced on (interpret) localizes the same
    roots as the default path on a well-separated polynomial."""
    import fnft_tpu.ops.roots as roots

    rng = np.random.default_rng(13)
    true = rng.normal(size=24) + 1j * rng.normal(size=24)
    coeffs = np.poly(true)[::-1].copy()  # ascending
    # deg < 4096 uses the dense path inside aberth_roots; exercise the
    # chunked entry point directly via a staged sweep block
    z0 = jnp.asarray(roots._newton_polygon_init(np.abs(coeffs)))
    roots.set_pallas_repulsion(True)
    try:
        z, frozen, moved, n = roots._sweep_block(
            jnp.asarray(coeffs), z0, jnp.zeros(24, bool), 60)
    finally:
        roots.set_pallas_repulsion(None)
    got = np.sort_complex(np.asarray(z))
    want = np.sort_complex(true)
    assert np.max(np.abs(got - want)) < 1e-8


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
