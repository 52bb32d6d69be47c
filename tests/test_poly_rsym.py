"""Real-coefficient (rsym) value tree: KdV invariants and equivalence.

KdV transfer matrices (r = -1 with a real potential, reference
fnft__kdv_fscatter.c:36-83) have all-real polynomial coefficients, a
property closed under matrix products.  The tree's ``rsym`` mode carries
conjugate-symmetric half grids (rfft layout) — these tests pin (a) the
realness of the base matrices per fast scheme, (b) equivalence of the
rsym path against the generic tree including ``want`` selection and the
normalization exponents, and (c) that the KdV driver path (which now
passes ``rsym``) is unchanged end-to-end.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fnft_tpu.models.discretization import Discretization, degree, is_fast
from fnft_tpu.ops.fscatter import fscatter, transfer_matrix_coeffs
from fnft_tpu.ops.poly import fmult2x2_tree

FAST = [d for d in Discretization if is_fast(d)]


def _random_u(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=n) * 0.7


@pytest.mark.parametrize("disc", FAST)
def test_kdv_base_matrices_are_real(disc):
    u = jnp.asarray(_random_u(16))
    p = np.asarray(transfer_matrix_coeffs(u.astype(jnp.complex128),
                                          -jnp.ones(16, jnp.complex128),
                                          0.13, disc))
    scale = np.max(np.abs(p))
    assert np.max(np.abs(p.imag)) < 1e-14 * scale, disc


@pytest.mark.parametrize("disc", [Discretization.SPLIT2A,
                                  Discretization.SPLIT4B,
                                  Discretization.SPLIT4B4,
                                  Discretization.SPLIT7A])
def test_rsym_tree_matches_generic(disc):
    n = 128 // max(1, degree(disc) // 8)  # keep SPLIT7A affordable
    u = jnp.asarray(_random_u(n, seed=7), dtype=jnp.complex128)
    p = transfer_matrix_coeffs(u, -jnp.ones_like(u), 0.09, disc)
    for want in (None, ((0, 0), (1, 0)), ((0, 0), (0, 1))):
        ref, w_ref = fmult2x2_tree(p, want=want)
        sym, w_sym = fmult2x2_tree(p, want=want, rsym=True)
        ref, sym = np.asarray(ref), np.asarray(sym)
        err = np.max(np.abs(ref - sym)) / np.max(np.abs(ref))
        assert err < 5e-14, (disc, want, err)
        assert np.array_equal(np.asarray(w_ref), np.asarray(w_sym))
        assert np.iscomplexobj(sym)  # contract: complex out for consumers


def test_rsym_tree_batched_and_normalize_off():
    us = jnp.asarray(np.stack([_random_u(64, seed=s) for s in range(3)]),
                     dtype=jnp.complex128)
    p = transfer_matrix_coeffs(us, -jnp.ones_like(us), 0.12,
                               Discretization.SPLIT4B)
    ref, _ = fmult2x2_tree(p, normalize=False)
    sym, w = fmult2x2_tree(p, normalize=False, rsym=True)
    err = np.max(np.abs(np.asarray(ref) - np.asarray(sym)))
    assert err < 5e-13 * np.max(np.abs(np.asarray(ref)))
    assert np.all(np.asarray(w) == 0)


def test_rsym_non_power_of_two():
    # identity padding is real, so rsym stays valid off powers of two
    u = jnp.asarray(_random_u(48, seed=11), dtype=jnp.complex128)
    p = transfer_matrix_coeffs(u, -jnp.ones_like(u), 0.1,
                               Discretization.SPLIT4B)
    ref, w_ref = fmult2x2_tree(p)
    sym, w_sym = fmult2x2_tree(p, rsym=True)
    err = np.max(np.abs(np.asarray(ref) - np.asarray(sym)))
    assert err < 5e-13 * np.max(np.abs(np.asarray(ref)))
    assert np.array_equal(np.asarray(w_ref), np.asarray(w_sym))


def test_kdv_fscatter_passes_rsym_for_real_input():
    """kdv_fscatter flags real potentials; result matches the generic tree."""
    from fnft_tpu.models.kdvv import kdv_fscatter

    u = _random_u(256, seed=3)
    disc = Discretization.SPLIT2A
    got, w_got = kdv_fscatter(u, 0.05, disc)
    q = jnp.asarray(u, dtype=jnp.complex128)
    ref, w_ref = fscatter(q, -jnp.ones_like(q), 0.05, disc)
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    assert err < 5e-13 * np.max(np.abs(np.asarray(ref)))
    assert np.array_equal(np.asarray(w_got), np.asarray(w_ref))


def test_kdvv_driver_rsym_vs_generic_tree():
    """End-to-end: the KdV driver (real input -> rsym tree) reproduces the
    generic-tree driver output on the sech^2 case of
    fnft__kdvv_testcases.c."""
    import scipy.special as sp

    import fnft_tpu as ft
    from fnft_tpu.ops import poly

    d = 1024
    t_span = (-16.0, 15.0)
    t = np.linspace(*t_span, d)
    q = 3.2 / np.cosh(t) ** 2
    xi_span = (-3.55, 3.95)
    res = ft.kdvv(jnp.asarray(q), t_span, m=16, xi_span=xi_span)
    try:
        poly.set_value_tree(False)
        ref = ft.kdvv(jnp.asarray(q), t_span, m=16, xi_span=xi_span)
    finally:
        poly.set_value_tree(None)
    a = np.asarray(res.reflection_coefficient)
    b = np.asarray(ref.reflection_coefficient)
    assert np.max(np.abs(a - b)) < 1e-10 * max(1.0, np.max(np.abs(b)))
