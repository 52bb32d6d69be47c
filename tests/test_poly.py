"""Unit tests for the polynomial kernels (reference: test/fnft__poly/*)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fnft_tpu.ops.poly import (chirpz, fmult, fmult2x2, fmult2x2_tree,
                               poly_eval, poly_evalderiv, set_value_tree)


def _np_polymul_mat(a, b):
    """b @ a with polynomial entries (numpy reference), ascending coeffs."""
    ca, cb = a.shape[-1], b.shape[-1]
    out = np.zeros((2, 2, ca + cb - 1), dtype=complex)
    for i in range(2):
        for j in range(2):
            for k in range(2):
                out[i, j] += np.convolve(b[i, k], a[k, j])
    return out


def _brute_force_product(mats):
    acc = mats[0]
    for m in mats[1:]:
        acc = _np_polymul_mat(acc, m)
    return acc


@pytest.mark.parametrize("n", [2, 4, 8, 7, 5])
@pytest.mark.parametrize("deg", [1, 2, 3])
def test_fmult2x2_matches_brute_force(n, deg):
    rng = np.random.default_rng(42 + n + deg)
    p = rng.normal(size=(n, 2, 2, deg + 1)) + 1j * rng.normal(size=(n, 2, 2, deg + 1))
    expected = _brute_force_product(list(p))
    got, w = fmult2x2(jnp.asarray(p), normalize=False)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-12, atol=1e-12)
    assert int(w) == 0


@pytest.mark.parametrize("n", [4, 8, 6])
def test_fmult2x2_normalization(n):
    rng = np.random.default_rng(7)
    p = 10.0 * (rng.normal(size=(n, 2, 2, 3)) + 1j * rng.normal(size=(n, 2, 2, 3)))
    expected = _brute_force_product(list(p))
    got, w = fmult2x2(jnp.asarray(p), normalize=True)
    rescaled = np.asarray(got) * 2.0 ** int(w)
    np.testing.assert_allclose(rescaled, expected, rtol=1e-12, atol=1e-10)
    # coefficients should be O(1) after normalization
    assert 0.25 <= np.max(np.abs(np.asarray(got))) <= 2.5


def test_fmult_scalar():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(6, 4)) + 1j * rng.normal(size=(6, 4))
    expected = p[0]
    for row in p[1:]:
        expected = np.convolve(expected, row)
    got, w = fmult(jnp.asarray(p), normalize=True)
    np.testing.assert_allclose(np.asarray(got) * 2.0 ** int(w), expected,
                               rtol=1e-12, atol=1e-10)


# ---------------------------------------------------------------------------
# Value-space tree unit tier.  The small-n cases above never outgrow the
# direct-convolution cutoff, so these cases use n = 64 where the tree spends
# its last levels in value representation (ops/poly._value_level); deg = 1
# exercises exact power-of-two grids (the drivers' case), deg = 3 the
# 3*2^a grids.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("deg", [1, 3])
@pytest.mark.parametrize("normalize", [True, False])
def test_value_tree_matches_classic_and_brute_force(deg, normalize):
    n = 64
    rng = np.random.default_rng(100 + deg)
    p = rng.normal(size=(n, 2, 2, deg + 1)) \
        + 1j * rng.normal(size=(n, 2, 2, deg + 1))
    expected = _brute_force_product(list(p))
    scale = np.max(np.abs(expected))
    try:
        set_value_tree(True)
        got_v, w_v = fmult2x2_tree(jnp.asarray(p), normalize=normalize)
        set_value_tree(False)
        got_c, w_c = fmult2x2_tree(jnp.asarray(p), normalize=normalize)
    finally:
        set_value_tree(None)
    val = np.asarray(got_v) * 2.0 ** int(w_v)
    cla = np.asarray(got_c) * 2.0 ** int(w_c)
    assert np.max(np.abs(val - expected)) / scale < 1e-11
    assert np.max(np.abs(cla - expected)) / scale < 1e-11
    if normalize:
        # normalized coefficients stay O(1) (the 2^w side channel carries
        # the magnitude; the value tree rescales off value magnitudes)
        assert np.max(np.abs(np.asarray(got_v))) <= 4.0
    else:
        assert int(w_v) == 0 and int(w_c) == 0


def test_value_tree_top_coefficient_exact():
    """The z^N side channel must survive the aliasing correction exactly:
    the product's leading coefficient is the product of the factors'
    leading 2x2 blocks, computed without any FFT roundoff amplification."""
    n, deg = 64, 1
    rng = np.random.default_rng(9)
    p = rng.normal(size=(n, 2, 2, deg + 1)) \
        + 1j * rng.normal(size=(n, 2, 2, deg + 1))
    expected = _brute_force_product(list(p))
    got, w = fmult2x2_tree(jnp.asarray(p))
    top = np.asarray(got)[..., -1] * 2.0 ** int(w)
    np.testing.assert_allclose(top, expected[..., -1], rtol=1e-12)


@pytest.mark.parametrize("want", [((0, 0),), ((0, 0), (1, 0)),
                                  ((0, 1), (1, 1))])
def test_value_tree_want_entry_selection(want):
    n, deg = 64, 2
    rng = np.random.default_rng(17)
    p = rng.normal(size=(n, 2, 2, deg + 1)) \
        + 1j * rng.normal(size=(n, 2, 2, deg + 1))
    full, w_full = fmult2x2_tree(jnp.asarray(p))
    sel, w_sel = fmult2x2_tree(jnp.asarray(p), want=want)
    full = np.asarray(full) * 2.0 ** int(w_full)
    sel = np.asarray(sel) * 2.0 ** int(w_sel)
    scale = np.max(np.abs(full))
    for i in range(2):
        for j in range(2):
            if (i, j) in want:
                assert np.max(np.abs(sel[i, j] - full[i, j])) / scale < 1e-12
            else:
                assert np.all(sel[i, j] == 0.0)


def test_value_tree_nonpow2_n_identity_padding():
    n, deg = 48, 2   # pads to 64 with identity matrices
    rng = np.random.default_rng(23)
    p = rng.normal(size=(n, 2, 2, deg + 1)) \
        + 1j * rng.normal(size=(n, 2, 2, deg + 1))
    expected = _brute_force_product(list(p))
    got, w = fmult2x2_tree(jnp.asarray(p))
    val = np.asarray(got) * 2.0 ** int(w)
    assert val.shape[-1] == n * deg + 1
    assert np.max(np.abs(val - expected)) / np.max(np.abs(expected)) < 1e-11


def test_value_tree_batched_rows_match_single():
    n, deg = 64, 1
    rng = np.random.default_rng(31)
    p = rng.normal(size=(3, n, 2, 2, deg + 1)) \
        + 1j * rng.normal(size=(3, n, 2, 2, deg + 1))
    got_b, w_b = fmult2x2_tree(jnp.asarray(p))
    for k in range(3):
        got_1, w_1 = fmult2x2_tree(jnp.asarray(p[k]))
        a = np.asarray(got_b[k]) * 2.0 ** int(np.asarray(w_b)[k])
        b = np.asarray(got_1) * 2.0 ** int(w_1)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12 * np.max(np.abs(b)))


@pytest.mark.parametrize("m", [5, 16, 33])
def test_chirpz_matches_direct_eval(m):
    rng = np.random.default_rng(11)
    deg = 24
    c = rng.normal(size=deg + 1) + 1j * rng.normal(size=deg + 1)
    a = np.exp(0.3j) * 1.01
    w = np.exp(-0.05j) * 0.999
    got = np.asarray(chirpz(jnp.asarray(c), complex(a), complex(w), m))
    pts = a * w ** np.arange(m)
    expected = np.polyval(c[::-1], pts)
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-10)


def test_fftgridsearch_paraherm():
    """Unit-circle roots of a para-hermitian polynomial via sign changes
    (reference fnft__poly_roots_fftgridsearch.c:162-219)."""
    from fnft_tpu.ops.gridsearch import roots_fftgridsearch_paraherm
    from fnft_tpu.utils.misc import compact_masked

    # p(z) = prod (z - e^{i phi_k})(z - e^{-i phi_k}) * z-shift is
    # para-hermitian: build from conjugate-reflected roots
    phis = np.array([0.7, 1.9, 2.6])
    roots = np.concatenate([np.exp(1j * phis), np.exp(-1j * phis)])
    c = np.poly(roots)[::-1].astype(complex)
    got, mask = roots_fftgridsearch_paraherm(
        jnp.asarray(c), phi0=0.0, phi1=float(np.pi), m=2048)
    got = compact_masked(np.asarray(got), np.asarray(mask))
    got_phi = np.sort(np.angle(got))
    np.testing.assert_allclose(got_phi, np.sort(phis), atol=1e-5)


def test_poly_eval_and_derivative():
    rng = np.random.default_rng(5)
    c = rng.normal(size=9) + 1j * rng.normal(size=9)
    z = np.array([0.3 + 0.1j, 1.0, 2.0 - 1.0j, -0.5j, 1.5])
    p, dp = poly_evalderiv(jnp.asarray(c), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(p), np.polyval(c[::-1], z),
                               rtol=1e-12, atol=1e-12)
    dc = c[1:] * np.arange(1, 9)
    np.testing.assert_allclose(np.asarray(dp), np.polyval(dc[::-1], z),
                               rtol=1e-11, atol=1e-11)
    p_only = poly_eval(jnp.asarray(c), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(p_only), np.polyval(c[::-1], z),
                               rtol=1e-12, atol=1e-12)
