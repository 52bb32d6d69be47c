"""J-symmetric value tree: symmetry invariants and equivalence.

NSE/AKNS transfer matrices with r = -kappa conj(q) satisfy the involution
P22 = rev(conj(P11)), P12 = -kappa rev(conj(P21)) (sigma(P) = z^deg J
conj(P(1/conj(z))) J^{-1}; cf. the conjugation symmetry of the AKNS pair
used throughout the reference, e.g. fnft__nse_scatter.c boundary forms).
The tree's ``jsym`` mode exploits it by carrying only the first matrix
column in value space — these tests pin (a) the symmetry per fast scheme,
(b) its closure under the tree product, and (c) bit-level-ish equivalence
of the jsym path against the generic tree, including ``want`` selection,
the normalization exponents, and the non-power-of-two fallback.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fnft_tpu.models.discretization import Discretization, degree, is_fast
from fnft_tpu.ops.fscatter import transfer_matrix_coeffs
from fnft_tpu.ops.poly import fmult2x2_tree

FAST = [d for d in Discretization if is_fast(d)]


def _rc(x):
    """rev(conj(.)) along the coefficient axis."""
    return np.conj(x[..., ::-1])


def _random_q(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n) + 1j * rng.normal(size=n)) * 0.7


@pytest.mark.parametrize("disc", FAST)
@pytest.mark.parametrize("kappa", [+1, -1])
def test_base_matrices_satisfy_jsymmetry(disc, kappa):
    q = jnp.asarray(_random_q(16))
    r = -kappa * jnp.conj(q)
    p = np.asarray(transfer_matrix_coeffs(q, r, 0.13, disc))
    scale = np.max(np.abs(p))
    assert np.max(np.abs(p[:, 1, 1] - _rc(p[:, 0, 0]))) < 1e-14 * scale
    assert np.max(np.abs(p[:, 0, 1] + kappa * _rc(p[:, 1, 0]))) < 1e-14 * scale


@pytest.mark.parametrize("kappa", [+1, -1])
def test_tree_product_preserves_jsymmetry(kappa):
    q = jnp.asarray(_random_q(64, seed=3))
    p = transfer_matrix_coeffs(q, -kappa * jnp.conj(q), 0.11,
                               Discretization.SPLIT4B)
    out, _ = fmult2x2_tree(p)
    out = np.asarray(out)
    scale = np.max(np.abs(out))
    assert np.max(np.abs(out[1, 1] - _rc(out[0, 0]))) < 1e-12 * scale
    assert np.max(np.abs(out[0, 1] + kappa * _rc(out[1, 0]))) < 1e-12 * scale


@pytest.mark.parametrize("disc", [Discretization.SPLIT2A,
                                  Discretization.SPLIT4B,
                                  Discretization.SPLIT4B4,
                                  Discretization.SPLIT7A])
@pytest.mark.parametrize("kappa", [+1, -1])
def test_jsym_tree_matches_generic(disc, kappa):
    n = 128 // max(1, degree(disc) // 8)  # keep SPLIT7A affordable
    q = jnp.asarray(_random_q(n, seed=7))
    p = transfer_matrix_coeffs(q, -kappa * jnp.conj(q), 0.09, disc)
    for want in (None, ((0, 0), (1, 0)), ((0, 0), (0, 1))):
        ref, w_ref = fmult2x2_tree(p, want=want)
        sym, w_sym = fmult2x2_tree(p, want=want, jsym=kappa)
        ref, sym = np.asarray(ref), np.asarray(sym)
        err = np.max(np.abs(ref - sym)) / np.max(np.abs(ref))
        assert err < 5e-14, (disc, kappa, want, err)
        assert np.array_equal(np.asarray(w_ref), np.asarray(w_sym))


def test_jsym_tree_batched_and_normalize_off():
    qs = jnp.asarray(np.stack([_random_q(64, seed=s) for s in range(3)]))
    p = transfer_matrix_coeffs(qs, -jnp.conj(qs), 0.12,
                               Discretization.SPLIT4B)
    ref, _ = fmult2x2_tree(p, normalize=False)
    sym, w = fmult2x2_tree(p, normalize=False, jsym=+1)
    err = np.max(np.abs(np.asarray(ref) - np.asarray(sym)))
    assert err < 5e-13 * np.max(np.abs(np.asarray(ref)))
    assert np.all(np.asarray(w) == 0)


def test_jsym_non_power_of_two_falls_back():
    # identity padding breaks the symmetry, so jsym must be ignored: the
    # result still has to match the generic tree exactly
    q = jnp.asarray(_random_q(48, seed=11))
    p = transfer_matrix_coeffs(q, -jnp.conj(q), 0.1, Discretization.SPLIT4B)
    ref, w_ref = fmult2x2_tree(p)
    sym, w_sym = fmult2x2_tree(p, jsym=+1)
    assert np.array_equal(np.asarray(ref), np.asarray(sym))
    assert np.array_equal(np.asarray(w_ref), np.asarray(w_sym))


@pytest.mark.parametrize("kappa", [+1, -1])
def test_df64_jsym_tree_matches_generic(kappa):
    """The df64 column-carrying tree reproduces the full-matrix df64 tree."""
    from fnft_tpu.ops.df64 import cdf_from_c128, cdf_to_c128
    from fnft_tpu.ops.df64_pipeline import (_tm_stage_df64, _tree_stage_df64)

    d = 256
    rng = np.random.default_rng(5)
    q = (rng.normal(size=d) + 1j * rng.normal(size=d)) * 0.4
    p = _tm_stage_df64(cdf_from_c128(q), eps_t=0.05, kappa=kappa,
                       disc=Discretization.SPLIT4B)
    for want in (((0, 0), (1, 0)), ((0, 0), (0, 1)), None):
        ref, w_ref = _tree_stage_df64(p, n_true=d, deg_in=2, want=want)
        sym, w_sym = _tree_stage_df64(p, n_true=d, deg_in=2, want=want,
                                      jsym=kappa)
        ref = np.asarray(cdf_to_c128(ref))
        sym = np.asarray(cdf_to_c128(sym))
        err = np.max(np.abs(ref - sym)) / np.max(np.abs(ref))
        assert err < 1e-12, (kappa, want, err)  # df64 roundoff ~2^-48
        assert np.array_equal(np.asarray(w_ref), np.asarray(w_sym))


def test_df64_contspec_with_jsym_meets_reference_accuracy():
    """End-to-end df64 pipeline (now on the symmetric tree) stays at
    ~1e-12 of the complex128 driver."""
    import fnft_tpu as ft
    from fnft_tpu.ops.df64_pipeline import nsev_contspec_df64
    from fnft_tpu.testcases import NsevTestcase, nsev_testcase

    d = 512
    data = nsev_testcase(NsevTestcase.SECH_FOCUSING, d)
    rho = np.asarray(nsev_contspec_df64(jnp.asarray(data.q), d=d, m=d,
                                        t_span=data.t_span,
                                        xi_span=data.xi_span))
    ref = np.asarray(ft.nsev(jnp.asarray(data.q), data.t_span, m=d,
                             xi_span=data.xi_span, kappa=+1,
                             want_bound_states=False).reflection_coefficient)
    err = np.sum(np.abs(rho - ref)) / np.sum(np.abs(ref))
    assert err < 1e-11, err


@pytest.mark.parametrize("kappa", [+1, -1])
def test_nsev_driver_with_jsym_matches_closed_form(kappa):
    """End-to-end: the driver (which now passes jsym) still meets the
    reference sech bounds — focusing and defocusing."""
    import fnft_tpu as ft
    from fnft_tpu.testcases import (NsevTestcase, nsev_errors, nsev_testcase)

    from fnft_tpu.ops import poly

    case = (NsevTestcase.SECH_FOCUSING if kappa == +1
            else NsevTestcase.SECH_DEFOCUSING)
    data = nsev_testcase(case, 1024)
    res = ft.nsev(jnp.asarray(data.q), data.t_span, m=data.m,
                  xi_span=data.xi_span, kappa=kappa,
                  want_bound_states=(kappa == +1 and
                                     data.bound_states.size > 0))
    errs = nsev_errors(res, data)
    if kappa == +1:
        # 2nd-order scheme at D=1024: reference D=4096 bound scaled by 16
        assert errs["contspec"] < 16 * 3.9e-6
    # and the jsym path must reproduce the generic tree's driver output
    # (defocusing closed-form error at D=1024 is truncation-dominated,
    # so equivalence is the meaningful assertion there)
    try:
        poly.set_value_tree(False)
        ref = ft.nsev(jnp.asarray(data.q), data.t_span, m=data.m,
                      xi_span=data.xi_span, kappa=kappa,
                      want_bound_states=False)
    finally:
        poly.set_value_tree(None)
    a, b = (np.asarray(res.reflection_coefficient),
            np.asarray(ref.reflection_coefficient))
    assert np.max(np.abs(a - b)) < 1e-10 * max(1.0, np.max(np.abs(b)))
