"""Verify the splitting combinator against brute force and exact dynamics.

Mirrors the reference's per-discretization akns_fscatter tests
(test/fnft__akns_fscatter/*): every scheme's generated polynomial matrix is
checked (a) against a direct scalar evaluation of its splitting terms and
(b) for consistency with the exact constant-potential transfer matrix
z^{deg/2} expm([[ -i lam, q], [r, i lam]] eps) as eps -> 0.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fnft_tpu.models.discretization import (
    Discretization,
    degree,
    is_fast,
    splitting_spec,
)
from fnft_tpu.ops.fscatter import transfer_matrix_coeffs

FAST = [d for d in Discretization
        if is_fast(d) and d is not Discretization.SPLIT2_MODAL]


def _exact_step(q, r, lam, eps):
    """expm([[-i lam, q], [r, i lam]] * eps) via the cosh/sinh closed form."""
    ks = q * r - lam ** 2
    k = np.sqrt(complex(ks))
    ch = np.cosh(k * eps)
    sh = np.sinh(k * eps) / k if ks != 0 else eps
    return np.array([[ch - 1j * lam * sh, q * sh],
                     [r * sh, ch + 1j * lam * sh]])


def _spec_eval(disc, q, r, eps, z):
    """Direct scalar evaluation of the splitting spec at a z value."""
    deg = degree(disc)
    total = np.zeros((2, 2), dtype=complex)
    for coeff, factors in splitting_spec(disc):
        m = np.eye(2, dtype=complex)
        for kind, a in factors:
            if kind == "E":
                h = a * eps / deg
                d = h * np.sqrt(complex(-q * r))
                sinc = np.sinc(d / np.pi) if d != 0 else 1.0
                e = np.array([[np.cos(d), q * h * sinc],
                              [r * h * sinc, np.cos(d)]])
                m = m @ e
            else:
                m = m @ np.diag([1.0, z ** a])
        total += coeff * m
    return total


@pytest.mark.parametrize("disc", FAST, ids=lambda d: d.value)
def test_polynomial_matches_direct_spec_eval(disc):
    rng = np.random.default_rng(hash(disc.value) % 2 ** 31)
    q = rng.normal() + 1j * rng.normal()
    r = rng.normal() + 1j * rng.normal()
    eps = 0.3
    coeffs = np.asarray(transfer_matrix_coeffs(
        jnp.asarray([q]), jnp.asarray([r]), eps, disc))[0]  # [2,2,deg+1]
    for z in (1.0 + 0j, np.exp(0.37j), 0.9 * np.exp(-1.1j)):
        powers = z ** np.arange(coeffs.shape[-1])
        got = np.tensordot(coeffs, powers, axes=([-1], [0]))
        want = _spec_eval(disc, q, r, eps, z)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_modal_construction():
    rng = np.random.default_rng(1)
    q = 0.3 * (rng.normal() + 1j * rng.normal())
    kappa = 1
    r = -kappa * np.conj(q)
    eps = 0.1
    coeffs = np.asarray(transfer_matrix_coeffs(
        jnp.asarray([q]), jnp.asarray([r]), eps, Discretization.SPLIT2_MODAL))[0]
    scl = 1.0 / np.sqrt(1 - eps * eps * q * r)
    expected = np.zeros((2, 2, 2), dtype=complex)
    expected[0, 0, 0] = scl
    expected[0, 1, 1] = scl * eps * q
    expected[1, 0, 0] = scl * eps * r
    expected[1, 1, 1] = scl
    np.testing.assert_allclose(coeffs, expected, rtol=1e-13)


@pytest.mark.parametrize("disc,order", [
    (Discretization.SPLIT1A, 1),
    (Discretization.SPLIT2B, 2),
    (Discretization.SPLIT3A, 3),
    (Discretization.SPLIT3B, 3),
    (Discretization.SPLIT4A, 4),
    (Discretization.SPLIT4B, 4),
    (Discretization.SPLIT5A, 5),
    (Discretization.SPLIT5B, 5),
    (Discretization.SPLIT6A, 6),
    (Discretization.SPLIT6B, 6),
    (Discretization.SPLIT7A, 7),
    (Discretization.SPLIT7B, 7),
    (Discretization.SPLIT8A, 8),
    (Discretization.SPLIT8B, 8),
], ids=lambda v: str(getattr(v, "value", v)))
def test_splitting_order_of_accuracy(disc, order):
    """One-step local error of the splitting must shrink like eps^(order+1).

    This pins the *splitting specifications* (Richardson weights + factor
    patterns) to the mathematics the reference's coefficient tables encode.
    """
    q = 0.7 + 0.2j
    r = -np.conj(q)
    lam = 0.45 - 0.15j
    deg = degree(disc)

    def one_step_error(eps):
        z = np.exp(2j * lam * eps / deg)
        p = _spec_eval(disc, q, r, eps, z)
        exact = z ** (deg / 2) * _exact_step(q, r, lam, eps)
        return np.max(np.abs(p - exact))

    # high-order schemes hit the float64 rounding floor at small eps;
    # measure at steps where the truncation error still dominates
    h = 0.5 if order >= 5 else 0.12
    e1, e2 = one_step_error(h), one_step_error(h / 2)
    measured = np.log2(e1 / e2)
    assert measured > order + 0.6, (disc, measured)


GENERIC = [d for d in FAST
           if d not in (Discretization.SPLIT2A, Discretization.SPLIT4B)]


@pytest.mark.parametrize("disc", GENERIC, ids=lambda d: d.value)
def test_value_space_coeffs_match_symbolic(disc):
    """The value-space generic construction (roots-of-unity chain
    evaluation + one small IFFT, the accelerator default) and the symbolic
    coefficient fold produce identical transfer matrices, for complex AKNS
    potentials and for the real (KdV) half-grid variant."""
    from fnft_tpu.ops.fscatter import _coeffs_symbolic, _coeffs_via_values

    rng = np.random.default_rng(7)
    d = 16
    eps_t = 0.05
    q = jnp.asarray(rng.normal(size=d) + 1j * rng.normal(size=d))
    r = jnp.asarray(rng.normal(size=d) + 1j * rng.normal(size=d))
    sym = np.asarray(_coeffs_symbolic(q, r, eps_t, disc))
    val = np.asarray(_coeffs_via_values(q, r, eps_t, disc))
    scale = np.max(np.abs(sym))
    assert np.max(np.abs(sym - val)) < 5e-13 * scale

    qr = jnp.asarray((rng.normal(size=d) + 0j))
    rr = -jnp.ones_like(qr)
    sym_r = np.asarray(_coeffs_symbolic(qr, rr, eps_t, disc))
    val_r = np.asarray(_coeffs_via_values(qr, rr, eps_t, disc,
                                          real_coeffs=True))
    assert np.max(np.abs(val_r.imag)) == 0.0
    scale = np.max(np.abs(sym_r))
    assert np.max(np.abs(sym_r - val_r)) < 5e-13 * scale
