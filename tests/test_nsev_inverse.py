"""Integration tests: inverse NFT (reference test/fnft_nsev_inverse/*).

Every bound below is the reference's own per-test bound; the round-trip
tests regenerate the spectra with this package's forward transform (exactly
like the C tests call fnft_nsev first).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import fnft_tpu as ft
from fnft_tpu.models.nsev import nsev_with_initial_states
from fnft_tpu.models.nsev_inverse import (
    InverseContspecType,
    InverseCstMethod,
    InverseDiscspecType,
    NsevInverseOpts,
    nsev_inverse,
    nsev_inverse_xi_grid,
)
from fnft_tpu.utils.misc import rel_err

Q8 = np.array([0.1, 0.1j, 0.2, -0.2, 0.0, 0.05 + 0.05j, -0.03j, 0.06],
              dtype=complex)
T8 = (0.0, 7.0)


def _roundtrip(m, kappa, method=InverseCstMethod.DEFAULT,
               disc=ft.Discretization.SPLIT2A):
    xi = nsev_inverse_xi_grid(8, T8, m, disc)
    fwd = ft.nsev(jnp.asarray(Q8), T8, m=m, xi_span=xi, kappa=kappa,
                  opts=ft.NsevOpts(discretization=disc),
                  want_bound_states=False)
    opts = NsevInverseOpts(discretization=disc, contspec_method=method)
    q_rec = nsev_inverse(fwd.reflection_coefficient, xi, 8, T8, kappa=kappa,
                         opts=opts)
    return float(rel_err(q_rec, jnp.asarray(Q8)))


# bounds: fnft_nsev_inverse_test_against_forward_{focusing,defocusing}_2split2A.c
@pytest.mark.parametrize("m,kappa,bound", [
    (10, +1, 0.022), (32, +1, 5.3e-8),
    (10, -1, 0.03), (32, -1, 0.016),
])
def test_roundtrip_against_forward(m, kappa, bound):
    assert _roundtrip(m, kappa) <= bound


def test_roundtrip_modal():
    # focusing_2split2_modal.c uses the same bounds at M=32
    err = _roundtrip(32, +1, disc=ft.Discretization.SPLIT2_MODAL)
    assert err <= 1e-7, err


def test_roundtrip_ab_from_iter():
    """Defocusing-only iterative method, M == D (bound 0.016)."""
    err = _roundtrip(8, -1, method=InverseCstMethod.TFMATRIX_CONTAINS_AB_FROM_ITER)
    assert err <= 0.016, err


def _sech_b_case(d):
    t_span = (-25.0, 25.0)
    a, t0 = 0.45, 1.2
    t = np.linspace(*t_span, d)
    q_exact = 1j * a / np.cosh(t - t0)
    return t_span, a, t0, t, q_exact


@pytest.mark.parametrize("d,bound", [(256, 0.0009)])
def test_b_of_tau(d, bound):
    t_span, a, t0, t, q_exact = _sech_b_case(d)
    btau = 1j / (2 * np.pi) * np.sin(np.pi * a) / np.cosh((2 * t - 2 * t0) / 2)
    opts = NsevInverseOpts(contspec_type=InverseContspecType.B_OF_TAU)
    q = nsev_inverse(jnp.asarray(btau), None, d, t_span, kappa=+1, opts=opts)
    assert float(rel_err(q, jnp.asarray(q_exact))) <= bound


@pytest.mark.parametrize("d,bound", [(256, 0.0009)])
def test_b_of_xi(d, bound):
    t_span, a, t0, t, q_exact = _sech_b_case(d)
    xi_span = nsev_inverse_xi_grid(d, t_span, d)
    xi = np.linspace(*xi_span, d)
    bxi = 1j * np.exp(-2j * xi * t0) * np.sin(np.pi * a) / np.cosh(np.pi * xi)
    opts = NsevInverseOpts(contspec_type=InverseContspecType.B_OF_XI)
    q = nsev_inverse(jnp.asarray(bxi), xi_span, d, t_span, kappa=+1, opts=opts)
    assert float(rel_err(q, jnp.asarray(q_exact))) <= bound


def test_multisoliton_cdt():
    """5-soliton with Satsuma-Yajima data equals 5 sech(t) exactly
    (fnft_nsev_inverse_test_multisoliton_cdt.c, bound 3.2e-10)."""
    d, t_span = 4096, (-32.0, 32.0)
    bs = np.array([0.5j, 1.5j, 2.5j, 3.5j, 4.5j])
    nc = np.array([-1.0, 1.0, -1.0, 1.0, -1.0], dtype=complex)
    q = nsev_inverse(None, None, d, t_span, kappa=+1, bound_states=bs,
                     normconsts_or_residues=nc)
    t = np.linspace(*t_span, d)
    assert float(rel_err(q, jnp.asarray(5.0 / np.cosh(t)))) <= 3.2e-10


@pytest.mark.parametrize("dstype", [InverseDiscspecType.NORMING_CONSTANTS,
                                    InverseDiscspecType.RESIDUES])
def test_addsoliton_cdt(dstype):
    """Add 3 solitons to a seed (fnft_nsev_inverse_test_addsoliton_cdt.c,
    bound 0.0029 at D=512)."""
    d, t_span = 512, (-20.0, 20.0)
    t = np.linspace(*t_span, d)
    bs = np.array([2.5 + 0.9j, 2.5 + 1.9j, 2.5 + 2.9j])
    nc = np.array([-1.0, 1.0, -1.0], dtype=complex)
    q_exact = 3.4 / np.cosh(t) * np.exp(-5j * t)
    seed = -0.4 / np.cosh(t) * np.exp(-5j * t)
    vals = nc.copy()
    if dstype is InverseDiscspecType.RESIDUES:
        for i in range(3):
            tmp = 1.0
            for j in range(3):
                if j != i:
                    tmp *= (bs[i] - bs[j]) / (bs[i] - np.conj(bs[j]))
            vals[i] = nc[i] * (2j * np.imag(bs[i])) / tmp
    opts = NsevInverseOpts(
        contspec_method=InverseCstMethod.USE_SEED_POTENTIAL_INSTEAD,
        discspec_type=dstype)
    q = nsev_inverse(None, None, d, t_span, kappa=+1, bound_states=bs,
                     normconsts_or_residues=vals, seed_potential=seed,
                     opts=opts)
    assert float(rel_err(q, jnp.asarray(q_exact))) <= 0.0029


def test_b_of_xi_with_discrete_spectrum():
    """b(xi) + bound states (fnft_nsev_inverse_test_b_of_xi_w_discrete,
    bound 0.00063 at D=512): A=2.45 sech has 2 solitons and a known b."""
    import scipy.special as sp

    d = m = 512
    t_span = (-25.0, 25.0)
    a_amp, t0 = 2.45, 0.0
    t = np.linspace(*t_span, d)
    q_exact = 1j * a_amp / np.cosh(t - t0)
    xi_span = nsev_inverse_xi_grid(d, t_span, m)
    xi = np.linspace(*xi_span, m)
    b_xi = 1j * np.sin(np.pi * a_amp) / np.cosh(np.pi * xi)
    bs = 1j * (a_amp - np.arange(2) - 0.5)   # [1.95i, 0.95i]
    # Satsuma-Yajima norming constants alternate +-i from the top state
    nc = np.array([1j, -1j])
    opts = NsevInverseOpts(contspec_type=InverseContspecType.B_OF_XI)
    q = nsev_inverse(jnp.asarray(b_xi), xi_span, d, t_span, kappa=+1,
                     bound_states=bs, normconsts_or_residues=nc, opts=opts)
    err = float(rel_err(q, jnp.asarray(q_exact)))
    assert err <= 6.3e-4, err


def test_b_of_tau_with_discrete_spectrum():
    """B(tau) + bound states (fnft_nsev_inverse_test_B_of_tau_w_discrete,
    bound 0.00063 at D=512): same A=2.45 sech, contspec given in the
    time-like representation B(tau) = i sin(pi A) sech(tau/2)/(2 pi)."""
    d = 512
    t_span = (-25.0, 25.0)
    a_amp, t0 = 2.45, 0.0
    t = np.linspace(*t_span, d)
    q_exact = 1j * a_amp / np.cosh(t - t0)
    btau = 1j / (2 * np.pi) * np.sin(np.pi * a_amp) \
        / np.cosh((2 * t - 2 * t0) / 2)
    bs = 1j * (a_amp - np.arange(2) - 0.5)
    nc = np.array([1j, -1j])
    opts = NsevInverseOpts(contspec_type=InverseContspecType.B_OF_TAU)
    q = nsev_inverse(jnp.asarray(btau), None, d, t_span, kappa=+1,
                     bound_states=bs, normconsts_or_residues=nc, opts=opts)
    err = float(rel_err(q, jnp.asarray(q_exact)))
    assert err <= 6.3e-4, err


def test_roundtrip_with_discrete_spectrum():
    """Full spectrum round-trip: contspec + bound states of the A=3.4
    shifted sech (against_forward_w_discrete, bound 0.014 at D=512)."""
    d, m = 512, 1024
    t_span = (-32.0, 32.0)
    t = np.linspace(*t_span, d)
    q_exact = 3.4 / np.cosh(t) * np.exp(-4j * t)
    # exact discrete spectrum of A sech(t) e^{-4it}: lam = 2 + i(A - k - 1/2)
    a_amp = 3.4
    ks = np.arange(3)
    bs = 2.0 + 1j * (a_amp - ks - 0.5)
    xi_span = nsev_inverse_xi_grid(d, t_span, m)
    fwd = ft.nsev(jnp.asarray(q_exact), t_span, m=m, xi_span=xi_span,
                  kappa=+1,
                  opts=ft.NsevOpts(discretization=ft.Discretization.SPLIT4B,
                                   discspec_type=ft.DiscspecType.NORMING_CONSTANTS))
    got_bs = np.asarray(fwd.bound_states)
    assert got_bs.size == 3
    q_rec = nsev_inverse(fwd.reflection_coefficient, xi_span, d, t_span,
                         kappa=+1, bound_states=got_bs,
                         normconsts_or_residues=np.asarray(fwd.norming_constants))
    err = float(rel_err(q_rec, jnp.asarray(q_exact)))
    assert err <= 0.014, err
    del bs
