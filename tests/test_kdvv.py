"""Integration tests: kdvv against analytic KdV reflection coefficients.

Cases mirror src/private/fnft__kdvv_testcases.c: a squared-sech potential
(Trogdon et al. 2012 / Drazin & Johnson) and Osborne's rectangular wells;
exact spectra are evaluated from their closed forms instead of hard-coded
40-digit tables.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.special as sp

import fnft_tpu as ft
from fnft_tpu.utils.misc import rel_err


def _sech_case(d):
    a_amp = 3.2
    t_span = (-16.0, 15.0)
    t = np.linspace(*t_span, d)
    q = a_amp / np.cosh(t) ** 2
    xi_span = (-71.0 / 20.0, 79.0 / 20.0)
    xi = (-0.1 + np.arange(-7.0, 9.0)) / 2.0
    s = np.sqrt(a_amp + 0.25)
    at = 0.5 - 1j * xi + s
    bt = 0.5 - 1j * xi - s
    ct = 1.0 - 1j * xi
    a_of = sp.gamma(at) * sp.gamma(bt) / (sp.gamma(ct) * sp.gamma(at + bt - ct))
    rho = a_of * sp.gamma(ct) * sp.gamma(ct - at - bt) / (
        sp.gamma(ct - at) * sp.gamma(ct - bt))
    return q, t_span, xi_span, rho


def _rect_case(d, ampl):
    t_span = (-1.0, 2.0)
    t = np.linspace(*t_span, d)
    q = np.where(np.abs(t) < 0.5, float(ampl), 0.0)
    q = np.where(np.abs(t) == 0.5, ampl / 2.0, q)
    zeta = np.arange(16) * np.pi / 32.0
    xi_span = (0.0, 15.0 / 32.0 * np.pi)
    ell = 0.5
    with np.errstate(divide="ignore", invalid="ignore"):
        kap = np.sqrt(ampl + zeta.astype(complex) ** 2)
        gam = (kap / zeta - zeta / kap) / 2.0
        dlt = (kap / zeta + zeta / kap) / 2.0
        tr = np.exp(-2j * zeta * ell) / (np.cos(2 * kap * ell)
                                         - 1j * dlt * np.sin(2 * kap * ell))
        rho = 1j * gam * np.sin(2 * kap * ell) * tr
    rho[0] = -1.0  # limit value at zeta = 0
    return q, t_span, xi_span, rho


# the full 2SPLITxy family at the reference's own per-scheme bounds
# (test/fnft_kdvv/fnft_kdvv_test_sech_2splitXY.c, D=1024)
@pytest.mark.parametrize("disc,bound", [
    (ft.Discretization.SPLIT1A, 9.71e-3),
    (ft.Discretization.SPLIT1B, 9.9e-3),
    (ft.Discretization.SPLIT2A, 1.37e-4),
    (ft.Discretization.SPLIT2B, 1.31e-4),
    (ft.Discretization.SPLIT2S, 5.28e-4),
    (ft.Discretization.SPLIT3A, 5.79e-5),
    (ft.Discretization.SPLIT3B, 5.77e-5),
    (ft.Discretization.SPLIT3S, 5.77e-5),
    (ft.Discretization.SPLIT4A, 5.79e-5),
    (ft.Discretization.SPLIT4B, 5.78e-5),
    (ft.Discretization.SPLIT5A, 5.78e-5),
    (ft.Discretization.SPLIT5B, 5.78e-5),
    (ft.Discretization.SPLIT6A, 5.78e-5),
    (ft.Discretization.SPLIT6B, 5.78e-5),
    (ft.Discretization.SPLIT7A, 5.78e-5),
    (ft.Discretization.SPLIT7B, 5.78e-5),
    (ft.Discretization.SPLIT8A, 5.78e-5),
    (ft.Discretization.SPLIT8B, 5.78e-5),
], ids=lambda v: str(getattr(v, "value", v)))
def test_kdvv_sech(disc, bound):
    q, t_span, xi_span, rho_exact = _sech_case(1024)
    res = ft.kdvv(jnp.asarray(q + 0j), t_span, m=16, xi_span=xi_span,
                  opts=ft.KdvvOpts(discretization=disc))
    err = float(rel_err(res.reflection_coefficient, jnp.asarray(rho_exact)))
    assert err <= bound, err


@pytest.mark.parametrize("ampl,bound", [(1.0, 1.5e-1), (-1.0, 1.797e-1)])
def test_kdvv_rect(ampl, bound):
    q, t_span, xi_span, rho_exact = _rect_case(4, ampl)
    res = ft.kdvv(jnp.asarray(q + 0j), t_span, m=16, xi_span=xi_span,
                  opts=ft.KdvvOpts(discretization=ft.Discretization.SPLIT2A))
    err = float(rel_err(res.reflection_coefficient, jnp.asarray(rho_exact)))
    assert err <= bound, err


def test_kdvv_bound_states_poschl_teller():
    """Extension beyond the reference: KdV discrete spectrum of
    A sech^2(t), A = s(s+1), has kappa_n = s - n exactly."""
    from fnft_tpu.models.kdvv import KdvvOpts, kdvv_bound_states

    for s in (1.3, 2.0):
        a_amp = s * (s + 1)
        t = np.linspace(-20, 20, 1024)
        u = a_amp / np.cosh(t) ** 2
        bs = kdvv_bound_states(jnp.asarray(u + 0j), (-20.0, 20.0),
                               opts=KdvvOpts(discretization=ft.Discretization.SPLIT4B))
        exact = np.array([s - n for n in range(int(np.ceil(s)))])
        np.testing.assert_allclose(np.sort(bs.imag), np.sort(exact),
                                   atol=2e-4)


def test_kdvv_convergence():
    """2nd-order decay of the sech contspec error with D."""
    errs = []
    for d in (512, 1024):
        q, t_span, xi_span, rho_exact = _sech_case(d)
        res = ft.kdvv(jnp.asarray(q + 0j), t_span, m=16, xi_span=xi_span,
                      opts=ft.KdvvOpts(discretization=ft.Discretization.SPLIT4B))
        errs.append(float(rel_err(res.reflection_coefficient,
                                  jnp.asarray(rho_exact))))
    assert errs[1] <= errs[0] / 3.0, errs
