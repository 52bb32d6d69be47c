"""df64 fast inverse scattering matches the complex128 peel to ~1e-13."""

import numpy as np
import jax
import jax.numpy as jnp

import fnft_tpu as ft

ft.use_x64()


def test_df64_finvscatter_matches_c128():
    """Layer peel of a genuine (forward-built) transfer matrix: the df64
    recursion recovers the same samples as the complex128 implementation
    to ~2.5e-13 — complex64 on the same input errs at ~8e-7."""
    from fnft_tpu.models.discretization import Discretization
    from fnft_tpu.models.nsev_inverse import (NsevInverseOpts,
                                              _build_tm_reflection,
                                              nsev_inverse_xi_grid)
    from fnft_tpu.ops.df64_inverse import finvscatter_df64
    from fnft_tpu.ops.finvscatter import finvscatter

    d, m = 128, 256
    t_span = (-12.0, 12.0)
    xi_span = nsev_inverse_xi_grid(d, t_span, m)
    t = np.linspace(*t_span, d)
    q0 = (0.8 / np.cosh(t)).astype(complex)
    fw = ft.nsev(jnp.asarray(q0), t_span, m=m, xi_span=xi_span, kappa=-1,
                 want_bound_states=False)
    t0, t1 = t_span
    eps_t = (t1 - t0) / (d - 1)
    tm = _build_tm_reflection(fw.reflection_coefficient, xi_span, m, d,
                              t0, t1, d, -1, Discretization.SPLIT2A,
                              NsevInverseOpts())

    q_c128 = np.asarray(finvscatter(tm, eps_t, -1, Discretization.SPLIT2A))
    q_df64 = finvscatter_df64(np.asarray(tm), eps_t, -1,
                              Discretization.SPLIT2A)
    assert np.max(np.abs(q_df64 - q_c128)) < 5e-12
    # the peel itself is accurate; the result matches the true signal to
    # discretization error
    assert np.max(np.abs(q_df64 - q0)) < 0.05

    q_c64 = np.asarray(finvscatter(jnp.asarray(tm, jnp.complex64), eps_t,
                                   -1, Discretization.SPLIT2A))
    dev64 = np.max(np.abs(q_c64.astype(complex) - q_c128))
    dev_df = np.max(np.abs(q_df64 - q_c128))
    assert dev_df < 1e-4 * dev64  # orders-of-magnitude precision win


def test_df64_finvscatter_modal():
    from fnft_tpu.models.discretization import Discretization
    from fnft_tpu.ops.df64_inverse import finvscatter_df64
    from fnft_tpu.ops.finvscatter import finvscatter
    from fnft_tpu.ops.fscatter import fscatter

    d = 64
    t = np.linspace(-8, 8, d)
    eps_t = 16.0 / (d - 1)
    q = (0.4 / np.cosh(t)).astype(complex)
    r = np.conj(q)  # kappa = -1
    tm, w = fscatter(jnp.asarray(q), jnp.asarray(r), eps_t,
                     Discretization.SPLIT2_MODAL, normalize=False)
    q_c128 = np.asarray(finvscatter(tm, eps_t, -1,
                                    Discretization.SPLIT2_MODAL))
    q_df64 = finvscatter_df64(np.asarray(tm), eps_t, -1,
                              Discretization.SPLIT2_MODAL)
    assert np.max(np.abs(q_df64 - q_c128)) < 5e-12


def test_df64_end_to_end_inverse():
    """rho -> q entirely through the df64 inverse (phase strip + B(z) FFT
    + layer peel): matches the complex128 driver to ~2e-13."""
    from fnft_tpu.models.nsev_inverse import (nsev_inverse,
                                              nsev_inverse_xi_grid)
    from fnft_tpu.ops.df64_inverse import nsev_inverse_df64

    d, m = 128, 256
    t_span = (-12.0, 12.0)
    xi_span = nsev_inverse_xi_grid(d, t_span, m)
    t = np.linspace(*t_span, d)
    q0 = (0.8 / np.cosh(t)).astype(complex)
    fw = ft.nsev(jnp.asarray(q0), t_span, m=m, xi_span=xi_span, kappa=-1,
                 want_bound_states=False)
    rho = np.asarray(fw.reflection_coefficient)
    q_c128 = np.asarray(nsev_inverse(jnp.asarray(rho), xi_span, d, t_span,
                                     kappa=-1))
    q_df = nsev_inverse_df64(rho, xi_span, d, t_span, kappa=-1)
    assert np.max(np.abs(q_df - q_c128)) < 5e-12
    assert np.max(np.abs(q_df - q0)) < 0.05  # discretization error only
