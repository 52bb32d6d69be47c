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


def test_df64_specfact_matches_c128():
    """df64 spectral factorization (log/Hilbert/exp in float32 pairs)
    matches the complex128 implementation to ~5e-15 for all kappa."""
    from fnft_tpu.ops.df64 import poly_specfact_df64
    from fnft_tpu.ops.specfact import poly_specfact

    rng = np.random.default_rng(0)
    deg = 63
    b = 0.3 * (rng.normal(size=deg + 1) + 1j * rng.normal(size=deg + 1))
    for kappa in (0, -1, 1):
        bb = 0.05 * b if kappa == 1 else b
        ref = np.asarray(poly_specfact(jnp.asarray(bb), kappa=kappa))
        got = poly_specfact_df64(bb, kappa=kappa)
        assert np.max(np.abs(got - ref)) < 1e-12, kappa


def test_df64_b_of_xi_inverse():
    """b(xi) -> q via df64 FFT + df64 specfact + df64 peel matches the
    complex128 driver to ~4e-14."""
    from fnft_tpu.models.nsev_inverse import (InverseContspecType,
                                              NsevInverseOpts, nsev_inverse,
                                              nsev_inverse_xi_grid)
    from fnft_tpu.ops.df64_inverse import nsev_inverse_b_of_xi_df64

    d = m = 256
    t_span = (-25.0, 25.0)
    a_amp = 0.45
    xi_span = nsev_inverse_xi_grid(d, t_span, m)
    xi = np.linspace(*xi_span, m)
    b_xi = 1j * np.sin(np.pi * a_amp) / np.cosh(np.pi * xi)
    opts = NsevInverseOpts(contspec_type=InverseContspecType.B_OF_XI)
    q_c128 = np.asarray(nsev_inverse(jnp.asarray(b_xi), xi_span, d, t_span,
                                     kappa=+1, opts=opts))
    q_df = nsev_inverse_b_of_xi_df64(b_xi, xi_span, d, t_span, kappa=+1)
    assert np.max(np.abs(q_df - q_c128)) < 1e-12


def test_df64_b_of_tau_inverse():
    """B(tau) -> q in df64 matches the complex128 driver to ~3e-14."""
    from fnft_tpu.models.nsev_inverse import (InverseContspecType,
                                              NsevInverseOpts, nsev_inverse)
    from fnft_tpu.ops.df64_inverse import nsev_inverse_b_of_tau_df64

    d = 256
    t_span = (-25.0, 25.0)
    a_amp = 0.45
    t = np.linspace(*t_span, d)
    btau = 1j / (2 * np.pi) * np.sin(np.pi * a_amp) / np.cosh(t)
    opts = NsevInverseOpts(contspec_type=InverseContspecType.B_OF_TAU)
    q_c128 = np.asarray(nsev_inverse(jnp.asarray(btau), None, d, t_span,
                                     kappa=+1, opts=opts))
    q_df = nsev_inverse_b_of_tau_df64(btau, d, t_span, kappa=+1)
    assert np.max(np.abs(q_df - q_c128)) < 1e-12


def test_df64_staged_large_d_roundtrip():
    """deg = 2048 through the staged host recursion (the traced program at
    this degree did not finish compiling in 10 minutes); forward-scatter
    roundtrip at df64 accuracy."""
    import os
    import time

    import pytest

    if not os.environ.get("FNFT_SLOW_TESTS"):
        pytest.skip("large-D df64 staged peel (set FNFT_SLOW_TESTS=1)")
    from fnft_tpu.models.discretization import Discretization

    from fnft_tpu.ops.df64 import cdf_from_c128, cdf_to_c128
    from fnft_tpu.ops.df64_inverse import (
        _STAGED_MIN_DEG,
        _finvscatter_core_df64,
        _output_map,
    )
    from fnft_tpu.ops.fscatter import fscatter

    d = 2048
    assert d >= _STAGED_MIN_DEG
    t_span = (-8.0, 8.0)
    eps_t = (t_span[1] - t_span[0]) / (d - 1)
    q = 0.8 / np.cosh(np.linspace(*t_span, d)) * np.exp(
        1j * np.linspace(0, 3, d))
    qj = jnp.asarray(q)
    tm, _ = fscatter(qj, -jnp.conj(qj), eps_t, Discretization.SPLIT2A,
                     normalize=False)
    tm = np.asarray(tm).astype(np.complex128)
    t0 = time.perf_counter()
    qq = np.asarray(cdf_to_c128(_finvscatter_core_df64(
        cdf_from_c128(tm), d, 1)))
    first = time.perf_counter() - t0
    q_out = _output_map(qq, eps_t, Discretization.SPLIT2A)
    assert np.max(np.abs(q_out - q)) < 1e-10
    t0 = time.perf_counter()
    np.asarray(cdf_to_c128(_finvscatter_core_df64(cdf_from_c128(tm), d, 1)))
    steady = time.perf_counter() - t0
    assert steady < first  # shape-cached kernels actually reused
