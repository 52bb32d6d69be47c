"""Multi-device tests on the virtual 8-CPU mesh: sharded batch results must
match per-signal results, and the graft entry points must run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fnft_tpu as ft
from fnft_tpu.parallel import batched_nsev_contspec, make_mesh


def test_batched_contspec_matches_single():
    d, m, b = 512, 64, 8
    t_span, xi_span = (-10.0, 10.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    rng = np.random.default_rng(0)
    amps = 0.5 + rng.uniform(size=b)
    q_batch = np.stack([1j * a / np.cosh(t) for a in amps])

    mesh = make_mesh(axis_names=("batch",))
    rho_b = np.asarray(batched_nsev_contspec(q_batch, t_span, m, xi_span,
                                             mesh=mesh))
    assert rho_b.shape == (b, m)

    for i in (0, 3, 7):
        single = ft.nsev(jnp.asarray(q_batch[i]), t_span, m=m,
                         xi_span=xi_span, kappa=+1, want_bound_states=False)
        np.testing.assert_allclose(rho_b[i],
                                   np.asarray(single.reflection_coefficient),
                                   rtol=1e-10, atol=1e-12)


def test_batched_contspec_explicit_axis_mesh():
    """jax.make_mesh defaults to Explicit sharding axes on jax >= 0.9; the
    batch entry points must normalize such meshes (as_auto_mesh)."""
    d, m, b = 256, 32, 8
    t_span, xi_span = (-10.0, 10.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    q_batch = np.tile(1j * 1.3 / np.cosh(t), (b, 1))

    mesh = jax.make_mesh((8,), ("batch",))  # Explicit axis types
    rho_b = np.asarray(batched_nsev_contspec(q_batch, t_span, m, xi_span,
                                             mesh=mesh))
    assert rho_b.shape == (b, m)
    np.testing.assert_array_equal(rho_b[0], rho_b[7])


def test_batched_full_spectrum():
    """Batched contspec+bound-states pipeline: correct K and eigenvalues
    across a batch with different soliton counts, fully on device."""
    from fnft_tpu.parallel import make_batched_full_nsev
    from fnft_tpu.testcases import NsevTestcase, nsev_testcase

    data = nsev_testcase(NsevTestcase.SECH_FOCUSING, 1024)
    nft = make_batched_full_nsev(1024, data.t_span, data.m, data.xi_span,
                                 k_max=6)
    qb = np.stack([data.q, 0.7 * data.q]).astype(complex)
    res = nft(qb)
    bs0 = np.asarray(res.bound_states[0])[np.asarray(res.bound_state_mask[0])]
    bs1 = np.asarray(res.bound_states[1])[np.asarray(res.bound_state_mask[1])]
    assert len(bs0) == 3 and len(bs1) == 2
    np.testing.assert_allclose(np.sort(bs0.imag), [0.7, 1.7, 2.7], atol=2e-3)
    np.testing.assert_allclose(np.sort(bs1.imag), [0.74, 1.74], atol=2e-3)
    # norming constants of the Satsuma-Yajima signal are +-i
    nc0 = np.asarray(res.norming_constants[0])[np.asarray(res.bound_state_mask[0])]
    np.testing.assert_allclose(np.abs(nc0), 1.0, atol=1e-3)


@pytest.mark.parametrize("amp,k_expected", [(1.2, 1), (2.3, 2), (3.4, 3),
                                            (4.45, 4)])
def test_batched_full_matches_driver(amp, k_expected):
    """Semantic lock: the masked-static batched bound-state path must agree
    with the host-loop driver (models/nsev) on the same signals.

    The driver does filter/merge on host numpy; batch_full reimplements
    them as masked top-k selection — this property test keeps the two
    implementations locked across soliton counts K.
    """
    import fnft_tpu as ft
    from fnft_tpu.parallel import make_batched_full_nsev

    d, m = 1024, 256
    t_span, xi_span = (-16.0, 16.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    q = (1j * amp / np.cosh(t)).astype(complex)

    res_drv = ft.nsev(jnp.asarray(q), t_span, m=m, xi_span=xi_span,
                      opts=ft.NsevOpts(discspec_type=ft.DiscspecType.BOTH))
    bs_drv_raw = np.asarray(res_drv.bound_states)
    order_d = np.argsort(bs_drv_raw.imag)  # real parts are ~1e-16 noise
    bs_drv = bs_drv_raw[order_d]

    nft = make_batched_full_nsev(d, t_span, m, xi_span, k_max=6)
    res_b = nft(q[None])
    mask = np.asarray(res_b.bound_state_mask[0])
    bs_b_raw = np.asarray(res_b.bound_states[0])[mask]
    order_b = np.argsort(bs_b_raw.imag)
    bs_b = bs_b_raw[order_b]
    nc_b = np.asarray(res_b.norming_constants[0])[mask][order_b]

    assert len(bs_drv) == k_expected, bs_drv
    assert len(bs_b) == k_expected, bs_b
    np.testing.assert_allclose(bs_b, bs_drv, atol=5e-6)

    nc_drv = np.asarray(res_drv.norming_constants)[order_d]
    np.testing.assert_allclose(nc_b, nc_drv, atol=5e-5)

    # contspec agrees (both are the same jitted math, different wrappers)
    rho_drv = np.asarray(res_drv.reflection_coefficient)
    rho_b = np.asarray(res_b.rho[0])
    np.testing.assert_allclose(rho_b, rho_drv, atol=1e-10 * max(
        1.0, np.max(np.abs(rho_drv))))


def test_graft_entry_points():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 1024)
    assert np.all(np.isfinite(np.asarray(out)))
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)
