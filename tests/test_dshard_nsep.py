"""D-sharded nsep refinement on the 8-virtual-device CPU mesh.

Two tiers:

* the sharded Newton refinement kernels (``make_dshard_nsep_refine``)
  against the single-device jitted twins
  (``models.nsep._refine_mainspec_loop`` / ``_refine_auxspec_loop``) on
  identical candidates — the chunk-product composition reassociates
  floating-point matmuls, so agreement is ~1e-9, while converged Newton
  fixed points match far tighter;
* the full ``dshard_nsep_reference`` driver against
  ``models.nsep.nsep`` with ``Localization.SUBSAMPLE_AND_REFINE`` on
  the plane-wave testcase (closed-form spectrum,
  fnft__nsep_testcases.c:118-151).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import fnft_tpu as ft
from fnft_tpu.models import nse, nsep as m
from fnft_tpu.parallel.dshard_nsep import (
    dshard_nsep_reference,
    make_dshard_nsep_refine,
)
from fnft_tpu.parallel.sharding import make_mesh
from fnft_tpu.utils.misc import hausdorff_dist


def _plane_wave(d):
    t_span = (0.0, 2 * np.pi)
    t = (t_span[1] - t_span[0]) / d * np.arange(d)
    q = 2.0 * np.exp(3j * t)
    j = np.arange(50)
    sq = np.sqrt(4 - j * j / 4.0 + 0j)
    ms = np.concatenate([-1.5 + 1j * sq, -1.5 - 1j * sq])
    ja = np.arange(1, 50)
    sqa = np.sqrt(4 - ja * ja / 4.0 + 0j)
    aux = np.concatenate([-1.5 + 1j * sqa, -1.5 - 1j * sqa])
    return q, t_span, ms, aux


BOX = (-5.0, 5.0, -5.0, 5.0)


def _setup(d, disc):
    q, t_span, ms, aux = _plane_wave(d)
    eps_t = (t_span[1] - t_span[0]) / d
    base = nse.newton_base_discretization(disc)
    q_eff, r_eff, _, _ = nse.preprocess_signal(
        jnp.asarray(q), eps_t, +1, disc)
    return q, t_span, ms, aux, eps_t, base, q_eff, r_eff


def test_sharded_refine_matches_single_device():
    d = 1 << 10
    disc = ft.Discretization.SPLIT2A
    q, t_span, ms, aux, eps_t, base, q_eff, r_eff = _setup(d, disc)
    mesh = make_mesh(axis_names=("seq",))

    # candidates: exact spectrum points perturbed off the fixed point,
    # each with ITS spine value (Delta(lam) = +-2 at a main-spec point)
    rng = np.random.default_rng(7)
    lam_m = ms[np.abs(ms.imag) > 0.3][:6]
    delta, _ = m._eval_floquet(q_eff, r_eff, jnp.asarray(lam_m), eps_t,
                               base)
    rhs = -np.where(np.real(np.asarray(delta)) > 0, 2.0, -2.0)
    lam0 = lam_m + 1e-3 * (
        rng.standard_normal(6) + 1j * rng.standard_normal(6))
    tol = 1e-14

    refine_main, refine_aux = make_dshard_nsep_refine(
        d, mesh, eps_t=eps_t, base_disc=base, iters_main=9, iters_aux=20)

    got_m = np.asarray(refine_main(q_eff, r_eff, jnp.asarray(lam0),
                                   jnp.asarray(rhs), tol))
    want_m = np.asarray(m._refine_mainspec_loop(
        q_eff, r_eff, jnp.asarray(lam0), jnp.asarray(rhs),
        jnp.asarray(tol), float(eps_t), 9, base))
    # main-spec points are DOUBLE roots of Delta(lam) + rhs (band edges),
    # so fixed-point agreement is sqrt(reassociation noise) ~ 3e-7
    assert np.max(np.abs(got_m - want_m)) < 2e-6, (got_m, want_m)
    # both must actually sit on the discriminant level set
    resid, _ = m._eval_floquet(q_eff, r_eff, jnp.asarray(got_m), eps_t,
                               base)
    assert np.max(np.abs(np.asarray(resid) + rhs)) < 1e-10

    lam0a = aux[np.abs(aux.imag) > 0.3][:4] + 0.01 * (
        rng.standard_normal(4) + 1j * rng.standard_normal(4))
    got_a = np.asarray(refine_aux(q_eff, r_eff, jnp.asarray(lam0a), tol))
    want_a = np.asarray(m._refine_auxspec_loop(
        q_eff, r_eff, jnp.asarray(lam0a), jnp.asarray(tol),
        float(eps_t), 20, base))
    assert np.max(np.abs(got_a - want_a)) < 1e-8, (got_a, want_a)


def test_dshard_nsep_driver_equivalence():
    """Full sharded S&R driver vs models.nsep.nsep on the plane wave."""
    d = 1 << 10
    disc = ft.Discretization.SPLIT2A
    q, t_span, ms_exact, aux_exact, *_ = _setup(d, disc)
    opts = ft.NsepOpts(localization=ft.Localization.SUBSAMPLE_AND_REFINE,
                       filtering=ft.PointFilter.MANUAL, bounding_box=BOX,
                       discretization=disc)
    ref = ft.nsep(jnp.asarray(q), t_span, kappa=+1, opts=opts)

    mesh = make_mesh(axis_names=("seq",))
    main, aux = dshard_nsep_reference(jnp.asarray(q), t_span, mesh,
                                      kappa=+1, opts=opts)

    assert main.size and aux.size
    # aux-spec points are simple roots of T12: agreement at reassociation
    # noise. Main-spec points are double roots (band edges): agreement at
    # sqrt(noise); the reference's own plane-wave test additionally
    # excludes the slow-convergence cluster near lam = -1.5
    # (test_fnft_nsep.c remove box), as here.
    def _rm(v):
        mask = ((np.real(v) > -1.6) & (np.real(v) < -1.4)
                & (np.imag(v) > -0.1) & (np.imag(v) < 0.1))
        return v[~mask]

    d_m = float(hausdorff_dist(_rm(main), _rm(np.asarray(ref.main_spectrum))))
    d_a = float(hausdorff_dist(aux, np.asarray(ref.aux_spectrum)))
    assert d_m < 1e-5, d_m
    assert d_a < 1e-12, d_a

    # and against the closed form (same bound class as tests/test_nsep.py)
    exact_m = ms_exact[(np.abs(ms_exact.real) < 5) & (np.abs(ms_exact.imag) < 5)]
    err = max(float(np.min(np.abs(main - e))) for e in exact_m
              if np.abs(e.real + 1.5) > 0.2 or np.abs(e.imag) > 0.2)
    assert err < 5e-2, err


def test_dshard_nsep_max_evals_zero_matches_driver():
    """max_evals == 0 disables refinement on both paths identically
    (models.nsep._refine_mainspec/_refine_auxspec contract)."""
    d = 1 << 9
    disc = ft.Discretization.SPLIT2A
    q, t_span, *_ = _setup(d, disc)
    opts = ft.NsepOpts(localization=ft.Localization.SUBSAMPLE_AND_REFINE,
                       filtering=ft.PointFilter.MANUAL, bounding_box=BOX,
                       discretization=disc, max_evals=0)
    ref = ft.nsep(jnp.asarray(q), t_span, kappa=+1, opts=opts)
    mesh = make_mesh(axis_names=("seq",))
    main, aux = dshard_nsep_reference(jnp.asarray(q), t_span, mesh,
                                      kappa=+1, opts=opts)
    # localization is shared (replicated) and refinement is off on both
    # paths, so the unrefined candidate sets must agree exactly
    np.testing.assert_allclose(
        np.sort_complex(main),
        np.sort_complex(np.asarray(ref.main_spectrum)), rtol=0, atol=1e-13)
    np.testing.assert_allclose(
        np.sort_complex(aux),
        np.sort_complex(np.asarray(ref.aux_spectrum)), rtol=0, atol=1e-13)


@pytest.mark.skipif(os.environ.get("FNFT_SLOW_TESTS") != "1",
                    reason="D=2^16 sharded nsep: minutes")
def test_dshard_nsep_at_scale():
    """D=2^16 plane wave: the sharded S&R driver localizes the closed-form
    spectrum (the operating point multi-chip exists for)."""
    d = 1 << 16
    disc = ft.Discretization.SPLIT2A
    q, t_span, ms_exact, aux_exact, *_ = _setup(d, disc)
    opts = ft.NsepOpts(localization=ft.Localization.SUBSAMPLE_AND_REFINE,
                       filtering=ft.PointFilter.MANUAL, bounding_box=BOX,
                       discretization=disc)
    mesh = make_mesh(axis_names=("seq",))
    main, aux = dshard_nsep_reference(jnp.asarray(q), t_span, mesh,
                                      kappa=+1, opts=opts)
    assert main.size and aux.size
    exact_m = ms_exact[(np.abs(ms_exact.real) < 5)
                       & (np.abs(ms_exact.imag) < 5)]
    err = max(float(np.min(np.abs(main - e))) for e in exact_m
              if np.abs(e.real + 1.5) > 0.2 or np.abs(e.imag) > 0.2)
    assert err < 2e-3, err
    exact_a = aux_exact[(np.abs(aux_exact.real) < 5)
                        & (np.abs(aux_exact.imag) < 5)]
    err_a = max(float(np.min(np.abs(aux - e))) for e in exact_a
                if np.abs(e.imag) > 0.2)
    assert err_a < 2e-3, err_a


def test_dshard_nsep_rejects_indivisible():
    mesh = make_mesh(axis_names=("seq",))
    with pytest.raises(ValueError):
        make_dshard_nsep_refine(
            12, mesh, eps_t=0.1,
            base_disc=nse.newton_base_discretization(
                ft.Discretization.SPLIT2A),
            iters_main=1, iters_aux=1)
