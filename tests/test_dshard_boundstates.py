"""D-sharded discrete spectrum on the 8-virtual-device CPU mesh.

Equivalence with the single-device driver: the sharded chunk-product
composition reassociates floating-point products, so agreement is at the
1e-10 level rather than bitwise; the refined bound states themselves are
Newton fixed points and match far tighter.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fnft_tpu as ft
from fnft_tpu.models import nse
from fnft_tpu.models.discretization import Discretization
from fnft_tpu.ops.scatter import scatter_bound_states
from fnft_tpu.parallel.dshard_boundstates import (
    dshard_boundstates_reference,
    make_dshard_boundstates,
)
from fnft_tpu.parallel.sharding import make_mesh

SLOW = os.environ.get("FNFT_SLOW_TESTS") == "1"

T_SPAN = (-25.0, 25.0)


def _sech(d, amp=3.2):
    t = np.linspace(*T_SPAN, d)
    return (1j * amp / np.cosh(t)).astype(np.complex128)


def test_sharded_scatter_matches_single_device():
    """a, a', b from the sharded pass (niter=0: no Newton movement) must
    match scatter_bound_states on the same lambdas."""
    d = 1 << 12
    q = jnp.asarray(_sech(d))
    eps_t = (T_SPAN[1] - T_SPAN[0]) / (d - 1)
    base = Discretization.BO
    q_eff, r_eff, _, _ = nse.preprocess_signal(q, eps_t, +1, base)
    # b is only well-defined where phi and psi are proportional — at the
    # driver's refined bound states (at arbitrary lambda the error-metric
    # argmin is shallow and any reassociation flips it between grid
    # points with different phi1/psi1)
    res = ft.nsev(q, T_SPAN, m=0, kappa=+1)
    lam = jnp.asarray(np.asarray(res.bound_states))

    a1, ap1, b1 = scatter_bound_states(q_eff, r_eff, lam, eps_t,
                                       T_SPAN[0], T_SPAN[1], base,
                                       skip_b=False)

    mesh = make_mesh(axis_names=("seq",))
    fn = make_dshard_boundstates(d, T_SPAN, mesh, disc=base, niter=0)
    box = np.array([-np.inf, np.inf, -np.inf, np.inf])
    lam2, a2, ap2, b2 = fn(q_eff, r_eff, lam, box)

    np.testing.assert_array_equal(np.asarray(lam2), np.asarray(lam))
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ap2), np.asarray(ap1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1),
                               rtol=1e-9, atol=1e-11)


def test_sharded_newton_refines_like_driver():
    """The sharded Newton fori_loop from perturbed starts lands on the
    same bound states as the single-device _newton_refine."""
    from fnft_tpu.models.nsev import _newton_refine

    d = 1 << 12
    q = jnp.asarray(_sech(d))
    eps_t = (T_SPAN[1] - T_SPAN[0]) / (d - 1)
    base = Discretization.BO
    q_eff, r_eff, _, _ = nse.preprocess_signal(q, eps_t, +1, base)
    lam0 = jnp.asarray([0.03 + 0.65j, -0.04 + 1.66j, 0.02 + 2.75j])
    box = (-5.0, 5.0, 0.0, 10.0)

    ref = np.asarray(_newton_refine(q_eff, r_eff, lam0, eps_t, T_SPAN[0],
                                    T_SPAN[1], base, 10, box))

    mesh = make_mesh(axis_names=("seq",))
    fn = make_dshard_boundstates(d, T_SPAN, mesh, disc=base, niter=10)
    lam2, _, _, _ = fn(q_eff, r_eff, lam0, np.asarray(box))
    np.testing.assert_allclose(np.asarray(lam2), ref, rtol=0, atol=1e-10)


@pytest.mark.parametrize("d", [1 << 12,
                               pytest.param(1 << 16, marks=pytest.mark.skipif(
                                   not SLOW,
                                   reason="D=2^16 full pipeline: minutes"))])
def test_full_pipeline_matches_driver(d):
    """dshard_boundstates_reference == ft.nsev discrete spectrum
    (SUBSAMPLE_AND_REFINE semantics) at D=2^12 and (gated) D=2^16."""
    q = _sech(d)
    res = ft.nsev(jnp.asarray(q), T_SPAN, m=0, kappa=+1,
                  opts=ft.NsevOpts(
                      discspec_type=ft.DiscspecType.NORMING_CONSTANTS))
    ref_bs = np.asarray(res.bound_states)
    ref_nc = np.asarray(res.norming_constants)

    mesh = make_mesh(axis_names=("seq",))
    bs, nc = dshard_boundstates_reference(q, T_SPAN, mesh)
    assert bs.size == ref_bs.size == 3
    order_r, order_s = np.argsort(ref_bs.imag), np.argsort(bs.imag)
    np.testing.assert_allclose(bs[order_s], ref_bs[order_r],
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(nc[order_s], ref_nc[order_r],
                               rtol=1e-7, atol=1e-9)
