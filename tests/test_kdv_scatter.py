"""kdv_scatter_matrix (reference test/fnft__kdv_scatter/) and the pluggable
warning handler (reference fnft_errwarn_setprintf)."""

import numpy as np
import jax.numpy as jnp

from fnft_tpu.models.discretization import Discretization, lambda_stage_weights
from fnft_tpu.models.kdvv import kdv_scatter_matrix


def test_kdv_scatter_bo_constant_potential():
    """For constant q the BO monodromy equals expm of the AKNS matrix."""
    d, qc, lam, eps = 8, 0.41 + 0.0j, 0.9 - 0.2j, 0.1
    q = jnp.full((d,), qc)
    t = np.asarray(kdv_scatter_matrix(q, jnp.asarray([lam]), eps,
                                      Discretization.BO))[0]
    # exact: expm([[-i lam, q], [-1, i lam]] * D * eps)
    ks = qc * (-1.0) - lam ** 2
    k = np.sqrt(ks)
    h = d * eps
    ch, sh = np.cosh(k * h), np.sinh(k * h) / k
    exact = np.array([[ch - 1j * lam * sh, qc * sh],
                      [-1.0 * sh, ch + 1j * lam * sh]])
    np.testing.assert_allclose(t, exact, rtol=1e-12)


def test_kdv_cf_stage_constants_match_reference():
    """The generative CF stage weights reproduce the reference's hard-coded
    r-values (fnft__kdv_scatter_matrix.c:88-130)."""
    cases = {
        Discretization.CF4_3: [-0.275, -0.45, -0.275],
        Discretization.CF5_3: [-0.3 - 0.1j, -0.4, -0.3 + 0.1j],
        Discretization.CF6_4: [-0.210073786808785 - 0.046600721949282j,
                               -0.289926213191215 + 0.046600721949282j,
                               -0.289926213191215 + 0.046600721949282j,
                               -0.210073786808785 - 0.046600721949282j],
    }
    for disc, exact in cases.items():
        np.testing.assert_allclose(-lambda_stage_weights(disc), exact,
                                   atol=2e-15)


def test_pluggable_warn_handler():
    from fnft_tpu import errors

    seen = []
    errors.set_warn_handler(seen.append)
    try:
        errors.warn("test message")
    finally:
        errors.set_warn_handler(None)
    assert seen == ["test message"]
