"""Argument-validation behavior across the public drivers."""

import numpy as np
import pytest

import fnft_tpu as ft
from fnft_tpu.errors import InvalidArgumentError
from fnft_tpu.models.nsev_inverse import NsevInverseOpts, nsev_inverse

Q16 = np.ones(16, complex)


@pytest.mark.parametrize("call,err", [
    (lambda: ft.nsev(Q16, (1.0, -1.0)), "T"),
    (lambda: ft.nsev(Q16, (-1.0, 1.0), kappa=0), "kappa"),
    (lambda: ft.nsev(Q16, (-1.0, 1.0), m=4), "XI"),
    (lambda: ft.nsev(np.ones(1, complex), (-1.0, 1.0)), "D"),
    (lambda: ft.nsep(np.ones(10, complex), (0.0, 1.0)), "power of two"),
    (lambda: ft.kdvv(Q16, (0.0, 1.0), m=1, xi_span=(0.0, 1.0)), "grid"),
    (lambda: nsev_inverse(None, None, 16, (0.0, 1.0)), "neither"),
    (lambda: nsev_inverse(np.ones(8, complex), (0.0, 1.0), 10, (0.0, 1.0)),
     "power of two"),
    (lambda: nsev_inverse(None, None, 16, (0.0, 1.0),
                          bound_states=[1.0 - 0.5j],
                          normconsts_or_residues=[1.0]), "upper half"),
])
def test_invalid_arguments_raise(call, err):
    with pytest.raises(InvalidArgumentError) as e:
        call()
    assert err.lower() in str(e.value).lower()


def test_slow_disc_requires_newton_for_bound_states():
    with pytest.raises(InvalidArgumentError):
        ft.nsev(Q16, (-1.0, 1.0),
                opts=ft.NsevOpts(discretization=ft.Discretization.BO))


def test_df64_validation_errors():
    """df64 entry points reject bad kappa/disc/grids with clear errors."""
    import numpy as np
    import pytest

    from fnft_tpu import df64
    from fnft_tpu.models.discretization import Discretization

    q = np.zeros(64, complex)
    with pytest.raises(ValueError, match="kappa"):
        df64.nsev_inverse(q, (-1, 1), 64, (-1, 1), kappa=0)
    with pytest.raises(ValueError, match="2SPLIT2A"):
        df64.nsev_inverse(q, (-1, 1), 64, (-1, 1), kappa=-1,
                          disc=Discretization.SPLIT4B)
    with pytest.raises(ValueError, match="power of two"):
        df64.nsev_inverse(np.zeros(63, complex), (-1, 1), 63, (-1, 1),
                          kappa=-1)
    with pytest.raises(ValueError, match="invalid grids"):
        df64.kdvv_contspec(q, d=64, m=1, t_span=(-1, 1), xi_span=(0.1, 2))
    with pytest.raises(ValueError, match="does not match"):
        df64.nsev_contspec(q, d=128, m=64, t_span=(-1, 1), xi_span=(-2, 2))
    with pytest.raises(ValueError, match="M == D"):
        df64.nsev_inverse_b_of_tau(np.zeros(32, complex), 64, (-1, 1),
                                   kappa=-1)
