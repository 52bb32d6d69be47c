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
