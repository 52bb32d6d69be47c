"""Forward NFT of a sech pulse with a higher-order scheme
(port of examples/fnft_nsev_example_2.c: CF4_2 + NEWTON localization)."""

import numpy as np

import fnft_tpu as ft
from fnft_tpu.models.nsev import nsev_with_initial_states


def main():
    ft.use_x64()
    d = 512
    t_span = (-25.0, 25.0)
    t = np.linspace(*t_span, d)
    q = 2.3j / np.cosh(t)
    # initial guesses near the expected Satsuma-Yajima eigenvalues
    init = 1j * np.array([0.3, 1.3, 1.8])
    res = nsev_with_initial_states(
        q, t_span, init, m=8, xi_span=(-2.0, 2.0), kappa=+1,
        opts=ft.NsevOpts(discretization=ft.Discretization.CF4_2))
    print("bound states:", np.round(np.asarray(res.bound_states), 6))
    print("rho:", np.round(np.asarray(res.reflection_coefficient), 6))


if __name__ == "__main__":
    main()
