"""Inverse NFT with continuous + discrete spectrum
(port of examples/fnft_nsev_inverse_example.c).

Inverts rho(xi) = alpha/(xi - i beta) together with one bound state at
i beta.
"""

import numpy as np

import fnft_tpu as ft
from fnft_tpu.models.nsev_inverse import nsev_inverse, nsev_inverse_xi_grid


def main():
    ft.use_x64()
    m, d = 2048, 1024
    t_span = (-2.0, 2.0)
    alpha, beta = 2.0, 0.55
    gamma = np.hypot(alpha, beta)
    xi_span = nsev_inverse_xi_grid(d, t_span, m)
    xi = np.linspace(*xi_span, m)
    contspec = alpha / (xi - 1j * beta)
    bound_states = np.array([1j * beta])
    normconsts = np.array([-1j * alpha / (gamma + beta)])
    q = nsev_inverse(contspec, xi_span, d, t_span, kappa=+1,
                     bound_states=bound_states,
                     normconsts_or_residues=normconsts)
    t = np.linspace(*t_span, d)
    q = np.asarray(q)
    print(f"Below a few of the {d} computed samples are printed:")
    for i in range(0, d, 64):
        print(f"  q(t={t[i]:+.6f}) = {q[i].real:+.6g} {q[i].imag:+.6g}i")


if __name__ == "__main__":
    main()
