"""Reference accuracy on TPU hardware: the double-float (df64) mode.

TPUs have no float64 units; the complex64 production pipeline reaches
~1e-5 relative accuracy. The df64 layer recomputes the heavy stages in
float32-PAIR arithmetic (Dekker/Knuth error-free transformations) and
matches the complex128 CPU results to ~1e-13 — from ops that run
unmodified on the TPU's VPU.

Surfaces demonstrated: continuous spectrum, bound states, and the fast
inverse-scattering layer peel.
"""

import numpy as np

import fnft_tpu as ft


def main():
    ft.use_x64()  # for the complex128 cross-checks on CPU
    import jax.numpy as jnp

    from fnft_tpu.ops.df64_pipeline import (nsev_boundstates_df64,
                                            nsev_contspec_df64)

    d = 1024
    t_span, xi_span = (-25.0, 25.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    q = 1j * 3.2 / np.cosh(t)  # Satsuma-Yajima, 3 solitons

    rho_df = nsev_contspec_df64(q, d=d, m=d, t_span=t_span, xi_span=xi_span)
    ref = ft.nsev(jnp.asarray(q), t_span, m=d, xi_span=xi_span, kappa=+1,
                  want_bound_states=False).reflection_coefficient
    rel = np.sum(np.abs(rho_df - np.asarray(ref))) / np.sum(np.abs(ref))
    print(f"contspec: df64 vs complex128 rel. err = {rel:.2e}")

    rho_32 = ft.nsev(jnp.asarray(q.astype(np.complex64)), t_span, m=d,
                     xi_span=xi_span, kappa=+1,
                     want_bound_states=False).reflection_coefficient
    rel32 = np.sum(np.abs(np.asarray(rho_32) - np.asarray(ref))) \
        / np.sum(np.abs(ref))
    print(f"          complex64 vs complex128 rel. err = {rel32:.2e}")

    lam = nsev_boundstates_df64(q, d=d, t_span=t_span)
    print("bound states (df64):", np.sort(lam.imag))


if __name__ == "__main__":
    main()
