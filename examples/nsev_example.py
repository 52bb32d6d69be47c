"""Forward NFT of a rectangle (port of examples/fnft_nsev_example.c).

Computes the continuous spectrum and bound states of q(t) = 2 on [-1, 1]
with the focusing NSE.
"""

import numpy as np

import fnft_tpu as ft


def main():
    ft.use_x64()
    d = 256
    t_span = (-1.0, 1.0)
    q = np.full(d, 2.0 + 0.0j)
    res = ft.nsev(q, t_span, m=8, xi_span=(-2.0, 2.0), kappa=+1,
                  opts=ft.NsevOpts(discspec_type=ft.DiscspecType.NORMING_CONSTANTS))
    print("continuous spectrum:")
    for i, v in enumerate(np.asarray(res.reflection_coefficient)):
        print(f"  rho[{i}] = {v:.6f}")
    print("bound states:")
    for i, v in enumerate(np.asarray(res.bound_states)):
        print(f"  lam[{i}] = {v:.6f}   b = {np.asarray(res.norming_constants)[i]:.6f}")


if __name__ == "__main__":
    main()
