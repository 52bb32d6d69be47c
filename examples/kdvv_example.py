"""KdV reflection coefficient of a squared sech
(port of examples/fnft_kdvv_example.c)."""

import numpy as np

import fnft_tpu as ft


def main():
    ft.use_x64()
    d = 1024
    t_span = (-16.0, 15.0)
    t = np.linspace(*t_span, d)
    q = 3.2 / np.cosh(t) ** 2
    res = ft.kdvv(q + 0j, t_span, m=16, xi_span=(-3.55, 3.95))
    for i, v in enumerate(np.asarray(res.reflection_coefficient)):
        print(f"  rho[{i}] = {v:.6f}")


if __name__ == "__main__":
    main()
