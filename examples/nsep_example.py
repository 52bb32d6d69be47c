"""Periodic NFT of a plane wave (port of examples/fnft_nsep_example.c)."""

import numpy as np

import fnft_tpu as ft


def main():
    ft.use_x64()
    d = 256
    t_span = (0.0, 2 * np.pi)
    t = t_span[0] + (t_span[1] - t_span[0]) / d * np.arange(d)
    q = 2.0 * np.exp(3j * t)
    res = ft.nsep(q, t_span, kappa=+1)
    print(f"{len(res.main_spectrum)} main spectrum points (showing 10):")
    ms = np.asarray(res.main_spectrum)
    for v in ms[np.argsort(-np.imag(ms))][:10]:
        print(f"  {v:.6f}")
    print(f"{len(res.aux_spectrum)} auxiliary spectrum points")


if __name__ == "__main__":
    main()
