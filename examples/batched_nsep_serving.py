"""Serving pipeline: periodic-NFT spectra for a batch of signals.

One jitted program computes the main and auxiliary spectra of every
signal in a [B, D] batch (static masked shapes — no host syncs per
signal); on a multi-chip mesh the batch axis shards across devices.
"""

import numpy as np

import fnft_tpu as ft


def main():
    import jax.numpy as jnp

    from fnft_tpu.parallel import batched_nsep, make_mesh

    ft.use_x64()
    d, b = 256, 4
    t_span = (0.0, 2 * np.pi)
    t = np.linspace(*t_span, d, endpoint=False)
    # plane waves of different amplitudes plus a modulated one
    q_batch = np.stack([np.full(d, 0.7 + 0.2 * k, complex) for k in range(b)])
    q_batch[-1] *= np.exp(0.1j * np.sin(t))

    mesh = make_mesh(axis_names=("batch",))  # all visible devices
    res = batched_nsep(jnp.asarray(q_batch), t_span, kappa=+1, mesh=mesh)

    for i in range(b):
        main = np.asarray(res.main_spectrum[i])[np.asarray(res.main_mask[i])]
        aux = np.asarray(res.aux_spectrum[i])[np.asarray(res.aux_mask[i])]
        print(f"signal {i}: {main.size} main points, {aux.size} aux points; "
              f"main Im range [{main.imag.min():+.3f}, {main.imag.max():+.3f}]")


if __name__ == "__main__":
    main()
