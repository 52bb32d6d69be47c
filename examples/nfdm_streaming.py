"""Streaming NFDM receiver demo: native batch loader -> sharded forward NFT.

Generates a file of NFDM-style symbol waveforms, then streams it through
the production batched pipeline (fnft_tpu.native.read_signal_batch +
parallel.make_nsev_batch_fn) in fixed-size batches.
"""

import time

import numpy as np

import fnft_tpu as ft
from fnft_tpu.models.nsev import ContspecType
from fnft_tpu.native import read_signal_batch
from fnft_tpu.parallel import make_mesh
from fnft_tpu.parallel.sharding import make_nsev_batch_fn


def main():
    d, m, batch, n_batches = 1024, 1024, 16, 4
    t_span, xi_span = (-16.0, 16.0), (-4.0, 4.0)
    t = np.linspace(*t_span, d)

    # synthesize a stream of random 2-lobe NFDM symbols
    rng = np.random.default_rng(0)
    total = batch * n_batches
    amps = 0.4 + 0.4 * rng.uniform(size=(total, 2))
    offs = rng.uniform(-4.0, 4.0, size=(total, 2))
    q = sum(1j * amps[:, k:k + 1] / np.cosh(t[None, :] - offs[:, k:k + 1])
            for k in range(2)).astype(np.complex64)
    path = "/tmp/nfdm_stream.bin"
    q.tofile(path)

    mesh = make_mesh(axis_names=("batch",))
    nft = make_nsev_batch_fn(d, t_span, m, xi_span,
                             contspec_type=ContspecType.BOTH, mesh=mesh)

    import jax
    done = 0
    t0 = time.perf_counter()
    for i in range(n_batches):
        qb = read_signal_batch(path, d, np.complex64,
                               offset_signals=i * batch, count=batch)
        out = nft(qb)
        jax.block_until_ready(out)
        done += qb.shape[0]
    dt = time.perf_counter() - t0
    print(f"processed {done} symbols of D={d} in {dt:.2f}s "
          f"({done / dt:.1f} spectra/sec incl. IO + first compile)")
    print("outputs:", {k: tuple(v.shape) for k, v in out.items()})


if __name__ == "__main__":
    main()
