"""Batched nsep (parallel.batch_nsep) must reproduce the per-signal
driver's SUBSAMPLE_AND_REFINE spectra, signal by signal, as masked
static-shape arrays; with a mesh the batch axis shards over devices."""

import numpy as np
import jax
import jax.numpy as jnp

import fnft_tpu as ft
from fnft_tpu.models.nsep import Localization, NsepOpts, nsep
from fnft_tpu.parallel import make_mesh
from fnft_tpu.parallel.batch_nsep import batched_nsep


def _driver(q, t_span):
    opts = NsepOpts(localization=Localization.SUBSAMPLE_AND_REFINE)
    return nsep(jnp.asarray(q), t_span, kappa=+1, opts=opts)


def test_batched_nsep_matches_driver():
    d = 256
    t_span = (0.0, 2 * np.pi)
    amps = [1.0, 0.8, 1.2]
    qb = np.stack([np.full(d, a, complex) for a in amps])
    res = batched_nsep(jnp.asarray(qb), t_span, kappa=+1)
    assert res.main_spectrum.shape == res.main_mask.shape
    for i in range(len(amps)):
        main = np.asarray(res.main_spectrum[i])[np.asarray(res.main_mask[i])]
        aux = np.asarray(res.aux_spectrum[i])[np.asarray(res.aux_mask[i])]
        ref = _driver(qb[i], t_span)
        for got, want in ((main, ref.main_spectrum), (aux, ref.aux_spectrum)):
            assert got.size == want.size
            dists = np.array([np.min(np.abs(got - r)) for r in want])
            assert dists.max() < 1e-8, dists.max()


def test_batched_nsep_sharded_batch_axis():
    d = 128
    t_span = (0.0, 2 * np.pi)
    b = 8
    qb = np.stack([np.full(d, 0.9 + 0.02 * k, complex) for k in range(b)])
    mesh = make_mesh(axis_names=("batch",))
    res = batched_nsep(jnp.asarray(qb), t_span, kappa=+1, mesh=mesh)
    res0 = batched_nsep(jnp.asarray(qb), t_span, kappa=+1)
    np.testing.assert_allclose(
        np.asarray(res.main_spectrum), np.asarray(res0.main_spectrum),
        rtol=1e-12, atol=1e-12)
    assert bool(jnp.all(res.main_mask == res0.main_mask))
