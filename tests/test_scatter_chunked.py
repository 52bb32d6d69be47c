"""Chunked two-pass scatter_bound_states must match the one-shot path.

The chunked sweeps (ops/scatter.py:_bound_states_chunked) bound memory at
large D by reducing chunks to transfer matrices and streaming the b-metric
argmin; the reference instead stores phi at all D+1 points in host RAM
(fnft__nse_scatter_bound_states.c:29-668). Equivalence is checked at small
D by forcing the chunked dispatch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import fnft_tpu.ops.scatter as scatter_mod
from fnft_tpu.models import nse
from fnft_tpu.models.discretization import Discretization


def _sech_inputs(d, disc, a_amp=3.2):
    t0, t1 = -12.0, 12.0
    eps_t = (t1 - t0) / (d - 1)
    t = t0 + eps_t * np.arange(d)
    q = (1j * a_amp / np.cosh(t)).astype(np.complex128)
    q_eff, r_eff, _, _ = nse.preprocess_signal(jnp.asarray(q), eps_t, +1, disc)
    return q_eff, r_eff, eps_t, t0, t1


@pytest.mark.parametrize("disc,skip_b", [
    (Discretization.BO, False),
    (Discretization.BO, True),
    (Discretization.CF4_2, False),
    (Discretization.CF4_3, False),   # upsampling 3: non-pow2 chunk stride
    (Discretization.ES4, False),
])
def test_chunked_matches_dense(monkeypatch, disc, skip_b):
    d = 512
    q_eff, r_eff, eps_t, t0, t1 = _sech_inputs(d, disc)
    lam = jnp.asarray([0.5j, 1.5j, 2.5j, 0.3 + 1.0j])

    a0, ap0, b0 = scatter_mod.scatter_bound_states(
        q_eff, r_eff, lam, eps_t, t0, t1, disc, skip_b=skip_b)

    monkeypatch.setattr(scatter_mod, "_CHUNK_THRESHOLD", 1)
    monkeypatch.setattr(scatter_mod, "_pick_chunk_len",
                        lambda s, se: 64 * se)  # force multiple chunks
    # jit caches would bypass the monkeypatched threshold; call the wrapped fn
    a1, ap1, b1 = scatter_mod.scatter_bound_states.__wrapped__(
        q_eff, r_eff, lam, eps_t, t0, t1, disc, skip_b=skip_b)

    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ap1), np.asarray(ap0),
                               rtol=1e-10, atol=1e-12)
    if not skip_b:
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                                   rtol=1e-9, atol=1e-12)


def test_full_spectrum_d_2pow16():
    """Full discrete spectrum at D=2^16: the phi/psi sweeps cross the
    2^15-step threshold, so this exercises the chunked two-pass path at
    real scale inside the driver (VERDICT item 8's acceptance test).
    Gated: ~10 CPU-minutes; trivial on TPU."""
    import os

    if not os.environ.get("FNFT_SLOW_TESTS"):
        pytest.skip("set FNFT_SLOW_TESTS=1 to run (minutes on 1 CPU core)")
    import fnft_tpu as ft
    from fnft_tpu.testcases import NsevTestcase, nsev_testcase

    d = 1 << 16
    data = nsev_testcase(NsevTestcase.SECH_FOCUSING, d)
    opts = ft.NsevOpts(discspec_type=ft.DiscspecType.BOTH)
    res = ft.nsev(jnp.asarray(data.q), data.t_span, m=0, kappa=+1, opts=opts)
    bs = np.asarray(res.bound_states)
    assert bs.size == 3, bs
    order = np.argsort(bs.imag)  # real parts are pure noise (~1e-15)
    np.testing.assert_allclose(bs[order], data.bound_states, atol=1e-7)
    # norming constants at the reference's exact values (+-i alternating)
    nc = np.asarray(res.norming_constants)[order]
    np.testing.assert_allclose(nc, data.normconsts, atol=1e-5)


def test_chunk_len_picker():
    assert scatter_mod._pick_chunk_len(1 << 20, 1) == 4096
    assert scatter_mod._pick_chunk_len(2 * (1 << 20), 2) == 4096
    l3 = scatter_mod._pick_chunk_len(3 * 4096, 3)
    assert l3 % 3 == 0 and (3 * 4096) % l3 == 0
    # odd sample count: falls back to tiny chunks (caller rejects them)
    assert scatter_mod._pick_chunk_len(3 * 5, 3) == 3
