"""Multi-device tests on the virtual 8-CPU mesh: sharded batch results must
match per-signal results, and the graft entry points must run."""

import numpy as np
import jax
import jax.numpy as jnp

import fnft_tpu as ft
from fnft_tpu.parallel import batched_nsev_contspec, make_mesh


def test_batched_contspec_matches_single():
    d, m, b = 512, 64, 8
    t_span, xi_span = (-10.0, 10.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    rng = np.random.default_rng(0)
    amps = 0.5 + rng.uniform(size=b)
    q_batch = np.stack([1j * a / np.cosh(t) for a in amps])

    mesh = make_mesh(axis_names=("batch",))
    rho_b = np.asarray(batched_nsev_contspec(q_batch, t_span, m, xi_span,
                                             mesh=mesh))
    assert rho_b.shape == (b, m)

    for i in (0, 3, 7):
        single = ft.nsev(jnp.asarray(q_batch[i]), t_span, m=m,
                         xi_span=xi_span, kappa=+1, want_bound_states=False)
        np.testing.assert_allclose(rho_b[i],
                                   np.asarray(single.reflection_coefficient),
                                   rtol=1e-10, atol=1e-12)


def test_graft_entry_points():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 1024)
    assert np.all(np.isfinite(np.asarray(out)))
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)
