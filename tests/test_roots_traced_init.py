"""Traced (jit/vmap-compatible) Newton-polygon initialization."""

import numpy as np
import jax
import jax.numpy as jnp

from fnft_tpu.ops.roots import (_newton_polygon_init, aberth_roots,
                                newton_polygon_init_jax)


def test_traced_init_matches_numpy_radii():
    rng = np.random.default_rng(0)
    for deg in (12, 63, 200):
        c = (rng.normal(size=deg + 1) + 1j * rng.normal(size=deg + 1)) \
            * 10.0 ** rng.integers(-5, 5, size=deg + 1)
        rj = np.sort(np.abs(np.asarray(jax.jit(newton_polygon_init_jax)(
            jnp.asarray(c)))))
        rn = np.sort(np.abs(_newton_polygon_init(np.abs(c))))
        np.testing.assert_allclose(rj, rn, rtol=1e-12)


def test_fully_jitted_rootfinding_vmapped():
    """End-to-end jitted + vmapped: init + Aberth over a batch of polys."""
    rng = np.random.default_rng(1)
    deg, b = 24, 4
    roots = rng.normal(size=(b, deg)) + 1j * rng.normal(size=(b, deg))
    cs = np.stack([np.poly(r)[::-1] for r in roots])

    @jax.jit
    @jax.vmap
    def solve(c):
        return aberth_roots(c, newton_polygon_init_jax(c))

    got = np.asarray(solve(jnp.asarray(cs)))
    for i in range(b):
        np.testing.assert_allclose(np.sort_complex(got[i]),
                                   np.sort_complex(roots[i]), atol=1e-8)
