"""Differentiability: gradients through the full fast-NFT pipeline.

The reference C library is not differentiable; autodiff through the
transfer-matrix construction, FFT tree, and chirp-Z is a new capability
(used by the NFDM inverse-design training step). Verified against central
finite differences.
"""

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _rho_pipeline


def test_grad_matches_finite_differences():
    d = m = 64
    t_span, xi_span = (-8.0, 8.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    q0 = (1j * 0.9 / np.cosh(t))[None, :]
    rho = _rho_pipeline(d, m, t_span, xi_span)

    def loss(p):
        q = (p[0] + 1j * p[1])[None, :]
        return jnp.sum(jnp.abs(rho(q)) ** 2)

    p0 = jnp.asarray(np.stack([q0[0].real, q0[0].imag]))
    g = np.asarray(jax.grad(loss)(p0))

    rng = np.random.default_rng(0)
    for _ in range(4):
        comp = rng.integers(0, 2)
        idx = rng.integers(0, d)
        h = 1e-6
        pp = np.asarray(p0).copy()
        pp[comp, idx] += h
        pm = np.asarray(p0).copy()
        pm[comp, idx] -= h
        fd = (float(loss(jnp.asarray(pp))) - float(loss(jnp.asarray(pm)))) / (2 * h)
        assert abs(fd - g[comp, idx]) <= 1e-5 * max(1.0, abs(fd)), \
            (comp, idx, fd, g[comp, idx])


def test_training_step_reduces_loss():
    """A few adam steps on the spectral loss must reduce it."""
    import optax

    d = m = 128
    t_span, xi_span = (-8.0, 8.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    rho = _rho_pipeline(d, m, t_span, xi_span)
    target = jax.jit(rho)((1j * 1.0 / np.cosh(t - 0.7))[None, :].astype(np.complex64))

    def loss_fn(p):
        q = (p[0] + 1j * p[1])[None, :]
        return jnp.mean(jnp.abs(rho(q) - target) ** 2)

    p = jnp.asarray(np.stack([np.zeros(d, np.float32),
                              (0.8 / np.cosh(t)).astype(np.float32)]))
    opt = optax.adam(3e-2)
    state = opt.init(p)

    @jax.jit
    def step(p, state):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, state = opt.update(g, state, p)
        return optax.apply_updates(p, updates), state, l

    losses = []
    for _ in range(25):
        p, state, l = step(p, state)
        losses.append(float(l))
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])
