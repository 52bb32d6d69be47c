"""Slow-scheme scattering-matrix unit tier (reference test/fnft__nse_scatter).

For a constant potential q(t) = qc on an interval of length L, the AKNS
transfer matrix has the closed form

    T = cosh(kL) I + sinh(kL)/k * A,   A = [[-i lam, qc], [rc, i lam]],
    k = sqrt(qc rc - lam^2),

and every scheme in the BO/CF family is a product of exact matrix
exponentials of constant stage matrices, so it must reproduce T at
machine precision (the commutators a CF integrator approximates vanish
for constant A). ES4/TES4's interior step is likewise exact for constant
slots; their *preprocessing* intentionally zero-pads the signal outside
[T0, T1] (reference fnft__nse_discretization.c preprocess_signal ES4
branch: `(q[3]-0)/(2 eps_t)` edge differences), which for a constant
test signal manufactures a boundary jump — so the ES4/TES4 cases build
the [q, q', q''] slots analytically (q' = q'' = 0) instead of calling
preprocess_signal. The lambda-derivative is checked against the closed
form dT/dlam, and the backward (psi-sweep) steps against U_b U = I.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fnft_tpu  # noqa: F401
from fnft_tpu.models import nse
from fnft_tpu.models.discretization import Discretization
from fnft_tpu.ops import scatter as sc

fnft_tpu.use_x64()

QC = 2.0 + 0.5j
KAPPA = +1
RC = -np.conj(QC)
LAMS = np.array([0.3 + 0.2j, -1.1 + 0.7j, 2.0 + 0.0j, 0.05 + 1.9j])

CF_SCHEMES = [Discretization.BO, Discretization.CF4_2, Discretization.CF4_3,
              Discretization.CF5_3, Discretization.CF6_4]
ES_SCHEMES = [Discretization.ES4, Discretization.TES4]

# dT/dlam tolerance per scheme. The reference computes the CF derivative
# per stage at lam*weight and rescales by the uniform 1/num_stages
# (fnft__akns_scatter_matrix.c:117-151, 207-210) — exact only when all
# stage weight sums are equal (BO, CF4_2); for CF4_3/CF5_3/CF6_4 it is a
# deliberate Newton-grade approximation, and this package reproduces the
# same semantics. The loose bounds below pin that approximation level.
DT_TOL = {Discretization.BO: 5e-12, Discretization.CF4_2: 5e-12,
          Discretization.ES4: 5e-12,
          # TES4's splitting derivative is O(eps^2)-accurate even where T
          # itself is exact (measured 3.3e-4 / 8.2e-5 / 2.0e-5 at
          # D=64/128/256 — clean second order)
          Discretization.TES4: 1e-3,
          Discretization.CF4_3: 2e-4, Discretization.CF6_4: 2e-4,
          Discretization.CF5_3: 2e-2}


def _t_exact(lam, L):
    a = np.array([[-1j * lam, QC], [RC, 1j * lam]])
    k = np.sqrt(complex(QC * RC - lam ** 2))
    return np.cosh(k * L) * np.eye(2) + np.sinh(k * L) / k * a


def _dt_exact(lam, L):
    a = np.array([[-1j * lam, QC], [RC, 1j * lam]])
    da = np.array([[-1j, 0.0], [0.0, 1j]])
    k = np.sqrt(complex(QC * RC - lam ** 2))
    dk = -lam / k
    return (L * np.sinh(k * L) * dk * np.eye(2)
            + (np.cosh(k * L) * L * k - np.sinh(k * L)) / k ** 2 * dk * a
            + np.sinh(k * L) / k * da)


def _effective(disc, d, eps_t):
    """(q_eff, r_eff) for the constant potential."""
    q = jnp.full(d, QC, jnp.complex128)
    if disc in ES_SCHEMES:
        q3 = np.zeros((d, 3), np.complex128)
        q3[:, 0] = QC
        q_eff = jnp.asarray(q3.reshape(-1))
        return q_eff, -KAPPA * jnp.conj(q_eff)
    q_eff, r_eff, _, _ = nse.preprocess_signal(q, eps_t, KAPPA, disc)
    return q_eff, r_eff


@pytest.mark.parametrize("disc", CF_SCHEMES + ES_SCHEMES,
                         ids=lambda d: d.name)
@pytest.mark.parametrize("derivative", [False, True],
                         ids=["T", "dT"])
def test_constant_potential_closed_form(disc, derivative):
    d = 64
    eps_t = 1.0 / (d - 1)
    el = d * eps_t
    q_eff, r_eff = _effective(disc, d, eps_t)
    lam = jnp.asarray(LAMS)
    if derivative:
        t, td = sc.scatter_matrix(q_eff, r_eff, lam, eps_t, disc,
                                  derivative=True)
        td = np.asarray(td)
    else:
        t = sc.scatter_matrix(q_eff, r_eff, lam, eps_t, disc)
    t = np.asarray(t)
    for i, lam_i in enumerate(LAMS):
        ex = _t_exact(lam_i, el)
        err = np.max(np.abs(t[i] - ex)) / np.max(np.abs(ex))
        assert err < 5e-13, (disc, lam_i, err)
        if derivative:
            dex = _dt_exact(lam_i, el)
            derr = np.max(np.abs(td[i] - dex)) / np.max(np.abs(dex))
            assert derr < DT_TOL[disc], (disc, lam_i, derr)


@pytest.mark.parametrize("disc", CF_SCHEMES + ES_SCHEMES,
                         ids=lambda d: d.name)
def test_backward_step_inverts_forward(disc):
    """step_fn(backward=True) must be the exact inverse of the forward
    step — the contract the psi sweeps rely on
    (ops/scatter.py:467-502)."""
    rng = np.random.default_rng(3)
    d = 24
    eps_t = 0.07
    t = np.linspace(-1, 1, d)
    q = jnp.asarray(rng.normal(size=d) * np.exp(-t ** 2)
                    + 1j * rng.normal(size=d) * np.exp(-t ** 2))
    q_eff, r_eff, _, _ = nse.preprocess_signal(q, eps_t, KAPPA, disc)
    xs, step_fn, _ = sc._family_inputs(q_eff, r_eff, eps_t, disc)
    lam = jnp.asarray(LAMS)

    def fwd(x):
        u, _ = step_fn(lam, x[0], x[1], x[2], derivative=False)
        return u

    def bwd(x):
        u, _ = step_fn(lam, x[0], x[1], x[2], derivative=False,
                       backward=True)
        return u

    u = np.asarray(jax.vmap(fwd)(xs))
    ub = np.asarray(jax.vmap(bwd)(xs))
    prod = np.einsum("skij,skjl->skil", ub, u)
    eye = np.broadcast_to(np.eye(2), prod.shape)
    assert np.max(np.abs(prod - eye)) < 1e-11, disc


@pytest.mark.parametrize("disc", CF_SCHEMES + ES_SCHEMES,
                         ids=lambda d: d.name)
def test_log_depth_matches_sequential(disc):
    """The two branches of scatter_matrix (tree product on accelerators,
    sequential scan on CPU, ops/scatter.py:264-280) agree on random q."""
    rng = np.random.default_rng(11)
    d = 32
    eps_t = 0.05
    t = np.linspace(-1, 1, d)
    q = jnp.asarray((rng.normal(size=d) + 1j * rng.normal(size=d))
                    * np.exp(-t ** 2))
    q_eff, r_eff, _, _ = nse.preprocess_signal(q, eps_t, KAPPA, disc)
    lam = jnp.asarray(LAMS)

    orig = sc._use_log_depth
    try:
        sc._use_log_depth = lambda: False
        t_seq, td_seq = sc.scatter_matrix.__wrapped__(
            q_eff, r_eff, lam, eps_t, disc, derivative=True)
        sc._use_log_depth = lambda: True
        t_tree, td_tree = sc.scatter_matrix.__wrapped__(
            q_eff, r_eff, lam, eps_t, disc, derivative=True)
    finally:
        sc._use_log_depth = orig

    np.testing.assert_allclose(np.asarray(t_tree), np.asarray(t_seq),
                               rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(np.asarray(td_tree), np.asarray(td_seq),
                               rtol=1e-10, atol=1e-12)
