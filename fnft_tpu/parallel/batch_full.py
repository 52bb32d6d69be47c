"""Batched full-spectrum forward NFT: contspec + bound states for [B, D].

The per-signal driver (models.nsev) compacts variable-length bound-state
arrays on the host; for production batches everything here stays on device
with static shapes: each signal returns up to ``k_max`` bound states plus a
validity mask. Pipeline per batch (one jitted program):

  fscatter (batched FFT tree) -> chirp-Z contspec
  -> Aberth on each signal's subsampled a-polynomial (vmapped sweeps,
     Newton-polygon inits from a cheap host loop)
  -> in-box filtering + dedup as masked top-k selection
  -> vectorized Newton refinement against the full-resolution scattering
  -> phi/psi sweeps for norming constants (masked)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fnft_tpu.config import complex_dtype_of, eps_of
from fnft_tpu.models import nse
from fnft_tpu.models.discretization import (
    Discretization,
    degree,
    z_to_lambda,
)
from fnft_tpu.models.nsev import ContspecType, _apply_phase_factors, _contspec_eval
from fnft_tpu.ops.fscatter import fscatter
from fnft_tpu.ops.roots import aberth_roots
from fnft_tpu.ops.scatter import scatter_bound_states
from fnft_tpu.utils import misc


def make_batched_inverse_fn(d: int, t_span, m: int, *,
                            kappa: int = +1,
                            disc: Discretization = Discretization.SPLIT2A,
                            contspec_type=None):
    """Compile a batched inverse NFT: rho[B, M] -> q[B, D] (contspec only;
    bound states are added per signal via models.nsev_inverse)."""
    from fnft_tpu.models.nsev_inverse import (
        InverseContspecType,
        NsevInverseOpts,
        _build_tm_b_of_xi,
        _build_tm_reflection,
        nsev_inverse_xi_grid,
    )
    from fnft_tpu.ops.finvscatter import finvscatter

    contspec_type = contspec_type or InverseContspecType.REFLECTION_COEFFICIENT
    t0, t1 = float(t_span[0]), float(t_span[1])
    xi_span = nsev_inverse_xi_grid(d, t_span, m, disc)
    eps_t = (t1 - t0) / (d - 1)
    deg = d * degree(disc)
    opts = NsevInverseOpts(discretization=disc, contspec_type=contspec_type)

    def single(cs):
        if contspec_type is InverseContspecType.B_OF_XI:
            tm = _build_tm_b_of_xi(cs, xi_span, m, d, t0, t1, deg, kappa,
                                   disc, opts)
        else:
            tm = _build_tm_reflection(cs, xi_span, m, d, t0, t1, deg, kappa,
                                      disc, opts)
        return finvscatter(tm, eps_t, kappa, disc)

    return jax.jit(jax.vmap(single)), xi_span


@dataclasses.dataclass
class BatchedNsevResult:
    rho: Optional[jnp.ndarray]            # [B, M]
    a: Optional[jnp.ndarray]              # [B, M]
    b: Optional[jnp.ndarray]              # [B, M]
    bound_states: jnp.ndarray             # [B, k_max]
    bound_state_mask: jnp.ndarray         # [B, k_max] bool
    norming_constants: jnp.ndarray        # [B, k_max]


def _masked_newton(q_eff, r_eff, lam, mask, eps_t, t0, t1, disc, niter, box):
    eprec = 100.0 * eps_of(lam.dtype)
    active = mask
    for _ in range(niter):
        a, ap, _ = scatter_bound_states(q_eff, r_eff, lam, eps_t, t0, t1,
                                        disc, skip_b=True)
        step = jnp.where((a == 0) | (ap == 0), 0.0,
                         a / jnp.where(ap == 0, 1.0, ap))
        lam_new = jnp.where(active, lam - step, lam)
        in_box = misc.filter_mask(lam_new, box)
        active = active & (jnp.abs(step) > eprec) & in_box
        lam = lam_new
    return lam


def make_batched_full_nsev(d: int, t_span, m: int, xi_span, *, k_max: int = 8,
                           disc: Discretization = Discretization.SPLIT4B,
                           dsub: int = 0, niter: int = 10,
                           contspec_type=ContspecType.BOTH):
    """Compile a batched q[B, D] -> BatchedNsevResult pipeline (kappa=+1).

    ``k_max`` bounds the per-signal number of returned bound states
    (static shape); candidates are selected inside the resolution/Parseval
    bounding box and deduplicated before refinement.
    """
    t0, t1 = float(t_span[0]), float(t_span[1])
    xi0, xi1 = float(xi_span[0]), float(xi_span[1])
    eps_t = (t1 - t0) / (d - 1)
    deg1 = max(degree(disc), 1)
    if dsub == 0:
        dsub = int(math.sqrt(d * math.log2(d) ** 2))
    base = nse.newton_base_discretization(disc)

    def single_boundstates(q, q_eff, r_eff):
        # subsampled fast-eigenvalue pass
        qs_eff, rs_eff, dsub_act, (i0, i1) = nse.preprocess_signal(
            q, eps_t, +1, disc, dsub)
        ts0, ts1 = t0 + i0 * eps_t, t0 + i1 * eps_t
        eps_sub = (ts1 - ts0) / (dsub_act - 1)
        tm, _ = fscatter(qs_eff, rs_eff, eps_sub, disc, jsym=+1)
        coeffs = tm[0, 0]
        deg_sub = coeffs.shape[-1] - 1

        # traced Newton-polygon initialization: polygon-quality starts with
        # no host sync inside the batched program
        from fnft_tpu.ops.roots import newton_polygon_init_jax

        z0 = newton_polygon_init_jax(coeffs)
        roots_z = aberth_roots(coeffs, z0, num_iters=100)
        lam = z_to_lambda(roots_z, eps_sub, disc)

        # bounding box (reference re/im bounds)
        re_b = 0.9 * np.pi / abs((2.0 / deg1) * eps_sub)
        im_b = 1.5 * 0.25 * misc.l2norm2(q, t0, t1)
        box = (-re_b, re_b, 0.0, im_b)
        mask = misc.filter_mask(lam, box)

        # preselect before the O(k^2) dedupe: a merge over all ~deg roots
        # would materialize a deg x deg distance matrix
        pre = min(4 * k_max, deg_sub)
        score = jnp.where(mask, jnp.imag(lam), -jnp.inf)
        _, idx_pre = jax.lax.top_k(score, pre)
        lam_pre = lam[idx_pre]
        mask_pre = mask[idx_pre]
        mask_pre = misc.merge_mask(lam_pre, misc.merge_tol_default(lam.dtype),
                                   mask_pre)
        score2 = jnp.where(mask_pre, jnp.imag(lam_pre), -jnp.inf)
        _, idx = jax.lax.top_k(score2, k_max)
        lam_k = lam_pre[idx]
        mask_k = mask_pre[idx]

        lam_ref = _masked_newton(q_eff, r_eff, lam_k, mask_k, eps_t, t0, t1,
                                 base, niter, box)
        mask_k = mask_k & misc.filter_mask(lam_ref, box)
        mask_k = misc.merge_mask(lam_ref, misc.merge_tol_default(lam.dtype),
                                 mask_k)
        a_v, ap_v, b_v = scatter_bound_states(q_eff, r_eff, lam_ref, eps_t,
                                              t0, t1, base, skip_b=False)
        return (jnp.where(mask_k, lam_ref, 0.0), mask_k,
                jnp.where(mask_k, b_v, 0.0))

    def single(q):
        q_eff, r_eff, _, _ = nse.preprocess_signal(q, eps_t, +1, disc)
        tm, w = fscatter(q_eff, r_eff, eps_t, disc, jsym=+1)
        h11, h21, w_ = _contspec_eval(tm, w, q_eff, r_eff, eps_t, t0, t1,
                                      d, xi0, xi1, m, disc)
        cs = _apply_phase_factors(h11, h21, w_, eps_t, t0, t1, d, xi0, xi1,
                                  m, +1, disc, contspec_type)
        bs, bs_mask, nc = single_boundstates(q, q_eff, r_eff)
        return cs, bs, bs_mask, nc

    batched = jax.jit(jax.vmap(single))

    def run(q_batch) -> BatchedNsevResult:
        cs, bs, bs_mask, nc = batched(jnp.asarray(q_batch))
        return BatchedNsevResult(rho=cs.get("rho"), a=cs.get("a"),
                                 b=cs.get("b"), bound_states=bs,
                                 bound_state_mask=bs_mask,
                                 norming_constants=nc)

    return run
