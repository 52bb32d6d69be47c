"""Batched (quasi-)periodic NFT: main/aux spectra for [B, D] signals.

Serving-oriented analogue of models.nsep: everything stays on device with
static shapes — each signal returns up to ``deg`` candidate points per
spine plus validity masks; the caller compacts at the boundary (or
consumes the masks directly). One jitted program per (B, D, config).

Pipeline (SUBSAMPLE_AND_REFINE localization, reference
fnft_nsep.c:441-705):

  remove per-signal quasi-periodic phase -> subsampled monodromy
  polynomial (batched FFT tree) -> batched Aberth on every spine value's
  shifted polynomial AND the aux polynomial in one dispatch -> in-box
  masking -> lock-step multiplicity-aware Newton refinement against the
  full-resolution monodromy (per-point rhs) -> masked results.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

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
from fnft_tpu.models.nsep import _auto_box, _monodromy_poly
from fnft_tpu.ops.fscatter import fscatter
from fnft_tpu.ops.roots import aberth_roots, newton_polygon_init_jax
from fnft_tpu.ops.scatter import scatter_matrix
from fnft_tpu.utils import misc


@dataclasses.dataclass
class BatchedNsepResult:
    main_spectrum: jnp.ndarray      # [B, nvals * deg]
    main_mask: jnp.ndarray          # [B, nvals * deg] bool
    aux_spectrum: jnp.ndarray       # [B, deg]
    aux_mask: jnp.ndarray           # [B, deg] bool


def make_batched_nsep_fn(d: int, t_span, *, kappa: int = +1,
                         disc: Discretization = Discretization.SPLIT2A,
                         dsub: int = 0,
                         floquet_range=(-1.0, 1.0),
                         points_per_spine: int = 2,
                         max_evals: int = 20,
                         num_aberth_iters: int = 80,
                         mesh=None):
    """Compile a batched nsep: (q[B, D], phase_shift[B]) -> spectra+masks.

    With ``mesh`` the batch axis is sharded over the mesh's "batch" axis.
    """
    from fnft_tpu.parallel.sharding import as_auto_mesh
    mesh = as_auto_mesh(mesh)
    t0, t1 = float(t_span[0]), float(t_span[1])
    if d < 2 or d & (d - 1):
        raise ValueError("D must be a power of two")
    eps_t = (t1 - t0) / d
    nvals = points_per_spine
    rhs0, rhs1 = floquet_range
    step = (rhs1 - rhs0) / (nvals - 1) if nvals > 1 else 0.0
    rhs_vals = 2.0 * (rhs0 + step * np.arange(nvals))

    dsub_target = dsub or int(
        2.0 ** math.ceil(0.5 * math.log2(d * math.log2(d) ** 2)))

    def single(q, lam_shift):
        rdt = jnp.real(q).dtype
        cdt = complex_dtype_of(q)
        tgrid = t0 + eps_t * jnp.arange(d, dtype=rdt)
        q_pre = q * jnp.exp(2j * lam_shift * tgrid)

        q_eff, r_eff, _, _ = nse.preprocess_signal(q_pre, eps_t, kappa, disc)
        qs_eff, rs_eff, dsub_act, (i0, i1) = nse.preprocess_signal(
            q_pre, eps_t, kappa, disc, dsub_target)
        nskip = d // dsub_act
        eps_sub = nskip * eps_t

        tm, w = fscatter(qs_eff, rs_eff, eps_sub, disc, jsym=kappa)
        deg = tm.shape[-1] - 1
        map_coeff = 2.0 / degree(disc)
        box = _auto_box(eps_sub, map_coeff)

        p = _monodromy_poly(tm[0, 0], w)
        center = p[deg // 2]
        scale = jnp.ldexp(jnp.asarray(1.0, rdt), -w)
        p_all = jnp.tile(p[None, :], (nvals, 1))
        p_all = p_all.at[:, deg // 2].set(
            center - jnp.asarray(rhs_vals).astype(cdt) * scale)
        polys = jnp.concatenate([p_all, tm[0, 1][None, :]], axis=0)

        def roots_one(c):
            return aberth_roots(c, newton_polygon_init_jax(c),
                                num_iters=num_aberth_iters)

        roots = jax.vmap(roots_one)(polys)              # [nvals+1, deg]
        lam_all = z_to_lambda(roots, eps_sub, disc)
        in_box = misc.filter_mask(lam_all, box)

        # --- lock-step Newton, exactly mirroring models.nsep's
        # _refine_mainspec (multiplicity line search, final plain step on
        # convergence) and _refine_auxspec, with masked-out points frozen
        base = nse.newton_base_discretization(disc)
        refine_tol = math.sqrt(eps_of(cdt))

        lam_main = lam_all[:nvals].reshape(-1)
        rhs_main = jnp.repeat(jnp.asarray(rhs_vals).astype(cdt), deg)
        mask_main = in_box[:nvals].reshape(-1)
        lam_aux = lam_all[nvals]
        mask_aux = in_box[nvals]
        k_main = lam_main.shape[0]

        def eval_main(pts):
            t, td = scatter_matrix(q_eff, r_eff, pts, eps_t, base,
                                   derivative=True)
            return (t[:, 0, 0] + t[:, 1, 1]), (td[:, 0, 0] + td[:, 1, 1])

        lam = lam_main
        f, fp = eval_main(lam)
        f = f - rhs_main
        frozen = ~mask_main
        rhs2 = jnp.concatenate([rhs_main, rhs_main])
        iters = max(1, (max_evals - 1) // 2)
        for _ in range(iters):
            fp_safe = jnp.where(fp == 0, 1.0, fp)
            incr = f / fp_safe
            cand = jnp.concatenate([lam - incr, lam - 2 * incr])
            fc, fpc = eval_main(cand)
            fc = fc - rhs2
            f1, f2 = fc[:k_main], fc[k_main:]
            pick2 = jnp.abs(f2) < jnp.abs(f1)
            lam_new = jnp.where(pick2, lam - 2 * incr, lam - incr)
            f_new = jnp.where(pick2, f2, f1)
            fp_new = jnp.where(pick2, fpc[k_main:], fpc[:k_main])
            conv = jnp.abs(f_new) < refine_tol
            fp_new_safe = jnp.where(fp_new == 0, 1.0, fp_new)
            lam_final = jnp.where(conv, lam_new - f_new / fp_new_safe,
                                  lam_new)
            lam = jnp.where(frozen, lam, lam_final)
            f = jnp.where(frozen, f, f_new)
            fp = jnp.where(frozen, fp, fp_new)
            frozen = frozen | conv | (fp == 0)
        lam_main_r = lam

        def eval_aux(pts):
            t, td = scatter_matrix(q_eff, r_eff, pts, eps_t, base,
                                   derivative=True)
            return t[:, 0, 1], td[:, 0, 1]

        lam = lam_aux
        frozen = ~mask_aux
        for _ in range(max_evals):
            fa, fpa = eval_aux(lam)
            fp_safe = jnp.where(fpa == 0, 1.0, fpa)
            lam_new = lam - fa / fp_safe
            lam = jnp.where(frozen | (fpa == 0), lam, lam_new)
            frozen = frozen | (jnp.abs(fa) < refine_tol) | (fpa == 0)
        lam_aux_r = lam
        # post filter: refined points must still be in the box
        mask_main = mask_main & misc.filter_mask(lam_main_r, box)
        mask_aux = mask_aux & misc.filter_mask(lam_aux_r, box)
        return (lam_main_r + lam_shift, mask_main,
                lam_aux_r + lam_shift, mask_aux)

    fn = jax.jit(jax.vmap(single))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("batch"))

        def sharded(qb, shifts):
            qb = jax.device_put(qb, NamedSharding(mesh, P("batch", None)))
            shifts = jax.device_put(shifts, sharding)
            return fn(qb, shifts)

        return sharded
    return fn


from functools import lru_cache


@lru_cache(maxsize=32)
def _cached_nsep_fn(d, t_span, kappa, disc, mesh, kw_items):
    return make_batched_nsep_fn(d, t_span, kappa=kappa, disc=disc,
                                mesh=mesh, **dict(kw_items))


def batched_nsep(q_batch, t_span, *, phase_shifts=None, kappa: int = +1,
                 disc: Discretization = Discretization.SPLIT2A,
                 mesh=None, **kw) -> BatchedNsepResult:
    """Main/aux spectra of a batch of periodic signals (masked results).

    The compiled program is cached per (D, t_span, config), so repeated
    serving calls reuse one jitted executable.
    """
    q_batch = jnp.asarray(q_batch)
    b, d = q_batch.shape
    if phase_shifts is None:
        shifts = jnp.zeros((b,), jnp.real(q_batch).dtype)
    else:
        t0, t1 = float(t_span[0]), float(t_span[1])
        shifts = jnp.asarray(phase_shifts) / (-2.0 * (t1 - t0))
    kw_items = tuple(sorted(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in kw.items()))
    fn = _cached_nsep_fn(d, (float(t_span[0]), float(t_span[1])), kappa,
                         disc, mesh, kw_items)
    main, mmask, aux, amask = fn(q_batch, shifts)
    return BatchedNsepResult(main_spectrum=main, main_mask=mmask,
                             aux_spectrum=aux, aux_mask=amask)
