"""Time-axis (D) sharding of the nsep refinement pipeline.

The reference's periodic driver refines every candidate main/aux spectrum
point with Newton sweeps over the FULL signal (refine_mainspec /
refine_auxspec, src/fnft_nsep.c:707-835): each iteration evaluates the
complete monodromy matrix (and its lambda-derivative) — a sequential
O(D) recursion per candidate in C. At D = 2^20 this refinement dominates
the nsep runtime; it is exactly the part multi-chip should carry.

TPU design (mirrors parallel/dshard_boundstates.py):

* the D (effective) samples are split into S contiguous time chunks, one
  per device on the ``seq`` mesh axis;
* each device reduces its chunk to one (T, T') transfer matrix per
  candidate via log-depth local products — O(D/S) per device;
* the S chunk matrices ([S, K, 2, 2] — a few KiB for K candidates) meet
  in a single ``all_gather`` over ICI and every device composes the
  total monodromy locally;
* the entire Newton sweep (the reference's m in {1,2} line-search for
  the main spectrum, plain Newton on T12 for the aux spectrum) runs as
  ONE XLA program (lax.fori_loop) inside shard_map — one collective per
  sweep, no host round-trips.

The subsampled localization stage (fast monodromy + batched Aberth)
stays replicated: its cost is O(Dsub^2), Dsub ~ sqrt(D log^2 D),
independent of the full-D axis this module shards.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from fnft_tpu.config import complex_dtype_of, eps_of
from fnft_tpu.models import nse
from fnft_tpu.models.discretization import Discretization, upsampling_factor
from fnft_tpu.ops.scatter import (
    _family_inputs,
    _pair_combine,
)
from fnft_tpu.parallel.dshard_boundstates import _local_products


def _total_monodromy(q_loc, r_loc, lam, eps_t, disc, seq_axis):
    """(T, T') of the full monodromy at candidates ``lam [K]``, composed
    from per-device chunk products with one all_gather (cf.
    nse_scatter_matrix semantics: ops/scatter.scatter_matrix)."""
    xs_loc, step_fn, scl = _family_inputs(q_loc, r_loc, eps_t, disc)
    m_loc, dm_loc = _local_products(xs_loc, step_fn, lam, True)
    gm = jax.lax.all_gather(m_loc, seq_axis)       # [S, K, 2, 2]
    gdm = jax.lax.all_gather(dm_loc, seq_axis)
    pm, pd = jax.lax.associative_scan(_pair_combine, (gm, gdm), axis=0)
    return pm[-1], pd[-1] * scl


def make_dshard_nsep_refine(d: int, mesh: Mesh, *, eps_t: float,
                            base_disc: Discretization,
                            iters_main: int, iters_aux: int,
                            seq_axis: str = "seq"):
    """Compile D-sharded nsep Newton refinement.

    Returns ``(refine_main, refine_aux)``:

    * ``refine_main(q_eff, r_eff, lam0 [K], rhs [K], tol) -> lam [K]`` —
      the reference's higher-order-root Newton with m in {1, 2} line
      search on Delta(lam) + rhs (refine_mainspec, fnft_nsep.c:707-793;
      the single-device twin is models/nsep._refine_mainspec_loop).
    * ``refine_aux(q_eff, r_eff, lam0 [K], tol) -> lam [K]`` — plain
      Newton on T12 (refine_auxspec, fnft_nsep.c:796-835).

    ``q_eff``/``r_eff`` are sharded over ``seq_axis``; candidates are
    replicated (they are O(K) scalars).
    """
    from fnft_tpu.parallel.sharding import as_auto_mesh

    mesh = as_auto_mesh(mesh)
    s = mesh.shape[seq_axis]
    ups = upsampling_factor(base_disc)
    d_eff = d * ups
    if d_eff % s or (d_eff // s) % ups:
        raise ValueError(
            f"D_eff={d_eff} must split into {s} whole-sample chunks")

    def main_body(q_loc, r_loc, lam0, rhs, tol):
        k = lam0.shape[0]
        rhs2 = jnp.concatenate([rhs, rhs])

        def floquet(lam):
            t, td = _total_monodromy(q_loc, r_loc, lam, eps_t, base_disc,
                                     seq_axis)
            return (t[:, 0, 0] + t[:, 1, 1]), (td[:, 0, 0] + td[:, 1, 1])

        f, fp = floquet(lam0)
        f = f + rhs

        def body(_, carry):
            lam, f, fp, frozen = carry
            fp_safe = jnp.where(fp == 0, 1.0, fp)
            incr = f / fp_safe
            cand = jnp.concatenate([lam - incr, lam - 2 * incr])
            fc, fpc = floquet(cand)
            fc = fc + rhs2
            f1, f2 = fc[:k], fc[k:]
            pick2 = jnp.abs(f2) < jnp.abs(f1)
            lam_new = jnp.where(pick2, lam - 2 * incr, lam - incr)
            f_new = jnp.where(pick2, f2, f1)
            fp_new = jnp.where(pick2, fpc[k:], fpc[:k])
            conv = jnp.abs(f_new) < tol
            fp_new_safe = jnp.where(fp_new == 0, 1.0, fp_new)
            lam_final = jnp.where(conv, lam_new - f_new / fp_new_safe,
                                  lam_new)
            lam = jnp.where(frozen, lam, lam_final)
            f = jnp.where(frozen, f, f_new)
            fp = jnp.where(frozen, fp, fp_new)
            return lam, f, fp, frozen | conv | (fp_new == 0)

        lam, _, _, _ = jax.lax.fori_loop(
            0, iters_main, body,
            (lam0, f, fp, jnp.zeros(k, dtype=bool)))
        return lam

    def aux_body(q_loc, r_loc, lam0, tol):
        def body(_, carry):
            lam, frozen = carry
            t, td = _total_monodromy(q_loc, r_loc, lam, eps_t, base_disc,
                                     seq_axis)
            f, fp = t[:, 0, 1], td[:, 0, 1]
            fp_safe = jnp.where(fp == 0, 1.0, fp)
            lam_new = lam - f / fp_safe
            lam = jnp.where(frozen | (fp == 0), lam, lam_new)
            return lam, frozen | (jnp.abs(f) < tol) | (fp == 0)

        lam, _ = jax.lax.fori_loop(
            0, iters_aux, body,
            (lam0, jnp.zeros(lam0.shape, dtype=bool)))
        return lam

    spec_seq = P(seq_axis)
    rep = P()
    main_fn = jax.jit(shard_map(
        main_body, mesh=mesh,
        in_specs=(spec_seq, spec_seq, rep, rep, rep),
        out_specs=rep, check_vma=False))
    aux_fn = jax.jit(shard_map(
        aux_body, mesh=mesh,
        in_specs=(spec_seq, spec_seq, rep, rep),
        out_specs=rep, check_vma=False))

    def _put(q_eff, r_eff):
        sh = NamedSharding(mesh, spec_seq)
        return (jax.device_put(jnp.asarray(q_eff), sh),
                jax.device_put(jnp.asarray(r_eff), sh))

    def refine_main(q_eff, r_eff, lam0, rhs, tol):
        q_eff, r_eff = _put(q_eff, r_eff)
        return main_fn(q_eff, r_eff, jnp.asarray(lam0), jnp.asarray(rhs),
                       jnp.asarray(tol))

    def refine_aux(q_eff, r_eff, lam0, tol):
        q_eff, r_eff = _put(q_eff, r_eff)
        return aux_fn(q_eff, r_eff, jnp.asarray(lam0), jnp.asarray(tol))

    refine_main.sharded_fn = main_fn
    refine_aux.sharded_fn = aux_fn
    return refine_main, refine_aux


def dshard_nsep_reference(q, t_span, mesh, *, kappa: int = +1,
                          phase_shift: float = 0.0, opts=None,
                          want_main: bool = True, want_aux: bool = True,
                          skip_real: bool = False, seq_axis: str = "seq"):
    """Full D-sharded nsep SUBSAMPLE_AND_REFINE (reference semantics:
    fnft_nsep.c:441-705 + refine loops :707-835).

    The subsampled localization (fast monodromy tree + one batched
    Aberth dispatch over all spines) runs replicated — its cost does not
    scale with D — and the full-D Newton refinement runs sharded over
    ``seq_axis``. Returns ``(main, aux)`` as filtered numpy arrays,
    directly comparable to ``models.nsep.nsep`` with
    ``Localization.SUBSAMPLE_AND_REFINE``.
    """
    from fnft_tpu.models import nsep as m
    from fnft_tpu.models.discretization import degree, z_to_lambda
    from fnft_tpu.ops.fscatter import fscatter
    from fnft_tpu.ops.roots import (certified_tol, poly_roots_batched,
                                    root_residuals)

    opts = opts or m.NsepOpts()
    disc = opts.discretization
    q = jnp.asarray(q)
    d = q.shape[-1]
    t0, t1 = float(t_span[0]), float(t_span[1])
    eps_t = (t1 - t0) / d        # periodic grid: no endpoint duplication
    lam_shift = phase_shift / (-2.0 * (t1 - t0))
    rdt = jnp.real(q).dtype
    tgrid = t0 + eps_t * jnp.arange(d, dtype=rdt)
    q_pre = q * jnp.exp(2j * lam_shift * tgrid)

    box = list(opts.bounding_box)
    if opts.filtering is m.PointFilter.MANUAL:
        box[0] -= lam_shift
        box[1] -= lam_shift
    box = tuple(box)

    # ---- replicated subsampled localization (nsep.py:234-296) ----------
    ups = upsampling_factor(disc)
    q_eff, r_eff, _, _ = nse.preprocess_signal(q_pre, eps_t, kappa, disc)
    dsub = opts.dsub
    if dsub == 0:
        dsub = int(2.0 ** math.ceil(0.5 * math.log2(d * math.log2(d) ** 2)))
    else:
        dsub = int(2.0 ** round(math.log2(dsub)))
    qs_eff, rs_eff, dsub_act, _ = nse.preprocess_signal(
        q_pre, eps_t, kappa, disc, dsub)
    nskip = d // dsub_act
    eps_t_sub = nskip * eps_t

    tm, w = fscatter(qs_eff, rs_eff, eps_t_sub, disc,
                     normalize=getattr(opts, 'normalization_flag', True))
    deg = tm.shape[-1] - 1
    map_coeff = 2.0 / degree(disc)
    if opts.filtering is m.PointFilter.AUTO:
        box = m._auto_box(eps_t_sub, map_coeff)
    tol_im = (box[1] - box[0]) / (m.OVERSAMPLING * (d - 1))
    cdt = complex_dtype_of(q_pre)
    refine_tol = math.sqrt(eps_of(cdt)) if opts.tol < 0 else opts.tol
    base = nse.newton_base_discretization(disc)
    iters = max(1, (opts.max_evals - 1) // 2)

    refine_main, refine_aux = make_dshard_nsep_refine(
        d, mesh, eps_t=eps_t, base_disc=base,
        iters_main=iters, iters_aux=opts.max_evals, seq_axis=seq_axis)

    def post_filter(lam):
        if opts.filtering is not m.PointFilter.NONE:
            lam = m._filter_np(lam, box)
        return lam[np.abs(np.imag(lam)) > tol_im] if skip_real else lam

    main = aux = None
    rhs_vals = np.zeros(0)
    polys = []
    if want_main:
        p = m._monodromy_poly(tm[0, 0], w)
        center = p[deg // 2]
        scale = 2.0 ** (-int(w))
        rhs0, rhs1 = opts.floquet_range
        nvals = opts.points_per_spine
        step = (rhs1 - rhs0) / (nvals - 1) if nvals > 1 else 0.0
        rhs_vals = 2.0 * (rhs0 + step * np.arange(nvals))
        p_all = jnp.tile(p[None, :], (nvals, 1))
        p_all = p_all.at[:, deg // 2].set(
            center - jnp.asarray(rhs_vals).astype(p.dtype) * scale)
        polys.append(p_all)
    if want_aux:
        polys.append(tm[0, 1][None, :])
    roots_all = poly_roots_batched(jnp.concatenate(polys, axis=0))
    lam_all = np.asarray(
        z_to_lambda(roots_all.reshape(-1), eps_t_sub, disc)
    ).reshape(roots_all.shape)

    if want_main:
        lam_parts, rhs_parts = [], []
        for nval in range(len(rhs_vals)):
            lam = post_filter(lam_all[nval])
            lam_parts.append(lam)
            rhs_parts.append(np.full(lam.shape, -rhs_vals[nval]))
        lam_cat = np.concatenate(lam_parts)
        rhs_cat = np.concatenate(rhs_parts)
        if lam_cat.size:
            lam_ref = refine_main(q_eff, r_eff, jnp.asarray(lam_cat),
                                  jnp.asarray(rhs_cat), refine_tol)
            main = post_filter(np.asarray(lam_ref))
        else:
            main = lam_cat
    if want_aux:
        eta = np.asarray(root_residuals(tm[0, 1], roots_all[-1]))
        lam = lam_all[-1][eta <= certified_tol(deg)]
        if opts.filtering is not m.PointFilter.NONE:
            lam = m._filter_np(lam, box)
        if lam.size:
            lam = np.asarray(refine_aux(q_eff, r_eff, jnp.asarray(lam),
                                        refine_tol))
        aux = post_filter(lam)
    if main is not None:
        main = main + lam_shift
    if aux is not None:
        aux = aux + lam_shift
    return main, aux
