"""Batched polynomial rootfinding — the TPU replacement for eiscor.

The reference locates all roots of (monodromy) polynomials with a Fortran
unitary-plus-rank-one companion QR (src/3rd_party/eiscor, entry
z_poly_roots_modified.f90:39-122, shim fnft__poly_roots_fasteigen.c:25-48).
A sequential QR iteration maps poorly to TPUs; instead we use the
Ehrlich–Aberth simultaneous all-root iteration:

    z_i <- z_i - w_i / (1 - w_i * sum_{j != i} 1/(z_i - z_j)),  w_i = p/p'

which is embarrassingly parallel across roots (O(deg^2) work per sweep on
the VPU/MXU) and converges cubically for simple roots. Initial guesses come
from the Newton polygon (upper convex hull of (k, log|c_k|)) following
Bini, "Numerical computation of polynomial zeros by means of Aberth's
method", Numer. Algorithms 13 (1996) — the standard robust initialization.

The polynomial evaluation inside the iteration is a *block Horner*: the
coefficient array is reshaped into [num_chunks, L] and contracted against a
Vandermonde block [L, K] on the MXU, so the sequential depth is deg/L
instead of deg.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fnft_tpu.config import complex_dtype_of, eps_of

_CHUNK = 64


def _block_eval_ratio(coeffs, z):
    """w = p(z)/p'(z), evaluated stably for |z| inside/outside the unit disk.

    Uses r(z) = p(z)/p'(z) = 1 / d/dz[log p(z)]. For |z| > 1 we evaluate the
    reversed polynomial q(u) = u^deg p(1/u) at u = 1/z:
        p'(z)/p(z) = deg/z - q'(u)/q(u) * u^2 ... simplified below.
    Overflow is avoided because only ratios are formed.
    """
    deg = coeffs.shape[-1] - 1
    kvec = jnp.arange(deg + 1, dtype=jnp.real(coeffs).dtype)

    inside = jnp.abs(z) <= 1.0
    u = jnp.where(inside, z, 1.0 / jnp.where(z == 0, 1.0, z))

    def eval_pair(cs, x):
        """(p(x), s(x)) with s = sum k c_k x^k, block-Horner on chunks."""
        n = cs.shape[-1]
        nch = -(-n // _CHUNK)
        pad = nch * _CHUNK - n
        cs_p = jnp.pad(cs, (0, pad)).reshape(nch, _CHUNK)
        ks_p = jnp.pad(cs * kvec[:n], (0, pad)).reshape(nch, _CHUNK)
        # Vandermonde block x^j for j < CHUNK: [CHUNK, K]
        xp = jnp.cumprod(jnp.concatenate([jnp.ones_like(x)[None],
                                          jnp.tile(x[None], (_CHUNK - 1, 1))], 0), axis=0)
        inner_p = cs_p @ xp   # [nch, K]
        inner_s = ks_p @ xp
        x_l = xp[-1] * x      # x^CHUNK

        def step(carry, inners):
            accp, accs = carry
            ip, is_ = inners
            return (accp * x_l + ip, accs * x_l + is_), None

        (pv, sv), _ = jax.lax.scan(
            step,
            (jnp.zeros_like(x), jnp.zeros_like(x)),
            (inner_p[::-1], inner_s[::-1]),
        )
        return pv, sv

    p_in, s_in = eval_pair(coeffs, u)           # for |z| <= 1
    p_rev, s_rev = eval_pair(coeffs[::-1], u)   # q(u), sum k q_k u^k

    # inside: p'/p = s_in / (z * p_in)
    safe_pin = jnp.where(p_in == 0, 1.0, p_in)
    lg_in = s_in / (u * safe_pin)
    # outside: p(z) = z^deg q(u);  p'/p = (deg - s_rev/q) / z = u*(deg - s_rev/q)
    safe_prev = jnp.where(p_rev == 0, 1.0, p_rev)
    lg_out = u * (deg - s_rev / safe_prev)
    log_deriv = jnp.where(inside, lg_in, lg_out)

    p_is_zero = jnp.where(inside, p_in == 0, p_rev == 0)
    w = 1.0 / jnp.where(log_deriv == 0, 1.0, log_deriv)
    w = jnp.where(p_is_zero, 0.0, w)  # exactly at a root: no update
    return w


def _newton_polygon_init(abs_coeffs: np.ndarray) -> np.ndarray:
    """Bini initial guesses from the upper convex hull of (k, log|c_k|)."""
    n = len(abs_coeffs) - 1
    with np.errstate(divide="ignore"):
        logc = np.where(abs_coeffs > 0, np.log(np.where(abs_coeffs > 0,
                                                        abs_coeffs, 1.0)), -np.inf)
    # upper convex hull via monotone chain over indices with finite logc
    idx = [k for k in range(n + 1) if np.isfinite(logc[k])]
    if len(idx) < 2:  # degenerate polynomial; fall back to unit circle
        ang = 2 * np.pi * (np.arange(n) + 0.5) / max(n, 1) + 0.3
        return np.exp(1j * ang)
    hull: list[int] = []
    for k in idx:
        while len(hull) >= 2:
            i, j = hull[-2], hull[-1]
            # keep hull upper-convex: drop j if it lies below segment (i, k)
            if (logc[j] - logc[i]) * (k - i) <= (logc[k] - logc[i]) * (j - i):
                hull.pop()
            else:
                break
        hull.append(k)
    guesses = np.zeros(n, dtype=np.complex128)
    pos = 0
    # roots "at infinity" for leading zero coefficients: big circle
    if hull[-1] < n:
        m = n - hull[-1]
        big = 1e6
        ang = 2 * np.pi * (np.arange(m) + 0.5) / m
        guesses[pos: pos + m] = big * np.exp(1j * ang)
        pos += m
    # roots at ~0 for trailing zero coefficients
    if hull[0] > 0:
        m = hull[0]
        ang = 2 * np.pi * (np.arange(m) + 0.5) / m
        guesses[pos: pos + m] = 1e-6 * np.exp(1j * ang)
        pos += m
    sigma = 0.7  # fixed rotation offset decorrelating circles (Bini sec. 5)
    for a, b in zip(hull[:-1], hull[1:]):
        m = b - a
        r = (abs_coeffs[a] / abs_coeffs[b]) ** (1.0 / m)
        r = min(max(r, 1e-12), 1e12)
        ang = 2 * np.pi * (np.arange(m) + 0.5) / m + sigma * b
        guesses[pos: pos + m] = r * np.exp(1j * ang)
        pos += m
    return guesses[:n]


def newton_polygon_init_jax(coeffs):
    """Traceable Newton-polygon initial guesses (Bini) for ``coeffs``.

    Builds the upper convex hull of (k, log|c_k|) with a lax.scan (stack in
    a fixed-size array), then places roots on the per-segment circles. All
    shapes static: returns ``[deg]`` initial points. Vmappable, so batched
    pipelines get polygon-quality starts without host syncs.
    """
    coeffs = jnp.asarray(coeffs)
    n1 = coeffs.shape[-1]
    deg = n1 - 1
    rdt = jnp.real(coeffs).dtype
    absc = jnp.abs(coeffs)
    neg_inf = jnp.asarray(-jnp.inf, rdt)
    logc = jnp.where(absc > 0, jnp.log(jnp.where(absc > 0, absc, 1.0)),
                     neg_inf)

    # Andrew monotone chain (upper hull) over valid points
    def push(carry, k):
        stack, size = carry  # stack: int32[n1], size: int32
        valid = jnp.isfinite(logc[k])

        def pop_cond(state):
            st, sz = state
            i = st[jnp.maximum(sz - 2, 0)]
            j = st[jnp.maximum(sz - 1, 0)]
            drop = (logc[j] - logc[i]) * (k - i).astype(rdt) <= \
                (logc[k] - logc[i]) * (j - i).astype(rdt)
            return (sz >= 2) & drop

        def pop_body(state):
            st, sz = state
            return st, sz - 1

        stack, size = jax.lax.cond(
            valid,
            lambda s: jax.lax.while_loop(pop_cond, pop_body, s),
            lambda s: s, (stack, size))
        stack = jnp.where(valid, stack.at[size].set(k), stack)
        size = jnp.where(valid, size + 1, size)
        return (stack, size), None

    stack0 = jnp.zeros((n1,), jnp.int32)
    (stack, size), _ = jax.lax.scan(push, (stack0, jnp.int32(0)),
                                    jnp.arange(n1, dtype=jnp.int32))

    # per-coefficient segment assignment: root slot r (0..deg-1) belongs to
    # hull segment (stack[s], stack[s+1]) covering ks in [stack[s], stack[s+1})
    seg_start = stack                                  # [n1]
    seg_end = jnp.roll(stack, -1)                      # [n1]
    seg_valid = jnp.arange(n1) < (size - 1)
    # radius per segment
    a_idx, b_idx = seg_start, seg_end
    safe_m = jnp.maximum((b_idx - a_idx).astype(rdt), 1.0)
    r_seg = jnp.exp((logc[a_idx] - logc[b_idx]) / safe_m)
    r_seg = jnp.clip(jnp.where(seg_valid, r_seg, 1.0), 1e-12, 1e12)

    # map each root slot to its segment via searchsorted on seg_start
    slots = jnp.arange(deg)
    first = stack[0]
    pos = jnp.clip(slots + first, 0, n1 - 1)   # roots indexed from the first hull vertex
    starts = jnp.where(seg_valid, seg_start, n1 + 1)
    seg_of = jnp.clip(jnp.searchsorted(starts, pos, side="right") - 1, 0,
                      n1 - 1)
    radius = r_seg[seg_of]
    m_seg = jnp.maximum(seg_end[seg_of] - seg_start[seg_of], 1).astype(rdt)
    j_in = (pos - seg_start[seg_of]).astype(rdt)
    two_pi = 6.283185307179586
    ang = two_pi * (j_in + 0.5) / m_seg + 0.7 * seg_end[seg_of].astype(rdt)
    return (radius * jnp.exp(1j * ang)).astype(complex_dtype_of(coeffs))


@partial(jax.jit, static_argnames=("num_iters", "return_iters"))
def aberth_roots(coeffs, z0, num_iters: int = 80,
                 return_iters: bool = False):
    """Run Ehrlich–Aberth sweeps from initial guesses ``z0``.

    Args:
      coeffs: ascending coefficients ``[deg+1]`` (complex).
      z0: initial guesses ``[deg]``.
      num_iters: maximum sweeps (early exit on convergence).
      return_iters: also return the executed sweep count (int32 scalar).

    Returns roots ``[deg]`` (and the sweep count when ``return_iters``).
    """
    coeffs = jnp.asarray(coeffs)
    cdt = complex_dtype_of(coeffs)
    coeffs = coeffs.astype(cdt)
    z0 = jnp.asarray(z0).astype(cdt)
    deg = coeffs.shape[-1] - 1
    tol = 100.0 * eps_of(cdt)

    def _pairwise_sum(z):
        """sum_{j != i} 1/(z_i - z_j); chunked above 4096 roots to bound
        the O(deg^2) distance matrix memory. The chunk width shrinks with
        deg so the [deg, chunk] block stays <= ~2^26 elements (1 GiB in
        c128) even at eiscor's worst case deg ~ 1e5."""
        if deg <= 4096:
            eye = jnp.eye(deg, dtype=bool)
            diff = z[:, None] - z[None, :]
            inv = jnp.where(eye, 0.0, 1.0 / jnp.where(eye, 1.0, diff))
            return jnp.sum(inv, axis=1)
        chunk = max(512, min(4096, (1 << 26) // deg))
        nch = -(-deg // chunk)
        zp = jnp.pad(z, (0, nch * chunk - deg))
        idx = jnp.arange(deg)

        def body(c, acc):
            zc = jax.lax.dynamic_slice_in_dim(zp, c * chunk, chunk)
            jc = c * chunk + jnp.arange(chunk)
            diff = z[:, None] - zc[None, :]
            bad = (idx[:, None] == jc[None, :]) | (jc[None, :] >= deg)
            inv = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, diff))
            return acc + jnp.sum(inv, axis=1)

        return jax.lax.fori_loop(0, nch, body, jnp.zeros_like(z))

    rdt = jnp.real(z0).dtype

    def sweep(state):
        z, frozen, _, it = state
        w = _block_eval_ratio(coeffs, z)
        s = _pairwise_sum(z)
        denom = 1.0 - w * s
        corr = w / jnp.where(denom == 0, 1.0, denom)
        z_new = jnp.where(frozen, z, z - corr)
        rel = jnp.abs(corr) / jnp.maximum(jnp.abs(z_new), 1e-30)
        # freeze converged roots: they stop moving but keep repelling the
        # others through the pairwise sum (cluster stability at deg ~1e4+)
        frozen = frozen | (rel < tol)
        moved = jnp.max(jnp.where(frozen, 0.0, rel))
        return z_new, frozen, moved, it + 1

    def cond(state):
        _, _, moved, it = state
        return (moved > tol) & (it < num_iters)

    def run(z_init, frozen_init, iters):
        return jax.lax.while_loop(
            cond, sweep,
            (z_init, frozen_init, jnp.asarray(jnp.inf, rdt), iters))

    z, frozen, _, it = run(z0, jnp.zeros(deg, dtype=bool), 0)

    # stagnation restart (eiscor analogue: deflation restarts). Roots still
    # moving after the budget are nudged off the stagnation cycle by a
    # deterministic per-root phase kick and given the remaining sweeps.
    def restart(args):
        z_, frozen_, it_ = args
        kick = 1.0 + 64.0 * tol * jnp.cos(
            jnp.arange(deg, dtype=rdt) * 2.399963229728653)  # golden angle
        z_k = jnp.where(frozen_, z_, z_ * kick.astype(z_.dtype))
        z2, _, _, it2 = run(z_k, frozen_, num_iters // 2)
        # restart resumes the sweep counter at num_iters//2; report total
        # executed sweeps = it (first phase) + (it2 - num_iters//2)
        return z2, it_ + (it2 - num_iters // 2)

    z, it = jax.lax.cond(jnp.all(frozen), lambda a: (a[0], a[2]), restart,
                         (z, frozen, it))
    if return_iters:
        return z, it
    return z


@jax.jit
def root_residuals(coeffs, z):
    """Per-root relative backward error ``eta_i`` of ``z`` w.r.t. ``coeffs``.

    ``eta_i = |p(z_i)| / sum_k |c_k| |z_i|^k`` is the smallest relative
    coefficient-wise perturbation making ``z_i`` an exact root (Mosier's
    bound); eiscor is backward stable by construction, so certified Aberth
    roots (``eta <= ~deg * eps``) match its contract. For ``|z| > 1`` the
    reversed polynomial is used so nothing overflows.

    Returns ``eta`` with the same shape as ``z`` (real dtype).
    """
    coeffs = jnp.asarray(coeffs)
    cdt = complex_dtype_of(coeffs)
    coeffs = coeffs.astype(cdt)
    z = jnp.asarray(z).astype(cdt)
    rdt = jnp.real(coeffs).dtype
    deg = coeffs.shape[-1] - 1

    inside = jnp.abs(z) <= 1.0
    u = jnp.where(inside, z, 1.0 / jnp.where(z == 0, 1.0, z))
    au = jnp.abs(u)

    def eval_abs_pair(cs, x, ax):
        """(p(x), sum_k |c_k| ax^k) block-Horner (cf. _block_eval_ratio)."""
        n = cs.shape[-1]
        nch = -(-n // _CHUNK)
        pad = nch * _CHUNK - n
        cs_p = jnp.pad(cs, (0, pad)).reshape(nch, _CHUNK)
        ab_p = jnp.pad(jnp.abs(cs), (0, pad)).reshape(nch, _CHUNK)
        xp = jnp.cumprod(jnp.concatenate(
            [jnp.ones_like(x)[None], jnp.tile(x[None], (_CHUNK - 1, 1))], 0),
            axis=0)
        axp = jnp.cumprod(jnp.concatenate(
            [jnp.ones_like(ax)[None], jnp.tile(ax[None], (_CHUNK - 1, 1))], 0),
            axis=0)
        inner_p = cs_p @ xp
        inner_a = ab_p @ axp
        x_l = xp[-1] * x
        ax_l = axp[-1] * ax

        def step(carry, inners):
            accp, acca = carry
            ip, ia = inners
            return (accp * x_l + ip, acca * ax_l + ia), None

        (pv, av), _ = jax.lax.scan(
            step, (jnp.zeros_like(x), jnp.zeros_like(ax)),
            (inner_p[::-1], inner_a[::-1]))
        return pv, av

    p_in, a_in = eval_abs_pair(coeffs, u, au)
    p_rev, a_rev = eval_abs_pair(coeffs[::-1], u, au)
    pv = jnp.where(inside, jnp.abs(p_in), jnp.abs(p_rev))
    av = jnp.where(inside, a_in, a_rev)
    return (pv / jnp.maximum(av, jnp.asarray(np.finfo(np.float64).tiny,
                                             rdt))).astype(rdt)


def certified_tol(deg: int, dtype=np.complex128) -> float:
    """Default acceptance threshold for :func:`root_residuals`: a backward
    error of O(deg * eps) is what a backward-stable method (eiscor)
    guarantees; the 64x headroom absorbs Aberth's final-sweep noise."""
    return 64.0 * max(deg, 1) * float(eps_of(np.dtype(dtype)))


def poly_roots(coeffs, num_iters: int = 80, init: str = "auto",
               return_residuals: bool = False):
    """All roots of a polynomial via Ehrlich-Aberth sweeps on device.

    Drop-in for the reference's poly_roots_fasteigen (eiscor). Initial
    guesses come from the Newton polygon; ``init`` selects where the
    polygon is built:

    * ``"device"`` — the traced hull (:func:`newton_polygon_init_jax`)
      fuses into the same XLA program as the sweeps, so accelerator
      pipelines run without a host round-trip per polynomial.
    * ``"host"`` — concrete coefficient magnitudes on the host (native
      C++ hull when built). A CPU fast path: the hull is O(deg) scalar
      work that a host core does quicker than a lax.scan.
    * ``"auto"`` (default) — ``"host"`` when the default backend is CPU,
      ``"device"`` otherwise.

    With ``return_residuals=True`` also returns the per-root relative
    backward error from :func:`root_residuals` (certificate contract:
    accept roots with ``eta <= certified_tol(deg)``).
    """
    coeffs = jnp.asarray(coeffs)
    if init == "auto":
        init = "host" if jax.default_backend() == "cpu" else "device"
    if init == "device":
        z0 = newton_polygon_init_jax(coeffs)
    else:
        abs_c = np.abs(np.asarray(jax.device_get(coeffs), dtype=np.complex128))
        try:
            from fnft_tpu.native import newton_polygon_init as _init
            z0 = jnp.asarray(_init(abs_c))
        except Exception:
            z0 = jnp.asarray(_newton_polygon_init(abs_c))
    roots = aberth_roots(coeffs, z0, num_iters=num_iters)
    if return_residuals:
        return roots, root_residuals(coeffs, roots)
    return roots


@partial(jax.jit, static_argnames=("num_iters",))
def poly_roots_batched(coeffs, num_iters: int = 80):
    """Roots of a batch of same-degree polynomials ``[B, deg+1] -> [B, deg]``.

    One XLA program: vmapped traced Newton-polygon init + Aberth sweeps.
    Replaces per-polynomial :func:`poly_roots` loops (e.g. the reference's
    per-spine eiscor calls in fnft_nsep.c:556-608) with a single device
    dispatch.
    """
    coeffs = jnp.asarray(coeffs)

    def one(c):
        return aberth_roots(c, newton_polygon_init_jax(c),
                            num_iters=num_iters)

    return jax.vmap(one)(coeffs)
