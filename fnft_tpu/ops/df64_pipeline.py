"""Reference-accuracy forward NFT in pure float32-pair (df64) arithmetic.

Everything a TPU cannot do in hardware float64 — the per-sample transfer
matrices, the fmult tree, the chirp-Z spectral evaluation, and the phase
factors — computed in df64 (fnft_tpu.ops.df64):

* the one-step zero-frequency matrix expm([[0,q],[r,0]] h) is evaluated
  through the *even* series in w = (q r) h^2:
      cos(D) = sum_k w^k/(2k)!,  h sinc(D) = h sum_k w^k/(2k+1)!
  (D = h sqrt(-q r); no square roots needed), which converges to 1e-16
  for |w| <~ 1 — always true for resolvable steps;
* the splitting combinator folds E/Z factors exactly as ops.fscatter but
  on df64 coefficient pytrees;
* chirp-Z spiral tables are computed on the host in extended precision and
  shipped as hi/lo planes.

Input/output are complex128 at the API boundary; on-device everything is
float32 pairs.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fnft_tpu.models.discretization import Discretization, degree, splitting_spec
from fnft_tpu.ops.df64 import (
    _cdf_index,
    cdf_add,
    cdf_from_c128,
    cdf_mul,
    cdf_sub,
    cdf_to_c128,
    df_from_f64,
    fft_df64,
)
from fnft_tpu.ops.poly import _spiral_table
from fnft_tpu.utils.misc import next_fft_length

_SERIES_TERMS = 12


def _cdf_scale_f64(x, s: float):
    """Multiply a cdf value by a host float (split into df64)."""
    sc = (jnp.float32(np.float32(s)),
          jnp.float32(np.float64(s) - np.float64(np.float32(s))))
    return (_df_mul_scalar(x[0], sc), _df_mul_scalar(x[1], sc))


def _df_mul_scalar(x, s):
    from fnft_tpu.ops.df64 import df_mul

    sh = jnp.broadcast_to(s[0], x[0].shape)
    sl = jnp.broadcast_to(s[1], x[0].shape)
    return df_mul(x, (sh, sl))


def _even_series(w, coeffs_f64):
    """sum_k c_k w^k in cdf arithmetic (w complex df64, c_k host floats)."""
    # Horner from the highest term
    acc = None
    for ck in reversed(coeffs_f64):
        ck32 = np.float32(ck)
        term = ((jnp.broadcast_to(jnp.float32(ck32), w[0][0].shape),
                 jnp.broadcast_to(jnp.float32(np.float64(ck)
                                              - np.float64(ck32)),
                                  w[0][0].shape)),
                (jnp.zeros_like(w[0][0]), jnp.zeros_like(w[0][0])))
        acc = term if acc is None else cdf_add(cdf_mul(acc, w), term)
    return acc


def _zero_freq_matrix_df64(q, r, h: float):
    """df64 entries (E00, E01, E10) of expm([[0,q],[r,0]] h) via series."""
    qr = cdf_mul(q, r)
    w = _cdf_scale_f64(qr, h * h)           # w = q r h^2 = -Delta^2... sign:
    # cos(D) with D^2 = -q r h^2: cos(D) = sum (-1)^k D^2k/(2k)! =
    # sum (q r h^2)^k/(2k)!  -> even series in +w
    cos_c = [1.0 / math.factorial(2 * k) for k in range(_SERIES_TERMS)]
    sinc_c = [1.0 / math.factorial(2 * k + 1) for k in range(_SERIES_TERMS)]
    e00 = _even_series(w, cos_c)
    hsinc = _cdf_scale_f64(_even_series(w, sinc_c), h)
    e01 = cdf_mul(q, hsinc)
    e10 = cdf_mul(r, hsinc)
    return e00, e01, e10


def transfer_matrix_coeffs_df64(q, r, eps_t: float, disc: Discretization):
    """df64 per-sample polynomial matrices; mirrors ops.fscatter."""
    deg = degree(disc)
    if deg == 0 or disc is Discretization.SPLIT2_MODAL:
        raise ValueError(f"df64 pipeline supports splitting schemes, got {disc}")
    spec = splitting_spec(disc)
    e_weights = sorted({a for _, fs in spec for kind, a in fs if kind == "E"})
    e_mats = {a: _zero_freq_matrix_df64(q, r, a * eps_t / deg)
              for a in e_weights}

    d = q[0][0].shape[-1]

    def zeros_poly(clen):
        zz = jnp.zeros((d, 2, 2, clen), jnp.float32)
        return ((zz, zz), (zz, zz))

    def set_entry(poly, i, j, k, val):
        # val: cdf scalar-per-sample [d]; place at [:, i, j, k]
        def upd(t, v):
            return t.at[:, i, j, k].set(v)
        ((rh, rl), (ih, il)) = poly
        ((vrh, vrl), (vih, vil)) = val
        return ((upd(rh, vrh), upd(rl, vrl)), (upd(ih, vih), upd(il, vil)))

    total = zeros_poly(deg + 1)
    for coeff, factors in spec:
        p = None  # [d, 2, 2, c] cdf
        for kind, a in factors:
            if kind == "E":
                e00, e01, e10 = e_mats[a]
                if p is None:
                    p = zeros_poly(1)
                    p = set_entry(p, 0, 0, 0, e00)
                    p = set_entry(p, 0, 1, 0, e01)
                    p = set_entry(p, 1, 0, 0, e10)
                    p = set_entry(p, 1, 1, 0, e00)
                else:
                    # p @ E, coefficientwise: out[i,j] = sum_k p[i,k] E[k,j]
                    ent = {(0, 0): e00, (0, 1): e01, (1, 0): e10, (1, 1): e00}

                    def col(pp, i, k):
                        return jax.tree.map(lambda t: t[:, i, k, :], pp)

                    cols = []
                    for i in range(2):
                        row = []
                        for j in range(2):
                            acc = None
                            for k in range(2):
                                ev = jax.tree.map(
                                    lambda t: t[:, None], ent[(k, j)])
                                term = cdf_mul(col(p, i, k), ev)
                                acc = term if acc is None else cdf_add(acc, term)
                            row.append(acc)
                        cols.append(row)
                    p = _assemble(cols)
            else:
                ai = int(round(a))
                if p is None:
                    p = zeros_poly(ai + 1)
                    one = _const_cdf(d, 1.0)
                    p = set_entry(p, 0, 0, 0, one)
                    p = set_entry(p, 1, 1, ai, one)
                else:
                    # multiply column 2 by z^a: extend and shift
                    p = _extend(p, ai)
                    p = _shift_col2(p, ai)
        p = _extend_to(p, deg + 1)
        total = cdf_add(total, _cdf_poly_scale(p, float(coeff)))
    return total


def _assemble(cols):
    """cols[i][j]: cdf [d, c] -> cdf [d, 2, 2, c]."""
    def stack(getter):
        return jnp.stack([jnp.stack([getter(cols[i][j]) for j in range(2)],
                                    axis=1) for i in range(2)], axis=1)
    return ((stack(lambda v: v[0][0]), stack(lambda v: v[0][1])),
            (stack(lambda v: v[1][0]), stack(lambda v: v[1][1])))


def _const_cdf(d, val: float):
    v32 = np.float32(val)
    return ((jnp.full((d,), v32, jnp.float32),
             jnp.full((d,), np.float32(val - np.float64(v32)), jnp.float32)),
            (jnp.zeros((d,), jnp.float32), jnp.zeros((d,), jnp.float32)))


def _extend(p, extra: int):
    def f(t):
        return jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, extra)])
    return jax.tree.map(f, p)


def _extend_to(p, clen: int):
    cur = p[0][0].shape[-1]
    if cur >= clen:
        return jax.tree.map(lambda t: t[..., :clen], p)
    return _extend(p, clen - cur)


def _shift_col2(p, a: int):
    def f(t):
        col2 = t[:, :, 1, :]
        shifted = jnp.concatenate(
            [jnp.zeros(col2.shape[:-1] + (a,), col2.dtype),
             col2[..., :-a]], axis=-1)
        return jnp.stack([t[:, :, 0, :], shifted], axis=2)
    return jax.tree.map(f, p)


def _cdf_poly_scale(p, s: float):
    s32 = np.float32(s)
    pair = (jnp.float32(s32), jnp.float32(np.float64(s) - np.float64(s32)))

    def scale_df(x):
        from fnft_tpu.ops.df64 import df_mul
        return df_mul(x, (jnp.broadcast_to(pair[0], x[0].shape),
                          jnp.broadcast_to(pair[1], x[0].shape)))

    return (scale_df(p[0]), scale_df(p[1]))


# ---------------------------------------------------------------------------
# df64 tree + chirp-Z + phases
# ---------------------------------------------------------------------------

def _tree_df64(p, n_true: int, deg_in: int):
    """df64 fmult tree on cdf [n, 2, 2, c]; returns (cdf [2,2,out], w)."""
    n = p[0][0].shape[0]
    w = jnp.zeros((n,), jnp.int32)
    levels = int(math.log2(n)) if n > 1 else 0
    c = p[0][0].shape[-1]
    for _ in range(levels):
        a = _cdf_index(p, (slice(0, None, 2),))
        b = _cdf_index(p, (slice(1, None, 2),))
        length = next_fft_length(2 * c - 1)
        fa = fft_df64(jax.tree.map(
            lambda t: jnp.pad(t, [(0, 0)] * (t.ndim - 1)
                              + [(0, length - t.shape[-1])]), a), length)
        fb = fft_df64(jax.tree.map(
            lambda t: jnp.pad(t, [(0, 0)] * (t.ndim - 1)
                              + [(0, length - t.shape[-1])]), b), length)

        def entry(i, j):
            t0 = cdf_mul(_cdf_index(fb, (Ellipsis, i, 0, slice(None))),
                         _cdf_index(fa, (Ellipsis, 0, j, slice(None))))
            t1 = cdf_mul(_cdf_index(fb, (Ellipsis, i, 1, slice(None))),
                         _cdf_index(fa, (Ellipsis, 1, j, slice(None))))
            return cdf_add(t0, t1)

        rows = []
        for i in range(2):
            cols = [entry(i, j) for j in range(2)]
            rows.append(jax.tree.map(lambda *xs: jnp.stack(xs, axis=-2), *cols))
        fc = jax.tree.map(lambda *xs: jnp.stack(xs, axis=-3), *rows)
        prod = fft_df64(fc, length, inverse=True)
        prod = _cdf_index(prod, (Ellipsis, slice(0, 2 * c - 1)))
        hi_mag = jnp.maximum(jnp.abs(prod[0][0]), jnp.abs(prod[1][0]))
        max_abs = jnp.max(hi_mag, axis=(-3, -2, -1))
        safe = jnp.where(max_abs > 0, max_abs, 1.0)
        a_exp = jnp.where(max_abs > 0, jnp.floor(jnp.log2(safe)), 0.0)
        scale = jnp.exp2(-a_exp)[..., None, None, None].astype(jnp.float32)
        p = jax.tree.map(lambda t: t * scale, prod)
        w = w[0::2] + w[1::2] + a_exp.astype(jnp.int32)
        c = 2 * c - 1
    return _cdf_index(p, (0,)), w[0]


def _chirpz_df64(coeffs, a_pt: complex, w_pt: complex, m: int):
    """df64 chirp-Z of a cdf coefficient vector."""
    n = coeffs[0][0].shape[-1]
    length = next_fft_length(n + m - 1)
    ks = np.arange(max(n, m), dtype=np.float64)
    w_half = _spiral_table(complex(w_pt), 0.5 * ks * ks)
    a_pow = _spiral_table(complex(a_pt), ks[:n])
    x_weight = cdf_from_c128(jnp.asarray(a_pow * w_half[:n]))
    x = cdf_mul(coeffs, x_weight)

    v = np.zeros(length, dtype=np.complex128)
    v[:m] = 1.0 / w_half[:m]
    neg = _spiral_table(complex(w_pt), 0.5 * ks[1:n] * ks[1:n])
    v[length - n + 1:] = (1.0 / neg)[::-1]
    v_f = cdf_from_c128(jnp.asarray(np.fft.fft(v)))

    xf = fft_df64(jax.tree.map(
        lambda t: jnp.pad(t, [(0, 0)] * (t.ndim - 1)
                          + [(0, length - t.shape[-1])]), x), length)
    conv = fft_df64(cdf_mul(xf, v_f), length, inverse=True)
    out = cdf_mul(_cdf_index(conv, (Ellipsis, slice(0, m))),
                  cdf_from_c128(jnp.asarray(w_half[:m])))
    return out


def nsev_contspec_df64(q128, *, d: int, m: int, t_span, xi_span,
                       kappa: int = +1,
                       disc: Discretization = Discretization.SPLIT4B):
    """Reflection coefficient at reference accuracy in float32-pair ops.

    ``q128`` is complex128 (split at the boundary); every on-device
    operation is float32. Returns rho [m] complex128.

    Host-orchestrated (not one monolithic jit) so the per-length
    :func:`fft_df64` programs are compiled once and shared across the
    tree levels and the chirp transform.
    """
    from fnft_tpu.models import nse

    t0, t1 = t_span
    xi0, xi1 = xi_span
    eps_t = (t1 - t0) / (d - 1)
    deg1 = max(degree(disc), 1)

    q = cdf_from_c128(jnp.asarray(q128))
    # r = -kappa conj(q): negate real planes, conj flips the imag sign
    r = ((-kappa * q[0][0], -kappa * q[0][1]),
         (kappa * q[1][0], kappa * q[1][1]))

    p = transfer_matrix_coeffs_df64(q, r, eps_t, disc)
    tm, w = _tree_df64(p, d, degree(disc))

    eps_xi = (xi1 - xi0) / (m - 1)
    a_pt = complex(np.exp(2j * xi0 * eps_t / deg1))
    w_pt = complex(np.exp(2j * eps_xi * eps_t / deg1))
    h11 = _chirpz_df64(_cdf_index(tm, (0, 0)), a_pt, w_pt, m)
    h21 = _chirpz_df64(_cdf_index(tm, (1, 0)), a_pt, w_pt, m)

    pf = nse.phase_factor_rho(eps_t, t1, disc)
    xi = np.linspace(xi0, xi1, m)
    phase = cdf_from_c128(jnp.asarray(np.exp(1j * xi * pf)))
    num = cdf_mul(h21, phase)
    # rho = num / h11 in complex128 at the boundary (single divide)
    return cdf_to_c128(num) / cdf_to_c128(h11)