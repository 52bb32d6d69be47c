"""Fast inverse scattering: recover q from a transfer-matrix polynomial.

TPU rebuild of fnft__nse_finvscatter.c:29-366. The divide-and-conquer layer
peeling works on ascending coefficients:

  T(z) covers samples [0, D). Its low-order half (coefficients z^0..z^{d/2})
  approximates T2(z), the transfer matrix of the *later* samples [D/2, D).
  Recursing on it yields those samples and T2^{-1}(z) (up to a power of z);
  T1 = T2^{-1} T (middle coefficient window) covers the earlier samples.

The recursion tree is static, so it unrolls at trace time; every node is a
pair of polynomial 2x2 products. Small products use direct (quadratic)
convolution to keep the trace light; large ones use FFTs. The recursion
depth is log2(D) and the *execution* order is inherently sequential in the
sample blocks, but all matrix/coefficient arithmetic inside a node is
batched — and the whole transform vmaps over a batch of signals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fnft_tpu.config import complex_dtype_of
from fnft_tpu.models.discretization import Discretization, degree
from fnft_tpu.ops.poly import _mat2x2_mul
from fnft_tpu.utils.misc import next_fft_length

_FFT_THRESHOLD = 32  # below this degree, direct convolution traces leaner


def _polymatmul(a, b, out_len=None):
    """(a @ b)(z) for [..., 2, 2, ca] x [..., 2, 2, cb] ascending coeffs."""
    ca, cb = a.shape[-1], b.shape[-1]
    n_out = ca + cb - 1
    if min(ca, cb) <= _FFT_THRESHOLD:
        # direct convolution via dot over a sliding window: build b's
        # convolution matrix implicitly with padding + gather-free slices
        out = jnp.zeros(a.shape[:-1] + (n_out,), dtype=a.dtype)
        for s in range(ca):
            seg = _mat2x2_mul(a[..., s:s + 1], b)
            out = out.at[..., s:s + cb].add(seg)
    else:
        length = next_fft_length(n_out)
        fa = jnp.fft.fft(a, n=length, axis=-1)
        fb = jnp.fft.fft(b, n=length, axis=-1)
        out = jnp.fft.ifft(
            _mat2x2_mul(fa, fb), axis=-1
        )[..., :n_out].astype(a.dtype)
    if out_len is not None:
        out = out[..., :out_len]
    return out


def _base_case(t, eps_t: float, kappa: int, disc: Discretization):
    """One-sample inversion (reference :167-227).

    Returns (q_sample, Ti[2,2,2]) with Ti the inverse one-step matrix
    (up to a factor z).
    """
    cdt = t.dtype
    qq = -kappa * jnp.conj(t[..., 1, 0, 0] / t[..., 0, 0, 0])
    abs_q = jnp.abs(qq)
    scl_den = 1.0 + kappa * abs_q * abs_q
    scl = 1.0 / jnp.sqrt(scl_den.astype(cdt))
    if disc is Discretization.SPLIT2A:
        q_sample = jnp.arctan(abs_q) * jnp.exp(1j * jnp.angle(qq)) / eps_t
    elif disc is Discretization.SPLIT2_MODAL:
        q_sample = qq / eps_t
    else:
        raise ValueError(f"finvscatter supports 2SPLIT2A/2SPLIT2_MODAL, got {disc}")
    ti = jnp.zeros(t.shape[:-3] + (2, 2, 2), dtype=cdt)
    ti = ti.at[..., 0, 0, 1].set(scl)
    ti = ti.at[..., 0, 1, 1].set(-scl * qq)
    ti = ti.at[..., 1, 0, 0].set(scl * kappa * jnp.conj(qq))
    ti = ti.at[..., 1, 1, 0].set(scl)
    return q_sample, ti


_SCAN_CUTOFF = 32  # blocks at or below this degree peel sequentially


def _peel_scan(t, deg: int, eps_t: float, kappa: int, disc: Discretization):
    """Sequential one-sample layer peel of a whole block via lax.scan.

    The divide-and-conquer split generalizes to (deg-1, 1): the two lowest
    coefficients of T are the last sample's one-step matrix (verified exact
    for 2SPLIT2A/MODAL). O(deg^2) work but O(1) trace size — used for the
    small blocks at the bottom of the recursion where the tree would
    otherwise dominate XLA compile time.

    Returns (q [..., deg] natural order, Ti [..., 2, 2, deg+1]).
    """
    c = deg + 1

    def step(carry, _):
        t_cur, acc = carry
        q_s, ti = _base_case(t_cur[..., :2], eps_t, kappa, disc)
        t_next = _polymatmul(ti, t_cur)[..., 1: c + 1]
        # accumulate the block inverse: earlier-sample inverses multiply
        # from the left (Ti_total = V_0 V_1 ... V_last)
        acc = _polymatmul(ti, acc)[..., :c]
        return (t_next, acc), q_s

    eye = jnp.zeros(t.shape[:-3] + (2, 2, c), dtype=t.dtype)
    eye = eye.at[..., 0, 0, 0].set(1.0).at[..., 1, 1, 0].set(1.0)
    (t_fin, ti_total), q_rev = jax.lax.scan(step, (t, eye), None, length=deg)
    q = jnp.moveaxis(q_rev, 0, -1)[..., ::-1]
    return q, ti_total


def _recurse(t, deg: int, eps_t: float, kappa: int, disc: Discretization,
             need_inverse: bool):
    """Returns (q_samples [..., deg] in natural time order, Ti or None)."""
    if 1 < deg <= _SCAN_CUTOFF:
        q, ti = _peel_scan(t, deg, eps_t, kappa, disc)
        return q, (ti if need_inverse else None)
    if deg == 1:
        q_sample, ti = _base_case(t, eps_t, kappa, disc)
        return q_sample[..., None], (ti if need_inverse else None)
    d2 = deg // 2
    # later samples: low-order coefficient half approximates T2
    t2_approx = t[..., :d2 + 1]
    q_hi, t2i = _recurse(t2_approx, d2, eps_t, kappa, disc, True)
    # T1 = T2i * T; true T1 sits in the coefficient window [d2, deg]
    prod = _polymatmul(t2i, t, out_len=deg + 1)
    t1 = prod[..., d2: deg + 1]
    q_lo, t1i = _recurse(t1, d2, eps_t, kappa, disc, need_inverse)
    ti = _polymatmul(t1i, t2i) if need_inverse else None
    return jnp.concatenate([q_lo, q_hi], axis=-1), ti


@partial(jax.jit, static_argnames=("eps_t", "kappa", "disc"))
def finvscatter(transfer_matrix, eps_t: float, kappa: int,
                disc: Discretization = Discretization.SPLIT2A):
    """Recover D = deg/deg1 samples from T ``[..., 2, 2, deg+1]`` (ascending).

    D must be a power of two (reference :265-267).
    """
    t = jnp.asarray(transfer_matrix)
    cdt = complex_dtype_of(t)
    t = t.astype(cdt)
    deg = t.shape[-1] - 1
    d = deg // max(degree(disc), 1)
    if d < 2 or d & (d - 1):
        raise ValueError("D must be a positive power of two")
    q, _ = _recurse(t, deg, eps_t, kappa, disc, need_inverse=False)
    return q
