"""Kolmogorov spectral factorization on an oversampled FFT grid.

Given B(z), computes A(z) with A A* + kappa B B* = 1 (kappa = +-1) or the
minimum-phase factor of |P| (kappa = 0), following Dumitrescu, "Positive
Trigonometric Polynomials and Signal Processing Applications", App. B.4:
log-magnitude on the circle -> Hilbert transform for the phase -> inverse
FFT. Reference: fnft__poly_specfact.c:26-147.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from fnft_tpu.config import complex_dtype_of, eps_of
from fnft_tpu.errors import warn
from fnft_tpu.utils.misc import next_fft_length


def _warn_if_ill_posed(flag) -> None:
    if bool(flag):
        warn("Ill-posed spectral factorization problem.")


@partial(jax.jit, static_argnames=("oversampling_factor", "kappa"))
def poly_specfact(coeffs, *, oversampling_factor: int = 32, kappa: int = 0):
    """Spectral factor of a polynomial given by ascending ``coeffs``.

    Returns ascending coefficients of the factor, same length as the input.
    """
    coeffs = jnp.asarray(coeffs)
    cdt = complex_dtype_of(coeffs)
    coeffs = coeffs.astype(cdt)
    deg = coeffs.shape[-1] - 1
    m = next_fft_length((deg + 1) * oversampling_factor)

    # the factorization operates on the reversed polynomial, matching the
    # reference's descending-order convention (result conj-compensated below)
    vals = jnp.fft.fft(coeffs[..., ::-1], n=m, axis=-1)
    abs2 = jnp.abs(vals) ** 2
    tol = math.sqrt(eps_of(cdt))
    if kappa == 0:
        x = jnp.log(jnp.maximum(jnp.sqrt(abs2), tol * tol))
    elif kappa == -1:
        x = 0.5 * jnp.log1p(abs2)
    elif kappa == 1:
        # the reference WARNs (without aborting) when |B|^2 approaches 1,
        # i.e. the log argument loses positivity and the factorization is
        # ill-posed (fnft__poly_specfact.c:96-111); surface the same signal
        # through the pluggable sink instead of clamping silently
        ill_posed = jnp.any(abs2 > 1.0 - tol, axis=None)
        jax.debug.callback(_warn_if_ill_posed, ill_posed)
        x = 0.5 * jnp.log(jnp.maximum(1.0 - abs2, tol * tol))
    else:
        raise ValueError("kappa must be -1, 0 or +1")

    # Hilbert transform: multiply FFT(x) by -i sgn(freq)
    xf = jnp.fft.fft(x.astype(cdt), axis=-1)
    sgn = jnp.concatenate([
        jnp.zeros((1,)),
        -jnp.ones((m // 2 - 1,)),
        jnp.zeros((1,)),
        jnp.ones((m - m // 2 - 1,)),
    ]).astype(jnp.real(coeffs).dtype)
    y = jnp.fft.ifft(xf * (1j * sgn), axis=-1)

    freq_resp = jnp.exp(x - 1j * y)
    factor = jnp.fft.ifft(freq_resp.astype(cdt), axis=-1)
    # reference: result_desc[i] = conj(factor[deg-i]) -> ascending = conj
    return jnp.conj(factor[..., : deg + 1]).astype(cdt)
