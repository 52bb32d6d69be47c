"""Precision / platform configuration.

The reference library (fnft_numtypes.h:40-62) fixes FNFT_COMPLEX = double
complex. On TPU, float64 is emulated and slow, so this rebuild is dtype
polymorphic instead:

* tests / CPU reference runs: complex128 (enable with :func:`use_x64`),
* TPU production runs: complex64 (default on TPU).

All kernels infer their working dtype from the input signal's dtype, so a
caller opts into a precision simply by casting ``q``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def use_x64(enable: bool = True) -> None:
    """Enable float64/complex128 globally (wraps jax.config)."""
    jax.config.update("jax_enable_x64", enable)


def default_complex_dtype():
    """complex128 when x64 is on, else complex64."""
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


def real_dtype_of(cdtype) -> jnp.dtype:
    """Real dtype paired with a complex dtype."""
    return jnp.finfo(cdtype).dtype


def complex_dtype_of(x) -> jnp.dtype:
    """Working complex dtype inferred from an array's dtype."""
    dt = jnp.result_type(x)
    if dt == jnp.complex128 or dt == jnp.float64:
        return jnp.dtype(jnp.complex128)
    return jnp.dtype(jnp.complex64)


def eps_of(dtype) -> float:
    """Machine epsilon of the real part of ``dtype``."""
    return float(jnp.finfo(dtype).eps)
