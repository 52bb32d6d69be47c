"""Real-pair complex arithmetic for TPU backends without complex support.

The axon TPU backend in this environment executes real f32/bf16 programs
(matmul, elementwise, control flow, Pallas) but returns UNIMPLEMENTED for
every complex-typed HLO (probe sweep, ROUND4_NOTES.md).  This module is the
lowering layer: a complex array is carried as a ``(re, im)`` pair of real
arrays, and every complex primitive the NFT pipelines need is written out
in real arithmetic.  Combined with :mod:`fnft_tpu.ops.mxu_fft` (FFT as DFT
matmuls on the MXU) this lets the full contspec pipeline run on hardware
that has no complex lowering at all — which is also the idiomatic TPU
formulation: the hot ops become large batched real matmuls.

No counterpart exists in the C reference (complex doubles are native
there); this layer exists purely to map the same math onto the TPU's
real-valued MXU/VPU datapaths.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Pair = tuple  # (re, im) of equal-shape real arrays


def from_complex(x) -> Pair:
    """Split a complex array into an (re, im) pair.

    Host (numpy) inputs are split on the host so no complex-typed array is
    ever created on a device — required on backends with no complex
    support at all."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        x = np.asarray(x)
        if np.iscomplexobj(x):
            return (jnp.asarray(np.ascontiguousarray(x.real)),
                    jnp.asarray(np.ascontiguousarray(x.imag)))
        x = jnp.asarray(x)
        return x, jnp.zeros_like(x)
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return jnp.real(x), jnp.imag(x)
    return x, jnp.zeros_like(x)


def to_complex(p: Pair):
    re, im = p
    return jnp.asarray(re) + 1j * jnp.asarray(im)


def const(x, dtype=np.float32) -> Pair:
    """Host complex constant -> f32 pair (phase computed at full precision)."""
    x = np.asarray(x)
    return (jnp.asarray(np.real(x).astype(dtype)),
            jnp.asarray(np.imag(x).astype(dtype)))


def add(a: Pair, b: Pair) -> Pair:
    return a[0] + b[0], a[1] + b[1]


def sub(a: Pair, b: Pair) -> Pair:
    return a[0] - b[0], a[1] - b[1]


def neg(a: Pair) -> Pair:
    return -a[0], -a[1]


def mul(a: Pair, b: Pair) -> Pair:
    """(a.re + i a.im)(b.re + i b.im): 4 real multiplies, fused by XLA."""
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def rmul(a: Pair, s) -> Pair:
    """Multiply by a real scalar/array."""
    return a[0] * s, a[1] * s


def conj(a: Pair) -> Pair:
    return a[0], -a[1]


def abs2(a: Pair):
    return a[0] * a[0] + a[1] * a[1]


def cabs(a: Pair):
    return jnp.sqrt(abs2(a))


def div(a: Pair, b: Pair) -> Pair:
    """a / b via the conjugate trick (one real reciprocal)."""
    d = abs2(b)
    inv = 1.0 / d
    nr, ni = mul(a, conj(b))
    return nr * inv, ni * inv


def cis(theta) -> Pair:
    """exp(i theta) for a real angle array."""
    return jnp.cos(theta), jnp.sin(theta)


def stack(pairs, axis=0) -> Pair:
    return (jnp.stack([p[0] for p in pairs], axis=axis),
            jnp.stack([p[1] for p in pairs], axis=axis))


def concatenate(pairs, axis=0) -> Pair:
    return (jnp.concatenate([p[0] for p in pairs], axis=axis),
            jnp.concatenate([p[1] for p in pairs], axis=axis))


def zeros(shape, dtype=jnp.float32) -> Pair:
    z = jnp.zeros(shape, dtype)
    return z, jnp.zeros_like(z)


def reshape(a: Pair, shape) -> Pair:
    return a[0].reshape(shape), a[1].reshape(shape)


def apply(f, a: Pair, *args, **kw) -> Pair:
    """Apply the same real->real shape/layout op to both components."""
    return f(a[0], *args, **kw), f(a[1], *args, **kw)
