"""Pallas TPU kernels for the hot small-degree tree levels.

The fmult tree's first few levels multiply huge batches of tiny polynomial
matrices. As XLA ops each level round-trips the whole array through HBM;
this kernel fuses L levels into one pass with everything VMEM-resident and
performs the per-subtree power-of-two rescaling in-register (the reference
rescales per level on the host side: fnft__poly_fmult.c:123-150).

Layout: the 128 lanes each carry an independent subtree of 2^L one-step
matrices; the tree reduction runs along the sublane/leading axes with
static index arithmetic, so every arithmetic op is a full-width vector op.
Complex values travel as separate real/imag planes (Mosaic has no native
complex vregs).

Selection: fnft_tpu.ops.poly auto-enables the kernel on the TPU backend
when shapes fit; ``fnft_tpu.ops.poly.set_fused_early_levels`` overrides
(interpret mode keeps CPU CI coverage).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128


def _fused_levels_kernel(ar_ref, ai_ref, or_ref, oi_ref, oe_ref, *,
                         levels: int, c_in: int, normalize: bool):
    """One program: [2^L, 4, c_in, LANES] -> [4, c_out, LANES] + exp [LANES].

    Polynomial 2x2 matrix chain products, later @ earlier, ascending
    coefficients; all loops static. With ``normalize`` the output subtree is
    rescaled so max|entry| is in [1, 2) and the per-lane exponent is stored.
    """
    n_mats = 1 << levels
    ar = ar_ref[0]
    ai = ai_ref[0]

    # mats[m] = (re, im) lists indexed [entry(4)][coeff] of [LANES] vectors
    mats = []
    for mi in range(n_mats):
        re = [[ar[mi, e, k, :] for k in range(c_in)] for e in range(4)]
        im = [[ai[mi, e, k, :] for k in range(c_in)] for e in range(4)]
        mats.append((re, im))

    c = c_in
    for _ in range(levels):
        nxt = []
        for p in range(len(mats) // 2):
            a_re, a_im = mats[2 * p]       # earlier
            b_re, b_im = mats[2 * p + 1]   # later
            c_out = 2 * c - 1
            zero = jnp.zeros_like(a_re[0][0])
            o_re = [[zero for _ in range(c_out)] for _ in range(4)]
            o_im = [[zero for _ in range(c_out)] for _ in range(4)]
            # (b @ a): out[i,j] = sum_k b[i,k] * a[k,j]
            for i in range(2):
                for j in range(2):
                    oe = 2 * i + j
                    for k in range(2):
                        be, ae = 2 * i + k, 2 * k + j
                        for cb in range(c):
                            br = b_re[be][cb]
                            bi = b_im[be][cb]
                            for ca in range(c):
                                arr = a_re[ae][ca]
                                aii = a_im[ae][ca]
                                t = cb + ca
                                o_re[oe][t] = o_re[oe][t] + br * arr - bi * aii
                                o_im[oe][t] = o_im[oe][t] + br * aii + bi * arr
            nxt.append((o_re, o_im))
        mats = nxt
        c = 2 * c - 1

    out_re, out_im = mats[0]
    if normalize:
        mx = jnp.zeros_like(out_re[0][0])
        for e in range(4):
            for k in range(c):
                mx = jnp.maximum(mx, jnp.maximum(jnp.abs(out_re[e][k]),
                                                 jnp.abs(out_im[e][k])))
        safe = jnp.where(mx > 0, mx, jnp.ones_like(mx))
        aexp = jnp.where(mx > 0, jnp.floor(jnp.log2(safe)),
                         jnp.zeros_like(mx))
        # NB: jnp.exp2 is inexact on XLA:CPU (~1e-6 f32); aexp comes
        # from floor(log2(.)) so 2^-aexp must be exact or the subtree
        # values pick up a fake scale. ldexp lowers in both interpret
        # and Mosaic paths (validated by the driver's TPU compile-check).
        # vector operand: Mosaic's ldexp lowering bitcasts and rejects
        # scalar inputs ('tpu.bitcast' needs vectors)
        scale = jnp.ldexp(jnp.ones_like(mx), -aexp.astype(jnp.int32))
    else:
        aexp = jnp.zeros_like(out_re[0][0])
        scale = jnp.ones_like(out_re[0][0])
    # exponent plane padded to 8 sublanes (Mosaic tiling: the last two
    # output dims must be (8k, 128m)); caller reads sublane 0
    oe_ref[0, :, :] = jnp.broadcast_to(aexp.astype(jnp.int32), (8, LANES))
    for e in range(4):
        for k in range(c):
            or_ref[0, e, k, :] = out_re[e][k] * scale
            oi_ref[0, e, k, :] = out_im[e][k] * scale


def fused_tree_levels(p, levels: int, *, normalize: bool = False,
                      interpret: bool = False):
    """Fuse ``levels`` fmult-tree levels:
    ``[..., n, 2, 2, c] -> [..., n/2^L, 2, 2, c_out]`` (+ exponents).

    Requires n divisible by 2^L * 128 (the caller's power-of-two padding
    guarantees this whenever n >= 2^L * 128). Arbitrary leading batch
    dims are flattened into the grid. Compute runs in float32 pairs
    (complex64 semantics) unless the input is complex128 on a CPU backend
    (interpret mode), where float64 is kept.

    Returns ``(out, w)`` where ``w`` is the per-subtree int32 exponent
    array (zeros when ``normalize=False``): true = out * 2**w.
    """
    from jax.experimental import pallas as pl

    *lead, n, _, _, c_in = p.shape
    group = (1 << levels) * LANES
    if n % group:
        raise ValueError(f"n={n} must be divisible by {group}")
    c_out = (c_in - 1) * (1 << levels) + 1
    blocks_per = n // group
    lead_n = int(np.prod(lead)) if lead else 1
    blocks = lead_n * blocks_per
    rdt = jnp.float64 if p.dtype == jnp.complex128 else jnp.float32

    # [..., n, 2, 2, c] -> [blocks, 2^L, 4, c, LANES]: each lane carries one
    # contiguous subtree of 2^L consecutive matrices (tree pairs adjacent
    # time indices), so the reduction axis is the slot axis.
    x = p.reshape(blocks, LANES, 1 << levels, 2, 2, c_in)
    x = jnp.moveaxis(x, 1, -1)                   # [blocks, 2^L, 2, 2, c, LANES]
    x = x.reshape(blocks, 1 << levels, 4, c_in, LANES)

    ar = jnp.real(x).astype(rdt)
    ai = jnp.imag(x).astype(rdt)

    kern = partial(_fused_levels_kernel, levels=levels, c_in=c_in,
                   normalize=normalize)
    out_shape = [jax.ShapeDtypeStruct((blocks, 4, c_out, LANES), rdt),
                 jax.ShapeDtypeStruct((blocks, 4, c_out, LANES), rdt),
                 jax.ShapeDtypeStruct((blocks, 8, LANES), jnp.int32)]
    or_, oi_, oe_ = pl.pallas_call(
        kern,
        grid=(blocks,),
        in_specs=[pl.BlockSpec((1, 1 << levels, 4, c_in, LANES),
                               lambda b: (b, 0, 0, 0, 0)),
                  pl.BlockSpec((1, 1 << levels, 4, c_in, LANES),
                               lambda b: (b, 0, 0, 0, 0))],
        out_specs=[pl.BlockSpec((1, 4, c_out, LANES), lambda b: (b, 0, 0, 0)),
                   pl.BlockSpec((1, 4, c_out, LANES), lambda b: (b, 0, 0, 0)),
                   pl.BlockSpec((1, 8, LANES), lambda b: (b, 0, 0))],
        out_shape=out_shape,
        interpret=interpret,
    )(ar, ai)

    out = (or_ + 1j * oi_).astype(p.dtype)          # [blocks, 4, c_out, LANES]
    out = jnp.moveaxis(out, -1, 1)                  # [blocks, LANES, 4, c_out]
    out = out.reshape(tuple(lead) + (blocks_per * LANES, 2, 2, c_out))
    w = oe_[:, 0, :].reshape(tuple(lead) + (blocks_per * LANES,))
    return out, w
