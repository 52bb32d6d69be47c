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

# Aberth repulsion kernel tile sizes: each program handles REP_IBLK active
# roots against the full root vector in j-chunks of REP_JCHUNK.
REP_IBLK = 128
REP_JCHUNK = 512


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


def _repulsion_kernel(zr_ref, zi_ref, tr_ref, ti_ref, idx_ref,
                      or_ref, oi_ref, *, deg: int, nch: int):
    """Aberth repulsion for one block of REP_IBLK active roots.

    s_i = sum_{j != idx_i, j < deg} 1 / (t_i - z_j), accumulated over the
    whole root vector (held VMEM-resident as [nch, REP_JCHUNK] planes) with
    a fori_loop over j-chunks; every arithmetic op is a full [IBLK, JCHUNK]
    vector op. Replaces the XLA path's per-chunk HBM round-trips
    (ops/roots._repulsion_chunked) with a single pass.
    """
    tr = tr_ref[...]          # [IBLK, 1]
    ti = ti_ref[...]
    idx = idx_ref[...]        # [IBLK, 1] int32
    jof = jax.lax.broadcasted_iota(jnp.int32, (REP_IBLK, REP_JCHUNK), 1)

    def body(c, acc):
        acc_re, acc_im = acc
        zr = zr_ref[pl.ds(c, 1), :]      # [1, JCHUNK]
        zi = zi_ref[pl.ds(c, 1), :]
        jglob = jof + c * REP_JCHUNK
        bad = (idx == jglob) | (jglob >= deg)
        dr = tr - zr                     # [IBLK, JCHUNK]
        di = ti - zi
        den = dr * dr + di * di
        den = jnp.where(bad, 1.0, den)
        den = jnp.where(den == 0.0, 1.0, den)  # guard: padded t rows only
        good = jnp.where(bad, 0.0, 1.0 / den)
        return acc_re + dr * good, acc_im - di * good

    zero = jnp.zeros((REP_IBLK, REP_JCHUNK), tr.dtype)
    acc_re, acc_im = jax.lax.fori_loop(0, nch, body, (zero, zero))
    or_ref[...] = jnp.sum(acc_re, axis=1, keepdims=True)
    oi_ref[...] = jnp.sum(acc_im, axis=1, keepdims=True)


# imported lazily in fused_tree_levels; the repulsion path needs it at
# module scope for the kernel body above
try:  # pragma: no cover - import guard for environments without pallas
    from jax.experimental import pallas as pl
except ImportError:  # pragma: no cover
    pl = None


def pallas_hw_validated(record_name: str) -> bool:
    """Has kernel ``record_name`` been validated on real TPU hardware?

    The watcher (tools/tpu_watch.py) records kernel-vs-XLA agreement
    checks to TPU_MEASUREMENTS.jsonl in its first healthy window; until
    such a record exists a Mosaic-lowered kernel has only been
    interpret-tested, so auto-enables stay off (kernels can still be
    forced via their setters for measurement runs).

    FNFT_TPU_MEASUREMENTS overrides the default source-checkout location
    (an installed wheel must point the env var at its measurement log).
    """
    import json
    import os
    import pathlib

    override = os.environ.get("FNFT_TPU_MEASUREMENTS")
    path = (pathlib.Path(override) if override else
            pathlib.Path(__file__).resolve().parents[2]
            / "TPU_MEASUREMENTS.jsonl")
    try:
        for ln in path.read_text().splitlines():
            try:
                rec = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if (rec.get("name") == record_name and rec.get("agree")
                    and rec.get("platform") == "tpu"):
                # platform check matters: a degraded tunnel can silently
                # fall back to CPU, where agreement is trivially true
                return True
    except OSError:
        pass
    return False


def repulsion_sum(z_all, z_t, t_idx, *, interpret: bool = False):
    """Pallas Aberth repulsion ``s_i = sum_{j != t_idx_i} 1/(z_t_i - z_all_j)``.

    Drop-in for the low-precision path of ``ops.roots._repulsion_chunked``:
    computes in the native real dtype of ``z_t`` (float32 planes on TPU —
    the repulsion term only steers the iteration path, see the XLA
    implementation's docstring) and returns complex of ``z_t.dtype``.

    Args:
      z_all: full root vector ``[deg]`` (complex).
      z_t: active roots ``[m]`` (complex).
      t_idx: global index of each active root in ``z_all`` (int32 ``[m]``),
        excluded from its own sum. Out-of-range indices mark padding rows.

    The full root vector stays VMEM-resident per program (float planes,
    ~0.9 MB at the eiscor-ceiling deg ~1e5), so each sweep is one HBM read
    of z_all per i-block instead of one per (i-block, j-chunk) pair.
    """
    cdt = z_t.dtype
    rdt = jnp.float64 if (cdt == jnp.complex128 and interpret) else jnp.float32
    sr, si = repulsion_sum_planes(
        jnp.real(z_all).astype(rdt), jnp.imag(z_all).astype(rdt),
        jnp.real(z_t).astype(rdt), jnp.imag(z_t).astype(rdt),
        t_idx, interpret=interpret)
    return (sr + 1j * si).astype(cdt)


def repulsion_sum_planes(zr_all, zi_all, tr_t, ti_t, t_idx, *,
                         interpret: bool = False):
    """Real-plane entry of :func:`repulsion_sum` for complex-free backends.

    Takes (re, im) float planes and returns (s_re, s_im) planes — no
    complex-typed HLO anywhere, so the kernel can run on the axon TPU
    backend (ops/rc.py documents it); used by ops/tpu_roots and the
    watcher's hardware-agreement stage.
    """
    deg = zr_all.shape[0]
    m = tr_t.shape[0]
    rdt = zr_all.dtype

    nch = max(1, -(-deg // REP_JCHUNK))
    deg_pad = nch * REP_JCHUNK
    mblk = max(1, -(-m // REP_IBLK))
    m_pad = mblk * REP_IBLK

    zr = jnp.pad(zr_all, (0, deg_pad - deg)).reshape(nch, REP_JCHUNK)
    zi = jnp.pad(zi_all, (0, deg_pad - deg)).reshape(nch, REP_JCHUNK)
    tr = jnp.pad(tr_t, (0, m_pad - m)).reshape(mblk * REP_IBLK, 1)
    ti = jnp.pad(ti_t, (0, m_pad - m)).reshape(mblk * REP_IBLK, 1)
    # padding rows point at j = deg (masked); their sums are discarded
    ip = jnp.pad(t_idx.astype(jnp.int32), (0, m_pad - m),
                 constant_values=deg)
    ip = ip.reshape(mblk * REP_IBLK, 1)

    kern = partial(_repulsion_kernel, deg=deg, nch=nch)
    out_shape = [jax.ShapeDtypeStruct((mblk * REP_IBLK, 1), rdt),
                 jax.ShapeDtypeStruct((mblk * REP_IBLK, 1), rdt)]
    or_, oi_ = pl.pallas_call(
        kern,
        grid=(mblk,),
        in_specs=[pl.BlockSpec((nch, REP_JCHUNK), lambda b: (0, 0)),
                  pl.BlockSpec((nch, REP_JCHUNK), lambda b: (0, 0)),
                  pl.BlockSpec((REP_IBLK, 1), lambda b: (b, 0)),
                  pl.BlockSpec((REP_IBLK, 1), lambda b: (b, 0)),
                  pl.BlockSpec((REP_IBLK, 1), lambda b: (b, 0))],
        out_specs=[pl.BlockSpec((REP_IBLK, 1), lambda b: (b, 0)),
                   pl.BlockSpec((REP_IBLK, 1), lambda b: (b, 0))],
        out_shape=out_shape,
        interpret=interpret,
    )(zr, zi, tr, ti, ip)
    return or_[:m, 0], oi_[:m, 0]
