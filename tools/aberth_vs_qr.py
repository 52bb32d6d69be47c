"""Aberth vs companion-QR head-to-head on the FAST_EIGENVALUE polynomial.

The reference localizes bound states in FAST_EIGENVALUE mode by rooting
the transfer-matrix a-polynomial with eiscor's structured companion QR
(src/fnft_nsev.c FAST_EIGENVALUE path; src/3rd_party/eiscor). This image
has no Fortran frontend (gcc-12 ships cc1/cc1plus only), so eiscor itself
cannot be built; the stand-in oracle for the *accuracy* contract is
LAPACK's backward-stable companion QR (numpy.roots -> zgeev/dhseqr), the
same algorithmic class. Timing context: LAPACK's unstructured QR is
O(n^3) where eiscor is O(n^2) sequential core chasing; the Aberth engine
is O(n^2) batched sweeps. Measured n^3 scaling lets us place all three.

Run solo (single CPU core, no concurrent compile-heavy processes):
    python tools/aberth_vs_qr.py [--degrees 1024,2048,4096] [--big 16384]
"""

import argparse
import json
import time

import numpy as np


def _setup_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import fnft_tpu as ft
    ft.use_x64()
    return jax


def a_polynomial(d, disc_name="SPLIT2A"):
    """tm11 of the sech A=3.2 signal at D samples (deg = D for 2SPLIT2A)."""
    import jax.numpy as jnp
    import fnft_tpu as ft
    from fnft_tpu.models import nse
    from fnft_tpu.ops.fscatter import fscatter

    t_span = (-25.0, 25.0)
    t = np.linspace(*t_span, d)
    q = (3.2j / np.cosh(t)).astype(np.complex128)
    eps_t = (t_span[1] - t_span[0]) / (d - 1)
    disc = getattr(ft.Discretization, disc_name)
    q_eff, r_eff, _, _ = nse.preprocess_signal(jnp.asarray(q), eps_t, +1,
                                               disc)
    tm, w = fscatter(q_eff, r_eff, eps_t, disc, normalize=True)
    return np.asarray(tm[0, 0] * (2.0 ** np.float64(w))), eps_t, disc


def hausdorff(a, b):
    d1 = max(np.min(np.abs(b - x)) for x in a)
    d2 = max(np.min(np.abs(a - x)) for x in b)
    return max(d1, d2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--degrees", default="1024,2048,4096")
    ap.add_argument("--big", type=int, default=16384)
    args = ap.parse_args()
    _setup_cpu()
    import jax
    import jax.numpy as jnp
    from fnft_tpu.ops.roots import (certified_tol, newton_polygon_init_jax,
                                    poly_roots, root_residuals)

    rows = []
    for deg in [int(x) for x in args.degrees.split(",")]:
        coeffs, _, _ = a_polynomial(deg)
        assert coeffs.shape[0] == deg + 1

        # LAPACK companion QR (descending-coefficient convention)
        t0 = time.perf_counter()
        qr_roots = np.roots(coeffs[::-1])
        t_qr = time.perf_counter() - t0

        # Aberth (one warmup for jit compile, then timed)
        cj = jnp.asarray(coeffs)
        jax.block_until_ready(poly_roots(cj))
        t0 = time.perf_counter()
        ab_roots, eta = poly_roots(cj, return_residuals=True)
        ab_roots = np.asarray(jax.block_until_ready(ab_roots))
        t_ab = time.perf_counter() - t0
        eta = np.asarray(eta)

        cert = float(np.mean(eta <= certified_tol(deg)))
        dh = hausdorff(ab_roots, qr_roots)
        # eta of the QR roots under the same backward-error metric
        eta_qr = np.asarray(root_residuals(cj, jnp.asarray(qr_roots)))
        rows.append(dict(deg=deg, t_qr=t_qr, t_aberth=t_ab,
                         speedup=t_qr / t_ab, hausdorff=float(dh),
                         cert_frac=cert,
                         eta_aberth_max=float(eta.max()),
                         eta_qr_max=float(eta_qr.max())))
        print(json.dumps(rows[-1]))

    # big degree: Aberth measured, LAPACK extrapolated from n^3 fit
    deg = args.big
    coeffs, _, _ = a_polynomial(deg)
    cj = jnp.asarray(coeffs)
    z0 = newton_polygon_init_jax(cj)
    jax.block_until_ready(z0)
    t0 = time.perf_counter()
    ab_roots, eta = poly_roots(cj, return_residuals=True)
    ab_roots = np.asarray(jax.block_until_ready(ab_roots))
    t_ab = time.perf_counter() - t0
    eta = np.asarray(eta)
    base = rows[-1]
    t_qr_extrap = base["t_qr"] * (deg / base["deg"]) ** 3
    big = dict(deg=deg, t_aberth=t_ab,
               t_qr_extrapolated_n3=t_qr_extrap,
               speedup_vs_extrap=t_qr_extrap / t_ab,
               cert_frac=float(np.mean(eta <= certified_tol(deg))),
               eta_aberth_max=float(eta.max()))
    print(json.dumps(big))


if __name__ == "__main__":
    main()
