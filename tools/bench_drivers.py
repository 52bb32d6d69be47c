"""Per-driver head-to-head timing vs the reference C library.

Configs mirror tools-built C benchmarks (bench_drivers.c in the scratch
build, patterned on the reference's examples/) so each public driver gets
a measured anchor, not just the nsev headline:

* kdvv:    sech 3.2 on T=[-25,25], M=D, XI=[-2,2], default 2SPLIT8B
           (fnft_kdvv.c:34-36).
* nsep:    plane wave exp(2it) on T=[0,2pi], GRIDSEARCH localization,
           MANUAL box [-2,2]^2 (examples/fnft_nsep_example.c with
           loc_GRIDSEARCH — the default MIXED path needs eiscor, which
           cannot be built in this image; GRIDSEARCH is the shared subset).
* inverse: contspec alpha/(xi - i beta) + one bound state, M=2D, default
           2SPLIT2A (examples/fnft_nsev_inverse_example.c scaled up).
* nsev:    sech 3.2 contspec, M=D, default 2SPLIT4B (the BASELINE.md
           headline config; re-measured here for cross-run comparability).

Times are steady-state (first call compiles and is excluded; best of
--reps). The C library has no compile step; its numbers are best-of-reps
directly. Run SOLO — load skews both sides.

Usage: python tools/bench_drivers.py [--driver all] [--log2d 14]
       [--reps 3] [--dtype c128]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _steady(fn, reps):
    out = fn()  # compile
    import jax

    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def bench_kdvv(d, reps, cdt):
    import jax.numpy as jnp

    import fnft_tpu as ft

    t = np.linspace(-25.0, 25.0, d)
    # the physical KdV potential is real; pass it with a real dtype so the
    # driver engages the real-coefficient half-grid tree (the C harness
    # stores it complex only because the reference API demands COMPLEX[])
    rdt = np.float64 if cdt == np.complex128 else np.float32
    u = (3.2 / np.cosh(t)).astype(rdt)
    uj = jnp.asarray(u)

    def run():
        return ft.kdvv(uj, (-25.0, 25.0), m=d,
                       xi_span=(-2.0, 2.0)).reflection_coefficient

    out, best = _steady(run, reps)
    return best, float(np.max(np.abs(np.asarray(out))))


def bench_nsep(d, reps, cdt):
    import jax.numpy as jnp

    import fnft_tpu as ft

    t = np.linspace(0.0, 2.0 * np.pi, d, endpoint=False)
    q = np.exp(2j * t).astype(cdt)
    qj = jnp.asarray(q)
    opts = ft.NsepOpts(localization=ft.Localization.GRIDSEARCH,
                       filtering=ft.PointFilter.MANUAL,
                       bounding_box=(-2.0, 2.0, -2.0, 2.0))

    def run():
        r = ft.nsep(qj, (0.0, 2.0 * np.pi), kappa=+1, opts=opts)
        return jnp.zeros(())  # host-returning driver; timing covers all work

    _, best = _steady(run, reps)
    r = ft.nsep(qj, (0.0, 2.0 * np.pi), kappa=+1, opts=opts)
    return best, int(r.main_spectrum.size)


def bench_inverse(d, reps, cdt):
    import jax.numpy as jnp

    import fnft_tpu as ft
    from fnft_tpu.models.nsev_inverse import nsev_inverse_xi_grid

    m = 2 * d
    t_span = (-2.0, 2.0)
    xi_span = nsev_inverse_xi_grid(d, t_span, m)
    xi = np.linspace(xi_span[0], xi_span[1], m)
    alpha, beta = 2.0, 0.55
    gamma = np.sqrt(alpha * alpha + beta * beta)
    contspec = (alpha / (xi - 1j * beta)).astype(cdt)
    bs = np.array([1j * beta])
    nc = np.array([-1j * alpha / (gamma + beta)])
    cj = jnp.asarray(contspec)

    def run():
        return ft.nsev_inverse(cj, xi_span, d, t_span, kappa=+1,
                               bound_states=bs, normconsts_or_residues=nc)

    out, best = _steady(run, reps)
    return best, float(np.max(np.abs(np.asarray(out))))


def bench_nsev(d, reps, cdt):
    import jax.numpy as jnp

    import fnft_tpu as ft

    t = np.linspace(-25.0, 25.0, d)
    q = (3.2j / np.cosh(t)).astype(cdt)
    qj = jnp.asarray(q)

    def run():
        # contspec only: the C harness passes NULL bound-state arrays
        return ft.nsev(qj, (-25.0, 25.0), m=d, xi_span=(-2.0, 2.0),
                       kappa=+1, want_bound_states=False).reflection_coefficient

    out, best = _steady(run, reps)
    return best, float(np.abs(np.asarray(out)[d // 2]))


DRIVERS = {"kdvv": bench_kdvv, "nsep": bench_nsep,
           "inverse": bench_inverse, "nsev": bench_nsev}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver", default="all",
                    choices=["all", *DRIVERS])
    ap.add_argument("--log2d", type=int, default=14)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="c128", choices=["c64", "c128"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # solo CPU anchor runs
    import fnft_tpu as ft

    if args.dtype == "c128":
        ft.use_x64()
        cdt = np.complex128
    else:
        cdt = np.complex64

    names = list(DRIVERS) if args.driver == "all" else [args.driver]
    d = 1 << args.log2d
    for name in names:
        best, check = DRIVERS[name](d, args.reps, cdt)
        print(json.dumps({"driver": name, "d": d, "dtype": args.dtype,
                          "best_seconds": round(best, 6),
                          "check": check, "platform": "cpu"}))


if __name__ == "__main__":
    main()
