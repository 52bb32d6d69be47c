"""Headline benchmark: fast NFT continuous spectrum on one TPU chip.

Config matches BASELINE.md's measured single-core C anchor: fnft_nsev
reflection coefficient of a sech pulse (A=3.2, T=[-25,25]) with the default
2SPLIT4B discretization, M = D spectral points. The C reference wall-clock
on this host (gcc -O3 -march=native, KissFFT) is:

    D=2^20: 17.82 s   |   D=2^18: 3.185 s   |   D=2^16: 0.718 s

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

C_BASELINE_SECONDS = {
    1 << 12: 0.033155,
    1 << 14: 0.152269,
    1 << 16: 0.718106,
    1 << 18: 3.184655,
    1 << 20: 17.816561,
}


def _sync(out):
    """Force completion via a d2h scalar fetch.

    block_until_ready is NOT sufficient on the axon tunnel: in the
    observed degraded state dispatch is fire-and-forget and only a
    device-to-host transfer actually waits for the result.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0] if leaf.ndim else leaf).real)


def _timed(fn, *args, reps=3):
    out = fn(*args)  # compile + first run
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def _df64_split(z):
    """complex128 -> (re_hi, re_lo, im_hi, im_lo) float32 quadruple."""
    re, im = np.real(z), np.imag(z)
    rh = re.astype(np.float32)
    rl = (re - rh.astype(np.float64)).astype(np.float32)
    ih = im.astype(np.float32)
    il = (im - ih.astype(np.float64)).astype(np.float32)
    return rh, rl, ih, il


def _run_tpu(args):
    """TPU record: df64 reference-tolerance tier as the headline metric,
    c64 as the clearly-labeled raw-throughput secondary.

    The c64 tier's D=4096 harness error (6.1e-6) EXCEEDS the reference's
    c128 bound of 3.9e-6 (fnft_nsev_test_sech_focusing_2split4B.c:31-43),
    so it must never be the number `accuracy_check_passed` refers to; the
    df64 tier meets that bound on hardware and is the headline.
    """
    import jax
    import jax.numpy as jnp

    from fnft_tpu.ops.df64_pipeline import rho_pipeline_df64_tabled
    from fnft_tpu.ops.tpu_pipeline import rho_pipeline_tabled

    d = m = 1 << args.log2d
    t_span, xi_span = (-25.0, 25.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    q = 1j * 3.2 / np.cosh(t)

    # ---- headline: df64 single-signal at D ----
    fn64 = rho_pipeline_df64_tabled(d, m, t_span, xi_span)
    args64 = [jax.device_put(jnp.asarray(a)) for a in _df64_split(q)]

    def run64(*a):
        return fn64(*a)

    out64, best64 = _timed(run64, *args64, reps=args.reps)
    mid = abs(complex(
        float(np.asarray(out64[0][..., m // 2]).ravel()[0])
        + float(np.asarray(out64[1][..., m // 2]).ravel()[0]),
        float(np.asarray(out64[2][..., m // 2]).ravel()[0])
        + float(np.asarray(out64[3][..., m // 2]).ravel()[0])))
    ok_rho0 = abs(mid - 0.7265425) < 1e-3

    extra = {}
    # ---- df64 accuracy harness at D=4096 vs the analytic spectrum ----
    try:
        from fnft_tpu.testcases import NsevTestcase, nsev_testcase

        data = nsev_testcase(NsevTestcase.SECH_FOCUSING, 4096)
        fh = rho_pipeline_df64_tabled(4096, data.m, data.t_span,
                                      data.xi_span)
        ha = [jax.device_put(jnp.asarray(a))
              for a in _df64_split(np.asarray(data.q, np.complex128))]
        o = fh(*ha)
        got = (np.asarray(o[0], np.float64) + np.asarray(o[1], np.float64)) \
            + 1j * (np.asarray(o[2], np.float64)
                    + np.asarray(o[3], np.float64))
        ref = np.asarray(data.contspec)
        cerr = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
        extra["harness_errors_D4096"] = {"contspec": float(f"{cerr:.3e}")}
        extra["harness_bounds_profile"] = "c128_reference"
        extra["within_c128_reference_bound"] = bool(cerr <= 3.9e-6)
        extra["harness_within_bounds"] = extra["within_c128_reference_bound"]
    except Exception as e:
        extra["harness_error"] = str(e)[:120]

    # ---- secondary: c64 raw-throughput tier ----
    try:
        fnc = rho_pipeline_tabled(d, m, t_span, xi_span)
        qc = q.astype(np.complex64)
        cargs = (jax.device_put(jnp.asarray(qc.real.astype(np.float32))),
                 jax.device_put(jnp.asarray(qc.imag.astype(np.float32))))
        _, bestc = _timed(lambda a, b: fnc(a, b), *cargs, reps=args.reps)
        base = C_BASELINE_SECONDS.get(d)
        extra["c64_raw_seconds"] = round(bestc, 6)
        if base:
            extra["c64_raw_vs_baseline"] = round(base / bestc, 3)
        extra["c64_tier_note"] = ("raw-throughput tier; its D=4096 harness "
                                  "error exceeds the c128 reference bound — "
                                  "headline accuracy claims are df64-tier "
                                  "only")
        # batched c64 throughput at the NFDM symbol size
        db = mb = 1 << 12
        tb = np.linspace(*t_span, db)
        qb = np.stack([(1j * (1.0 + k / args.batch) / np.cosh(tb))
                       for k in range(args.batch)]).astype(np.complex64)
        fnb = rho_pipeline_tabled(db, mb, t_span, xi_span, batch=args.batch)
        bargs = (jax.device_put(jnp.asarray(qb.real.astype(np.float32))),
                 jax.device_put(jnp.asarray(qb.imag.astype(np.float32))))
        _, tbatch = _timed(lambda a, b: fnb(a, b), *bargs, reps=args.reps)
        extra["batched_D4096_spectra_per_sec"] = round(args.batch / tbatch, 1)
        extra["batched_vs_singlecore_c"] = round(
            args.batch / tbatch * C_BASELINE_SECONDS[db], 1)
    except Exception as e:
        extra["c64_tier_error"] = str(e)[:120]

    baseline = C_BASELINE_SECONDS.get(d)
    ok = ok_rho0 and extra.get("within_c128_reference_bound", False)
    return {
        **extra,
        "metric": f"nsev_contspec_sech_D{d}_2split4b_df64_seconds",
        "value": round(best64, 6),
        "unit": "s",
        "vs_baseline": round(baseline / best64, 3) if baseline else None,
        "accuracy_check_passed": bool(ok),
        "tier": "df64 (reference c128 tolerance on complex-free TPU)",
        "platform": jax.devices()[0].platform,
    }


def _run_once(args):
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        return _run_tpu(args)
    d = m = 1 << args.log2d
    t_span, xi_span = (-25.0, 25.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    q = (1j * 3.2 / np.cosh(t)).astype(np.complex64)

    def _build(dd, mm, batch):
        """Backend-appropriate jitted rho: [batch?, D] -> [batch?, M]."""
        if on_tpu:
            # the axon TPU backend has no complex types: run the
            # real-pair lowering with tables as device parameters
            from fnft_tpu.ops.tpu_pipeline import rho_pipeline_tabled

            fn = rho_pipeline_tabled(dd, mm, t_span, xi_span, batch=batch)
            return lambda qc: fn(jnp.asarray(qc.real.astype(np.float32)),
                                 jnp.asarray(qc.imag.astype(np.float32)))
        from __graft_entry__ import _rho_pipeline

        fn = jax.jit(_rho_pipeline(dd, mm, t_span, xi_span))
        return lambda qc: fn(jax.device_put(jnp.asarray(qc)))

    rho = _build(d, m, None)
    out, best = _timed(rho, q, reps=args.reps)

    # sanity: |rho(0)| of the Satsuma-Yajima A=3.2 sech = |sin(pi A)| scale
    def _sane(o):
        if on_tpu:
            mid = complex(float(np.asarray(o[0][..., m // 2])),
                          float(np.asarray(o[1][..., m // 2])))
        else:
            mid = complex(np.asarray(o)[..., m // 2].ravel()[0])
        return abs(abs(mid) - 0.7265425) < 5e-3

    ok = _sane(out)
    fused_fallback = False

    # secondary: batched throughput at D = 2^12 (NFDM symbol size)
    db, mb, batch = 1 << 12, 1 << 12, args.batch
    tb = np.linspace(*t_span, db)
    qb = np.stack([(1j * (1.0 + k / batch) / np.cosh(tb))
                   for k in range(batch)]).astype(np.complex64)
    rho_b = _build(db, mb, batch)
    _, tbatch = _timed(rho_b, qb, reps=args.reps)
    spectra_per_sec = batch / tbatch
    base_small = C_BASELINE_SECONDS[db]

    extra = {}
    if not args.no_df64 and not on_tpu:
        # reference-accuracy float32-pair pipeline at the NFDM symbol size
        # (complex-typed internally, so CPU only on this TPU backend)
        try:
            from fnft_tpu.ops.df64_pipeline import nsev_contspec_df64

            dd = 1 << 12
            td = np.linspace(*t_span, dd)
            qd = (1j * 3.2 / np.cosh(td)).astype(np.complex128)
            nsev_contspec_df64(qd, d=dd, m=dd, t_span=t_span,
                               xi_span=xi_span)  # compile
            t0 = time.perf_counter()
            out_d = nsev_contspec_df64(qd, d=dd, m=dd, t_span=t_span,
                                       xi_span=xi_span)
            jax.block_until_ready(out_d)
            extra["df64_D4096_seconds"] = round(time.perf_counter() - t0, 6)
        except Exception as e:
            extra["df64_D4096_error"] = str(e)[:120]

    if not args.no_harness and on_tpu:
        # accuracy harness on the complex-free backend: the rc pipeline's
        # contspec against the analytic sech spectrum at D=4096
        try:
            from fnft_tpu.ops.tpu_pipeline import rho_pipeline_tabled
            from fnft_tpu.testcases import NsevTestcase, nsev_testcase

            data = nsev_testcase(NsevTestcase.SECH_FOCUSING, 4096)
            fn = rho_pipeline_tabled(4096, data.m, data.t_span, data.xi_span)
            qh = data.q.astype(np.complex64)
            rr, ri = fn(jnp.asarray(qh.real), jnp.asarray(qh.imag))
            got = np.asarray(rr) + 1j * np.asarray(ri)
            ref = np.asarray(data.contspec)
            cerr = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
            extra["harness_errors_D4096"] = {"contspec": float(f"{cerr:.3e}")}
            extra["harness_bounds_profile"] = "c64_tpu_budget"
            extra["harness_within_bounds"] = bool(cerr <= 5e-4)
        except Exception as e:
            extra["harness_error"] = str(e)[:120]
    elif not args.no_harness:
        # the reference's six-error harness at D=4096 (2SPLIT4B bounds from
        # test/fnft_nsev/fnft_nsev_test_sech_focusing_2split4B.c:31-43)
        try:
            import fnft_tpu as ft
            from fnft_tpu.testcases import (NsevTestcase, nsev_errors,
                                            nsev_testcase)

            on_cpu = jax.default_backend() == "cpu"
            if on_cpu:
                ft.use_x64()
                # the reference's double-precision bounds
                bounds = {"contspec": 3.9e-6, "a": 6.3e-6, "b": 2.0e-6,
                          "bound_states": 1.6e-5, "normconsts": 5e-14,
                          "residues": 2.1e-6}
            else:
                # TPU has no hardware f64: complex64 production budget
                bounds = {"contspec": 5e-4, "a": 1e-3, "b": 5e-4,
                          "bound_states": 1e-3, "normconsts": 1e-4,
                          "residues": 1e-3}
            data = nsev_testcase(NsevTestcase.SECH_FOCUSING, 4096)
            qh = data.q if on_cpu else data.q.astype(np.complex64)
            opts = ft.NsevOpts(contspec_type=ft.ContspecType.BOTH,
                               discspec_type=ft.DiscspecType.BOTH)
            res = ft.nsev(jnp.asarray(qh), data.t_span, m=data.m,
                          xi_span=data.xi_span, kappa=+1, opts=opts)
            errs = nsev_errors(res, data)
            extra["harness_errors_D4096"] = {
                k: (None if v is None else float(f"{v:.3e}"))
                for k, v in errs.items()}
            extra["harness_bounds_profile"] = "c128_reference" if on_cpu \
                else "c64_tpu_budget"
            extra["harness_within_bounds"] = bool(all(
                errs[k] is not None and errs[k] <= b
                for k, b in bounds.items()))
        except Exception as e:
            extra["harness_error"] = str(e)[:120]

    baseline = C_BASELINE_SECONDS.get(1 << args.log2d)
    return {
        **extra,
        "metric": f"nsev_contspec_sech_D{1 << args.log2d}_2split4b_c64_seconds",
        "value": round(best, 6),
        "unit": "s",
        "vs_baseline": round(baseline / best, 3) if baseline else None,
        "accuracy_check_passed": bool(ok),
        "batched_D4096_spectra_per_sec": round(spectra_per_sec, 1),
        "batched_vs_singlecore_c": round(spectra_per_sec * base_small, 1),
        "platform": jax.devices()[0].platform,
        "pallas_fused_fallback": fused_fallback,
    }


def _recorded_tpu_highlights(log2d: int) -> dict:
    """Watcher-recorded TPU measurements (TPU_MEASUREMENTS.jsonl) summary.

    The axon tunnel flaps: a healthy window hours ago may be dead at bench
    time. The watcher (tools/tpu_watch.py) appends every successful
    hardware measurement to TPU_MEASUREMENTS.jsonl; surfacing the latest
    records here means one flap at round end cannot erase the TPU story.
    """
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TPU_MEASUREMENTS.jsonl")
    if not os.path.exists(path):
        return {}
    latest: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("platform") == "tpu" and "name" in rec:
                latest[rec["name"]] = rec  # later lines win

    d = 1 << log2d
    out: dict = {}
    single = latest.get(f"single_D{d}")
    if single and single.get("accuracy_check_passed"):
        out["recorded_tpu_seconds"] = single["best_seconds"]
        base = C_BASELINE_SECONDS.get(d)
        if base:
            out["recorded_tpu_vs_baseline"] = round(
                base / single["best_seconds"], 1)
        out["recorded_tpu_ts"] = single.get("ts")
    best_batched = 0.0
    for name, rec in latest.items():
        if name.startswith("batched") and rec.get("spectra_per_sec"):
            best_batched = max(best_batched, rec["spectra_per_sec"])
        elif name.startswith("batched") and rec.get("best_seconds"):
            try:
                b = int(name[len("batched"):name.index("_")])
                best_batched = max(best_batched, b / rec["best_seconds"])
            except ValueError:
                pass
    if best_batched:
        out["recorded_tpu_batched_spectra_per_sec"] = round(best_batched, 1)
    df64 = latest.get(f"df64_single_D{d}")
    if df64 and df64.get("accuracy_check_passed"):
        out["recorded_tpu_df64_seconds"] = df64["best_seconds"]
        base = C_BASELINE_SECONDS.get(d)
        if base:
            out["recorded_tpu_df64_vs_baseline"] = round(
                base / df64["best_seconds"], 1)
    harness = latest.get(f"df64_harness_D{d}")
    if harness and "within_c128_reference_bound" in harness:
        out["recorded_tpu_df64_within_c128_reference_bound"] = \
            harness["within_c128_reference_bound"]
        out["recorded_tpu_df64_contspec_rel_err"] = \
            harness.get("contspec_rel_err")
    # ---- round-5 records: full spectrum, kdvv, Pallas, roots ceiling ----
    fspec = latest.get(f"df64_fullspec_D{d}")
    if fspec and fspec.get("accuracy_check_passed"):
        out["recorded_tpu_fullspec_seconds"] = fspec["best_seconds"]
        out["recorded_tpu_fullspec_errors"] = fspec.get("errors")
    fh = latest.get("fullspec_D4096_harness_v2") \
        or latest.get("fullspec_D4096_harness")
    if fh and "within_c128_reference_bound" in fh:
        out["recorded_tpu_fullspec_D4096_within_reference_bounds"] = \
            fh["within_c128_reference_bound"]
    fb = latest.get("fullspec_batched16_D4096")
    if fb and fb.get("spectra_per_sec"):
        out["recorded_tpu_fullspec_spectra_per_sec"] = fb["spectra_per_sec"]
    kdvv = latest.get("kdvv_df64_D131072")
    if kdvv and kdvv.get("accuracy_check_passed"):
        out["recorded_tpu_kdvv_D131072_seconds"] = kdvv["best_seconds"]
        out["recorded_tpu_kdvv_vs_c_anchor"] = kdvv.get("vs_c_anchor")
    kh = latest.get("kdvv_df64_harness_D4096")
    if kh and "accuracy_check_passed" in kh:
        out["recorded_tpu_kdvv_within_reference_bound"] = \
            kh["accuracy_check_passed"]
    rep = latest.get("pallas_repulsion_hw_validation")
    if rep:
        out["recorded_tpu_pallas_repulsion_validated"] = \
            bool(rep.get("accuracy_check_passed"))
    ceil = latest.get("roots_ceiling_deg107520_tpu")
    if ceil and ceil.get("accuracy_check_passed"):
        out["recorded_tpu_roots_ceiling_seconds"] = ceil["best_seconds"]
        out["recorded_tpu_roots_ceiling_certified_fraction"] = \
            ceil.get("certified_fraction")
    return out


def _tpu_probe_ok(timeout: float = 180.0) -> bool:
    """Bounded subprocess probe: does the TPU backend actually execute?"""
    import os
    import subprocess

    # NOTE: block_until_ready alone is NOT a valid probe on the axon tunnel —
    # in the observed degraded state it returns instantly without syncing
    # (fire-and-forget dispatch) while every d2h transfer hangs or raises
    # UNIMPLEMENTED. A usable TPU must round-trip a value to the host.
    # The probe is REAL f32 only: this backend implements no complex types
    # at all, so a complex/FFT probe would always fail even when the TPU
    # is healthy (this exact mistake hid the hardware for three rounds).
    code = ("import numpy as np, jax, jax.numpy as jnp;"
            "x = jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.float32));"
            "v = float(np.asarray(x)[0, 0]);"
            "assert v == 128.0, v;"
            "assert jax.devices()[0].platform == 'tpu'")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              env=dict(os.environ), capture_output=True,
                              timeout=timeout)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2d", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--no-fallback", action="store_true",
                    help="do not fall back to a CPU-measured record when "
                         "the TPU backend is unavailable")
    ap.add_argument("--no-df64", action="store_true",
                    help="skip timing the reference-accuracy float32-pair "
                         "pipeline at D=2^12")
    ap.add_argument("--no-harness", action="store_true",
                    help="skip the six-error accuracy harness at D=4096")
    ap.add_argument("--fused-levels", type=int, default=0,
                    help="enable the Pallas fused early tree levels "
                         "(TPU tuning knob)")
    args = ap.parse_args()

    if args.fused_levels:
        import fnft_tpu.ops.poly as _poly

        _poly.set_fused_early_levels(args.fused_levels)

    import os

    import jax

    # persistent compile cache: the 20-level D=2^20 program costs minutes
    # to compile on the remote helper; cached, it loads in seconds
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir  # subprocesses
    except Exception:
        pass

    if not args.cpu and os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the environment already pins CPU: measure it as a CPU run rather
        # than letting the TPU probe fail and mislabel the record
        args.cpu = True
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    recorded = {} if args.cpu else _recorded_tpu_highlights(args.log2d)
    last_err = None
    if not args.cpu and not args.no_fallback and not _tpu_probe_ok():
        # the tunnel sometimes hangs rather than erroring; a bounded
        # subprocess probe keeps the driver's bench run from stalling
        args.retries = 0
        last_err = "TPU probe failed or timed out (tunnel down)"
    for attempt in range(args.retries):
        try:
            print(json.dumps({**recorded, **_run_once(args)}))
            return 0
        except Exception as e:  # TPU tunnel flakiness: back off and retry
            last_err = e
            if attempt + 1 < args.retries:
                time.sleep(30.0 * (attempt + 1))

    if not args.cpu and not args.no_fallback and \
            (recorded.get("recorded_tpu_df64_seconds")
             or recorded.get("recorded_tpu_seconds")):
        # The tunnel is dead right now but the watcher measured this exact
        # config on real TPU hardware earlier: report THAT as the headline
        # (clearly labeled), not a CPU stand-in. The df64 record (the tier
        # that meets the reference's c128 bound) is the headline; the c64
        # record is the raw-throughput secondary.
        d = 1 << args.log2d
        base = C_BASELINE_SECONDS.get(d)
        df64_best = recorded.get("recorded_tpu_df64_seconds")
        rec = dict(recorded)
        if df64_best:
            rec.update(
                metric=f"nsev_contspec_sech_D{d}_2split4b_df64_seconds",
                value=round(df64_best, 6),
                vs_baseline=round(base / df64_best, 3) if base else None,
                accuracy_check_passed=bool(recorded.get(
                    "recorded_tpu_df64_within_c128_reference_bound")),
                within_c128_reference_bound=recorded.get(
                    "recorded_tpu_df64_within_c128_reference_bound"),
                tier="df64 (reference c128 tolerance on complex-free TPU)",
                c64_raw_seconds=recorded.get("recorded_tpu_seconds"),
                c64_raw_vs_baseline=recorded.get("recorded_tpu_vs_baseline"),
            )
        else:
            best = recorded["recorded_tpu_seconds"]
            rec.update(
                metric=f"nsev_contspec_sech_D{d}_2split4b_c64_seconds",
                value=round(best, 6),
                vs_baseline=round(base / best, 3) if base else None,
                accuracy_check_passed=True,
                tier="c64 raw throughput (df64 record unavailable)",
            )
        rec.update(
            unit="s",
            batched_D4096_spectra_per_sec=recorded.get(
                "recorded_tpu_batched_spectra_per_sec"),
            platform="tpu",
            measurement_source="TPU_MEASUREMENTS.jsonl (watcher-recorded "
                               "on live hardware; tunnel down at bench "
                               "time)",
            tpu_error=str(last_err)[:200],
        )
        print(json.dumps(rec))
        return 0

    if not args.cpu and not args.no_fallback:
        # Dead TPU must still yield a measured number: re-run in a clean
        # subprocess pinned to the CPU backend and annotate the record with
        # the TPU error so the regression-watch signal is never dropped.
        import os
        import subprocess

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        cmd = [sys.executable, __file__, "--cpu", "--no-fallback",
               "--log2d", str(args.log2d), "--reps", str(args.reps),
               "--batch", str(args.batch), "--retries", "1"]
        if args.no_df64:
            cmd.append("--no-df64")
        if args.no_harness:
            cmd.append("--no-harness")
        if args.fused_levels:
            # keep the fallback measurement configuration-comparable
            cmd += ["--fused-levels", str(args.fused_levels)]
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in rec:
                rec["tpu_error"] = str(last_err)[:200]
                print(json.dumps(rec))
                return 0 if proc.returncode == 0 else 1

    print(json.dumps({"metric": "nsev_contspec_bench_failed",
                      "value": 0, "unit": "s", "vs_baseline": 0,
                      "error": str(last_err)[:200]}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
