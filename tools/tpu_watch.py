"""Opportunistic TPU benchmark watcher.

The axon TPU tunnel in this container flaps (healthy windows of minutes
between UNIMPLEMENTED / d2h-hang periods), and — the round-4 discovery —
the backend implements NO COMPLEX TYPES at all: any probe or stage using
complex dtypes or the FFT HLO fails even on healthy hardware (this
masked the hardware for rounds 1-3). The watcher therefore:

* probes with a REAL f32 matmul + device-to-host round-trip (dispatch
  alone can be fire-and-forget when degraded: only a d2h transfer that
  returns the right number counts);
* runs every stage through the real-pair lowering (ops/tpu_pipeline)
  with tables as jit parameters and the persistent compilation cache,
  so a stage interrupted by a flap costs nothing on the next window;
* times with a d2h scalar fetch per rep (block_until_ready is not a
  sync on this tunnel);
* appends every successful measurement to TPU_MEASUREMENTS.jsonl so a
  later outage cannot lose data.

Usage:  python tools/tpu_watch.py [--once] [--redo]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "TPU_MEASUREMENTS.jsonl"
LOG = REPO / "tpu_watch.log"
CACHE = REPO / ".jax_cache"

PROBE = """
import numpy as np, jax, jax.numpy as jnp
x = jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.float32))
print('EXEC_OK', flush=True)  # NB: dispatch can be fire-and-forget
v = float(np.asarray(x)[0, 0])
assert v == 128.0, v
assert jax.devices()[0].platform == 'tpu'
print('PROBE_OK')
"""

_PRELUDE = """
import json, time
import jax
jax.config.update('jax_compilation_cache_dir', '{cache}')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
import jax.numpy as jnp, numpy as np

def sync_scalar(arr):
    return float(np.asarray(arr.ravel()[0]))

cfg = json.loads('''{cfg}''')
"""

STAGE = _PRELUDE + """
from fnft_tpu.ops.tpu_pipeline import rho_pipeline_tabled

d, m, batch, reps = cfg['d'], cfg['m'], cfg['batch'], cfg['reps']
t = np.linspace(-25.0, 25.0, d)
if batch == 1:
    q = (1j * 3.2 / np.cosh(t)).astype(np.complex64)
else:
    q = np.stack([(1j * (1.0 + k / batch) / np.cosh(t)).astype(np.complex64)
                  for k in range(batch)])
rho = rho_pipeline_tabled(d, m, (-25.0, 25.0), (-2.0, 2.0),
                          batch=None if batch == 1 else batch)
qre = jax.device_put(jnp.asarray(q.real))
qim = jax.device_put(jnp.asarray(q.imag))
t0 = time.perf_counter()
rr, ri = rho(qre, qim)
sync_scalar(rr)
compile_s = time.perf_counter() - t0
best = float('inf')
for _ in range(reps):
    t0 = time.perf_counter()
    rr, ri = rho(qre, qim)
    sync_scalar(rr)
    best = min(best, time.perf_counter() - t0)
mid_r = float(np.asarray(rr[..., m // 2]).ravel()[0])
mid_i = float(np.asarray(ri[..., m // 2]).ravel()[0])
mid = abs(complex(mid_r, mid_i))
rec = dict(cfg)
rec.update(best_seconds=best, compile_seconds=compile_s,
           rho0_abs=mid, platform=jax.devices()[0].platform,
           pipeline='rc_tabled', ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
if batch == 1 and cfg.get('expect_rho0'):
    rec['accuracy_check_passed'] = bool(
        abs(cfg['expect_rho0'] - mid) <= 5e-3)
else:
    rec['accuracy_check_passed'] = bool(np.isfinite(mid))
print('STAGE_JSON ' + json.dumps(rec))
"""

HARNESS_STAGE = _PRELUDE + """
from fnft_tpu.ops.tpu_pipeline import rho_pipeline_tabled
from fnft_tpu.testcases import NsevTestcase, nsev_testcase

data = nsev_testcase(NsevTestcase.SECH_FOCUSING, cfg['d'])
fn = rho_pipeline_tabled(cfg['d'], data.m, data.t_span, data.xi_span)
qh = data.q.astype(np.complex64)
rr, ri = fn(jnp.asarray(qh.real), jnp.asarray(qh.imag))
got = np.asarray(rr) + 1j * np.asarray(ri)
ref = np.asarray(data.contspec)
cerr = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
rec = dict(cfg)
rec.update(contspec_rel_err=cerr, within_c64_budget=bool(cerr <= 5e-4),
           platform=jax.devices()[0].platform,
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
print('STAGE_JSON ' + json.dumps(rec))
"""

MXU_FFT_STAGE = _PRELUDE + """
from fnft_tpu.ops import rc
from fnft_tpu.ops import tables
from fnft_tpu.ops.mxu_fft import fft_pair

n = cfg['d']
rng = np.random.default_rng(0)
x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
ref = np.fft.fft(x)
fn = tables.jit_tabled(fft_pair, ((jax.ShapeDtypeStruct((n,), jnp.float32),) * 2,))
def call(re, im):
    return fn((re, im))
xr = jax.device_put(jnp.asarray(x.real)); xi = jax.device_put(jnp.asarray(x.imag))
t0 = time.perf_counter()
fr, fi = call(xr, xi)
sync_scalar(fr)
compile_s = time.perf_counter() - t0
best = float('inf')
for _ in range(cfg['reps']):
    t0 = time.perf_counter()
    fr, fi = call(xr, xi)
    sync_scalar(fr)
    best = min(best, time.perf_counter() - t0)
got = np.asarray(fr) + 1j * np.asarray(fi)
rel = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
rec = dict(cfg)
rec.update(best_seconds=best, compile_seconds=compile_s, rel_err=rel,
           platform=jax.devices()[0].platform,
           accuracy_check_passed=bool(rel < 5e-6),
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
print('STAGE_JSON ' + json.dumps(rec))
"""

DF64_STAGE = _PRELUDE + """
from fnft_tpu.ops.df64_pipeline import rho_pipeline_df64_tabled

d, m, reps = cfg['d'], cfg['m'], cfg['reps']
batch = cfg.get('batch', 1)
t = np.linspace(-25.0, 25.0, d)
if batch == 1:
    q = (1j * 3.2 / np.cosh(t)).astype(np.complex128)
else:
    q = np.stack([(1j * (1.0 + k / batch) / np.cosh(t))
                  for k in range(batch)]).astype(np.complex128)
re, im = np.real(q), np.imag(q)
rh = re.astype(np.float32); rl = (re - rh.astype(np.float64)).astype(np.float32)
ih = im.astype(np.float32); il = (im - ih.astype(np.float64)).astype(np.float32)
fn = rho_pipeline_df64_tabled(d, m, (-25.0, 25.0), (-2.0, 2.0),
                              batch=None if batch == 1 else batch)
args = [jax.device_put(jnp.asarray(a)) for a in (rh, rl, ih, il)]
t0 = time.perf_counter()
out = fn(*args)
sync_scalar(out[0])
compile_s = time.perf_counter() - t0
best = float('inf')
for _ in range(reps):
    t0 = time.perf_counter()
    out = fn(*args)
    sync_scalar(out[0])
    best = min(best, time.perf_counter() - t0)
mid = abs(complex(
    float(np.asarray(out[0][..., m // 2]).ravel()[0])
    + float(np.asarray(out[1][..., m // 2]).ravel()[0]),
    float(np.asarray(out[2][..., m // 2]).ravel()[0])
    + float(np.asarray(out[3][..., m // 2]).ravel()[0])))
rec = dict(cfg)
rec.update(best_seconds=best, compile_seconds=compile_s, rho0_abs=mid,
           platform=jax.devices()[0].platform, pipeline='df64_tabled',
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
if batch == 1 and cfg.get('expect_rho0'):
    rec['accuracy_check_passed'] = bool(
        abs(cfg['expect_rho0'] - mid) <= 1e-3)
else:
    rec['spectra_per_sec'] = round(batch / best, 1)
    rec['accuracy_check_passed'] = bool(np.isfinite(mid))
print('STAGE_JSON ' + json.dumps(rec))
"""

# the reference-tolerance claim on TPU: full analytic-contspec comparison
# in df64, gated on the reference c128 test bound scaled by 2SPLIT4B's
# 2nd-order convergence (3.9e-6 at D=4096; floor = df64 roundoff margin)
DF64_HARNESS_STAGE = _PRELUDE + """
from fnft_tpu.ops.df64_pipeline import rho_pipeline_df64_tabled
from fnft_tpu.testcases import NsevTestcase, nsev_testcase

d = cfg['d']
data = nsev_testcase(NsevTestcase.SECH_FOCUSING, d)
q = np.asarray(data.q, np.complex128)
re, im = np.real(q), np.imag(q)
rh = re.astype(np.float32); rl = (re - rh.astype(np.float64)).astype(np.float32)
ih = im.astype(np.float32); il = (im - ih.astype(np.float64)).astype(np.float32)
fn = rho_pipeline_df64_tabled(d, data.m, data.t_span, data.xi_span)
args = [jax.device_put(jnp.asarray(a)) for a in (rh, rl, ih, il)]
t0 = time.perf_counter()
out = fn(*args)
sync_scalar(out[0])
compile_s = time.perf_counter() - t0
got = (np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)) \
    + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64))
ref = np.asarray(data.contspec)
cerr = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
bound = max(3.9e-6 * (4096.0 / d) ** 2, 1e-8)
rec = dict(cfg)
rec.update(contspec_rel_err=cerr, c128_reference_bound=bound,
           within_c128_reference_bound=bool(cerr <= bound),
           compile_seconds=compile_s, platform=jax.devices()[0].platform,
           pipeline='df64_tabled', ts=time.strftime('%Y-%m-%dT%H:%M:%S'),
           accuracy_check_passed=bool(cerr <= bound))
print('STAGE_JSON ' + json.dumps(rec))
"""

# expect_rho0: |rho(0)| of the Satsuma-Yajima A=3.2 sech
# Ordered cheapest-first so a short healthy window still records the
# validation + small sizes before attempting the long 2^20 compile.
STAGES = [
    dict(name="mxu_fft_2to21", d=1 << 21, reps=3, mxu_fft=True),
    dict(name="harness_accuracy_D4096", d=1 << 12, harness=True),
    dict(name="single_D4096", d=1 << 12, m=1 << 12, batch=1, reps=5,
         expect_rho0=0.7265425),
    dict(name="single_D16384", d=1 << 14, m=1 << 14, batch=1, reps=5,
         expect_rho0=0.7265425),
    dict(name="single_D65536", d=1 << 16, m=1 << 16, batch=1, reps=5,
         expect_rho0=0.7265425),
    dict(name="batched64_D4096", d=1 << 12, m=1 << 12, batch=64, reps=3),
    dict(name="batched256_D4096", d=1 << 12, m=1 << 12, batch=256, reps=3),
    dict(name="batched1024_D4096", d=1 << 12, m=1 << 12, batch=1024, reps=3),
    dict(name="single_D262144", d=1 << 18, m=1 << 18, batch=1, reps=3,
         expect_rho0=0.7265425),
    dict(name="single_D1048576", d=1 << 20, m=1 << 20, batch=1, reps=3,
         expect_rho0=0.7265425),
    # df64 tier: reference-tolerance evidence (harness stages use the
    # testcase's 16-point analytic contspec, so the tree dominates)
    dict(name="df64_harness_D4096", d=1 << 12, df64_harness=True,
         timeout=1800),
    dict(name="df64_single_D4096", d=1 << 12, m=1 << 12, reps=3,
         expect_rho0=0.7265425, df64=True, timeout=1800),
    dict(name="df64_harness_D65536", d=1 << 16, df64_harness=True,
         timeout=2400),
    dict(name="df64_single_D65536", d=1 << 16, m=1 << 16, reps=3,
         expect_rho0=0.7265425, df64=True, timeout=2400),
    dict(name="df64_harness_D1048576", d=1 << 20, df64_harness=True,
         timeout=3600),
    dict(name="df64_single_D1048576", d=1 << 20, m=1 << 20, reps=3,
         expect_rho0=0.7265425, df64=True, timeout=3600),
    # reference-tolerance batched throughput (NFDM symbol size)
    dict(name="df64_batched256_D4096", d=1 << 12, m=1 << 12, batch=256,
         reps=3, df64=True, timeout=2400),
    # c64 batched throughput at a longer symbol
    dict(name="batched64_D65536", d=1 << 16, m=1 << 16, batch=64, reps=3,
         timeout=2400),
]


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with LOG.open("a") as f:
        f.write(line + "\n")


def run_py(code: str, timeout: int) -> tuple[bool, str]:
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout, cwd=str(REPO))
        return r.returncode == 0, r.stdout + r.stderr
    except subprocess.TimeoutExpired as e:
        partial = (e.stdout or b"")
        if isinstance(partial, bytes):
            partial = partial.decode(errors="replace")
        tag = "TIMEOUT(dispatch-ok,d2h-dead)" if "EXEC_OK" in partial \
            else "TIMEOUT"
        return False, tag


def done_stages() -> set[str]:
    names = set()
    if OUT.exists():
        for ln in OUT.read_text().splitlines():
            try:
                names.add(json.loads(ln)["name"])
            except Exception:
                pass
    return names


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--interval", type=float, default=300.0)
    ap.add_argument("--redo", action="store_true",
                    help="re-run stages already recorded")
    args = ap.parse_args()

    while True:
        ok, out = run_py(PROBE, 150)
        if not ok or "PROBE_OK" not in out:
            log(f"probe FAIL: {out.strip().splitlines()[-1][:100] if out.strip() else 'empty'}")
        else:
            log("probe OK — running stages")
            skip = set() if args.redo else done_stages()
            for st in STAGES:
                if st["name"] in skip:
                    continue
                cfg = json.dumps(st)
                # first-compile of the 2^18/2^20 programs costs minutes on
                # the remote helper (cached afterwards)
                tmo = st.get("timeout", 600 if st["d"] < (1 << 18) else 1500)
                if st.get("harness"):
                    template = HARNESS_STAGE
                elif st.get("mxu_fft"):
                    template = MXU_FFT_STAGE
                elif st.get("df64_harness"):
                    template = DF64_HARNESS_STAGE
                elif st.get("df64"):
                    template = DF64_STAGE
                else:
                    template = STAGE
                code = (template.replace("{cfg}", cfg)
                        .replace("{cache}", str(CACHE)))
                ok, out = run_py(code, tmo)
                line = next((ln for ln in out.splitlines()
                             if ln.startswith("STAGE_JSON ")), None)
                if ok and line:
                    rec = json.loads(line[len("STAGE_JSON "):])
                    with OUT.open("a") as f:
                        f.write(json.dumps(rec) + "\n")
                    log(f"stage {st['name']} OK: "
                        f"best={rec.get('best_seconds', float('nan')):.4f}s "
                        f"acc={rec.get('accuracy_check_passed', rec.get('within_c64_budget'))}")
                else:
                    tail = out.strip().splitlines()[-1][:120] if out.strip() else "?"
                    log(f"stage {st['name']} FAIL: {tail}")
                    break  # tunnel likely degraded; next probe cycle
            else:
                if not args.redo and done_stages() >= {s["name"] for s in STAGES}:
                    log("all stages recorded — watcher idling (probe only)")
        if args.once:
            return 0
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
