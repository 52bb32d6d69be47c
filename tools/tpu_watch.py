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

REPULSION_STAGE = _PRELUDE + """
from fnft_tpu.ops.pallas_kernels import repulsion_sum_planes
from fnft_tpu.ops import tpu_roots
from fnft_tpu.ops import roots as roots_mod

deg = cfg['d']
rng = np.random.default_rng(0)
zr = jax.device_put(jnp.asarray(rng.standard_normal(deg), jnp.float32))
zi = jax.device_put(jnp.asarray(rng.standard_normal(deg), jnp.float32))
idx = jnp.arange(deg, dtype=jnp.int32)
roots_mod.set_pallas_repulsion(False)          # XLA reference path
f_x = jax.jit(lambda a, b: tpu_roots._repulsion_rc((a, b), (a, b), idx))
sx = f_x(zr, zi)
sxr, sxi = np.asarray(sx[0], np.float64), np.asarray(sx[1], np.float64)
f_p = jax.jit(lambda a, b: repulsion_sum_planes(a, b, a, b, idx))
t0 = time.perf_counter()
sp = f_p(zr, zi)
sync_scalar(sp[0])
compile_s = time.perf_counter() - t0
best = float('inf')
for _ in range(cfg['reps']):
    t0 = time.perf_counter()
    sp = f_p(zr, zi)
    sync_scalar(sp[0])
    best = min(best, time.perf_counter() - t0)
spr, spi = np.asarray(sp[0], np.float64), np.asarray(sp[1], np.float64)
den = max(float(np.max(np.hypot(sxr, sxi))), 1e-30)
rel = float(max(np.max(np.abs(spr - sxr)), np.max(np.abs(spi - sxi))) / den)
rec = dict(cfg)
rec.update(best_seconds=best, compile_seconds=compile_s, rel_err=rel,
           platform=jax.devices()[0].platform,
           accuracy_check_passed=bool(rel < 1e-4),
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
print('STAGE_JSON ' + json.dumps(rec))
"""

FULLSPEC_STAGE = _PRELUDE + """
import traceback
from fnft_tpu.testcases import NsevTestcase, nsev_testcase, nsev_errors
from fnft_tpu.ops.tpu_fullspec import (locate_boundstates_tpu,
                                       nsev_fullspec_df64)
from fnft_tpu.ops.df64_boundstates import (ab_at_states_df64,
                                           newton_refine_df64)
from fnft_tpu.ops.df64_pipeline import rho_pipeline_df64_tabled

d = cfg['d']
data = nsev_testcase(NsevTestcase.SECH_FOCUSING, d)
q = np.asarray(data.q, np.complex128)
m = data.m if cfg.get('harness') else d
xi = data.xi_span
phase = 'contspec'
times = {}
try:
    # phase-by-phase warm pass (pinpoints failures; fills compile cache)
    t0 = time.perf_counter()
    fn = rho_pipeline_df64_tabled(d, m, data.t_span, xi)
    re_, im_ = np.real(q), np.imag(q)
    planes = []
    for v in (re_, im_):
        h_ = v.astype(np.float32)
        planes += [jnp.asarray(h_),
                   jnp.asarray((v - h_.astype(np.float64)).astype(np.float32))]
    rho4 = fn(planes[0], planes[1], planes[2], planes[3])
    sync_scalar(rho4[0])
    times['contspec'] = time.perf_counter() - t0
    print('MARK contspec ok', flush=True)
    phase = 'locate'
    t0 = time.perf_counter()
    cand = locate_boundstates_tpu(q, data.t_span)
    times['locate'] = time.perf_counter() - t0
    print('MARK locate ok n=%d' % cand.size, flush=True)
    phase = 'newton'
    t0 = time.perf_counter()
    k_pad = 1 << max(0, (cand.size - 1)).bit_length()
    lam0 = np.concatenate([cand, np.full(k_pad - cand.size, cand[-1])])
    lam = newton_refine_df64(q, lam0, data.t_span, niter=10)
    times['newton'] = time.perf_counter() - t0
    print('MARK newton ok', flush=True)
    phase = 'ab'
    t0 = time.perf_counter()
    _a, ap, b = ab_at_states_df64(q, lam[:cand.size], data.t_span)
    times['ab'] = time.perf_counter() - t0
    print('MARK ab ok', flush=True)
except Exception as e:
    tb = traceback.format_exc().strip().splitlines()
    print('STAGE_ERR phase=%s: %s | %s' % (
        phase, repr(e)[:300].replace(chr(10), ' '),
        ' || '.join(tb[-4:])[:400].replace(chr(10), ' ')))
    raise SystemExit(1)

try:
    phase = 'composed_cold'
    t0 = time.perf_counter()
    out = nsev_fullspec_df64(q, data.t_span, m=m, xi_span=xi, niter=10)
    cold = time.perf_counter() - t0
    print('MARK composed cold ok', flush=True)
    phase = 'composed_warm'
    t0 = time.perf_counter()
    out = nsev_fullspec_df64(q, data.t_span, m=m, xi_span=xi, niter=10)
    best = time.perf_counter() - t0
    print('MARK composed warm ok', flush=True)
except Exception as e:
    tb = traceback.format_exc().strip().splitlines()
    print('STAGE_ERR phase=%s: %s | %s' % (
        phase, repr(e)[:300].replace(chr(10), ' '),
        ' || '.join(tb[-6:])[:600].replace(chr(10), ' ')))
    raise SystemExit(1)

class R: pass
r = R()
r.reflection_coefficient = out['rho'] if cfg.get('harness') else None
r.a = r.b = None
r.bound_states = out['bound_states']
r.norming_constants = out['norming_constants']
r.residues = out['residues']
errs = nsev_errors(r, data)
scale = (4096.0 / d) ** 2
bounds = dict(contspec=max(3.9e-6 * scale, 1e-8),
              bound_states=max(1.6e-5 * scale, 5e-8),
              normconsts=max(5e-14, 1e-12),
              residues=max(2.1e-6 * scale, 1e-8))
checked = {k: v for k, v in bounds.items()
           if errs.get(k) is not None}
ok = all(errs[k] <= v for k, v in checked.items())
rec = dict(cfg)
rec.update(best_seconds=best, cold_seconds=cold, phase_seconds=times,
           errors={k: errs.get(k) for k in bounds},
           c128_reference_bounds=bounds, n_states=int(len(out['bound_states'])),
           within_c128_reference_bound=bool(ok),
           accuracy_check_passed=bool(ok),
           platform=jax.devices()[0].platform, pipeline='fullspec_df64',
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
print('STAGE_JSON ' + json.dumps(rec))
"""

FULLSPEC_BATCH_STAGE = _PRELUDE + """
from fnft_tpu.ops.tpu_fullspec import nsev_fullspec_df64
from fnft_tpu.ops.df64_pipeline import rho_pipeline_df64_tabled

d, batch = cfg['d'], cfg['batch']
t = np.linspace(-25.0, 25.0, d)
amps = np.linspace(3.05, 3.45, batch)     # all have 3 bound states
fn = rho_pipeline_df64_tabled(d, d, (-25.0, 25.0), (-2.0, 2.0))
qs = [1j * a / np.cosh(t) for a in amps]
# warm every program shape once (contspec + locate + newton + ab)
out = nsev_fullspec_df64(qs[0], (-25.0, 25.0), m=d, xi_span=(-2.0, 2.0),
                         contspec_fn=fn)
assert len(out['bound_states']) == 3
t0 = time.perf_counter()
ns = 0
for qq in qs:
    out = nsev_fullspec_df64(qq, (-25.0, 25.0), m=d, xi_span=(-2.0, 2.0),
                             contspec_fn=fn)
    ns += len(out['bound_states'])
el = time.perf_counter() - t0
rec = dict(cfg)
rec.update(best_seconds=el / batch, total_seconds=el,
           spectra_per_sec=round(batch / el, 2), states_total=ns,
           accuracy_check_passed=bool(ns == 3 * batch),
           platform=jax.devices()[0].platform, pipeline='fullspec_df64',
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
print('STAGE_JSON ' + json.dumps(rec))
"""

KDVV_STAGE = _PRELUDE + """
import scipy.special as sp
from fnft_tpu.ops.df64_pipeline import kdvv_pipeline_df64_tabled
from fnft_tpu.models.discretization import Discretization

d = cfg['d']
if cfg.get('harness'):
    # closed-form sech case (tests/test_kdvv._sech_case grid)
    a_amp = 3.2
    t_span = (-16.0, 15.0)
    tt = np.linspace(*t_span, d)
    u = a_amp / np.cosh(tt) ** 2
    xi_span = (-71.0 / 20.0, 79.0 / 20.0)
    m = 16
    xi = (-0.1 + np.arange(-7.0, 9.0)) / 2.0
    s_ = np.sqrt(a_amp + 0.25)
    at = 0.5 - 1j * xi + s_
    bt = 0.5 - 1j * xi - s_
    ct = 1.0 - 1j * xi
    a_of = sp.gamma(at) * sp.gamma(bt) / (sp.gamma(ct) * sp.gamma(at + bt - ct))
    rho_ref = a_of * sp.gamma(ct) * sp.gamma(ct - at - bt) / (
        sp.gamma(ct - at) * sp.gamma(ct - bt))
    disc = Discretization.SPLIT4B
else:
    # the C anchor config: sech 3.2, T=[-25,25], M=D, XI=[-2,2], 2SPLIT8B
    t_span = (-25.0, 25.0)
    tt = np.linspace(*t_span, d)
    u = 3.2 / np.cosh(tt)
    xi_span = (-2.0, 2.0)
    m = d
    rho_ref = None
    disc = Discretization.SPLIT8B
import traceback
try:
    if cfg.get('harness'):
        fn = kdvv_pipeline_df64_tabled(d, m, t_span, xi_span, disc=disc)
    else:
        # C-anchor geometry: the one-program compile OOM-kills the
        # remote helper; use the two-program split
        from fnft_tpu.ops.df64_pipeline import kdvv_pipeline_df64_staged
        fn = kdvv_pipeline_df64_staged(d, m, t_span, xi_span, disc=disc)
    uh = u.astype(np.float32)
    ul = (u - uh.astype(np.float64)).astype(np.float32)
    z = np.zeros_like(uh)
    args = [jax.device_put(jnp.asarray(x)) for x in (uh, ul, z, z)]
    t0 = time.perf_counter()
    out = fn(*args)
    sync_scalar(out[0])
    compile_s = time.perf_counter() - t0
except Exception as e:
    tb = traceback.format_exc().strip().splitlines()
    print('STAGE_ERR kdvv: %s | %s' % (
        repr(e)[:300].replace(chr(10), ' '),
        ' || '.join(tb[-6:])[:600].replace(chr(10), ' ')))
    raise SystemExit(1)
best = float('inf')
for _ in range(cfg['reps']):
    t0 = time.perf_counter()
    out = fn(*args)
    sync_scalar(out[0])
    best = min(best, time.perf_counter() - t0)
rho = (np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
       + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3], np.float64)))
rec = dict(cfg)
rec.update(best_seconds=best, compile_seconds=compile_s,
           platform=jax.devices()[0].platform, pipeline='kdvv_df64',
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
if rho_ref is not None:
    err = float(np.max(np.abs(rho - rho_ref)) / np.max(np.abs(rho_ref)))
    bound = max(3.05e-5 * (4096.0 / d) ** 2, 1e-8)  # test_kdvv SPLIT4B bound
    rec.update(contspec_rel_err=err, c128_reference_bound=bound,
               accuracy_check_passed=bool(err <= bound))
else:
    rec.update(rho0_abs=float(np.abs(rho[m // 2])),
               c_anchor_seconds=10.33,
               vs_c_anchor=round(10.33 / best, 1),
               accuracy_check_passed=bool(np.isfinite(np.abs(rho).max())))
print('STAGE_JSON ' + json.dumps(rec))
"""

AB_VALIDATION_STAGE = _PRELUDE + """
# df64 bound-state machinery vs an independent host-f64 reference of the
# same discrete system (diagnoses the fullspec normconsts gap seen on HW)
from fnft_tpu.ops.df64_boundstates import (ab_stage_cdf, newton_stage_cdf,
                                           _split_planes, _join_planes,
                                           pick_chunk_len)
from fnft_tpu.testcases import NsevTestcase, nsev_testcase

d = cfg['d']
data = nsev_testcase(NsevTestcase.SECH_FOCUSING, d)
q = np.asarray(data.q, np.complex128)
lam0 = np.asarray(data.bound_states, np.complex128)
t0_, t1_ = data.t_span
eps = (t1_ - t0_) / (d - 1)
tb = t0_ - 0.5 * eps
te = t1_ + 0.5 * eps
r = -np.conj(q)
K = lam0.size


def step_mats(lam, n_, h_):
    ks = q[n_] * r[n_] - lam ** 2
    k_ = np.sqrt(ks.astype(complex))
    ch = np.cosh(k_ * h_)
    sh = np.sinh(k_ * h_) / k_
    g_ = (h_ * ch - sh) / ks
    U = np.empty((lam.size, 2, 2), complex)
    U[:, 0, 0] = ch - 1j * lam * sh
    U[:, 0, 1] = q[n_] * sh
    U[:, 1, 0] = r[n_] * sh
    U[:, 1, 1] = ch + 1j * lam * sh
    dU = np.empty_like(U)
    dU[:, 0, 0] = 1j * lam ** 2 * g_ - (lam * h_ + 1j) * sh
    dU[:, 0, 1] = -q[n_] * lam * g_
    dU[:, 1, 0] = -r[n_] * lam * g_
    dU[:, 1, 1] = -1j * lam ** 2 * g_ - (lam * h_ - 1j) * sh
    return U, dU


def host_sweep(lam, want_traj=False):
    T = np.broadcast_to(np.eye(2, dtype=complex),
                        (lam.size, 2, 2)).copy()
    Td = np.zeros_like(T)
    phis = np.zeros((d + 1, lam.size, 2), complex)
    phis[0, :, 0] = 1.0
    for n_ in range(d):
        U, dU = step_mats(lam, n_, eps)
        Td = dU @ T + U @ Td
        T = U @ T
        if want_traj:
            phis[n_ + 1] = T[:, :, 0]
    a_ = T[:, 0, 0]
    ap_ = Td[:, 0, 0] + 1j * (te - tb) * a_
    if not want_traj:
        return a_, ap_, None, None
    psis = np.zeros((d + 1, lam.size, 2), complex)
    psis[d, :, 1] = 1.0
    S = np.broadcast_to(np.eye(2, dtype=complex),
                        (lam.size, 2, 2)).copy()
    for n_ in range(d - 1, -1, -1):
        U, _ = step_mats(lam, n_, -eps)
        S = U @ S
        psis[n_] = S[:, :, 1]
    return a_, ap_, phis, psis


# ---- Newton cross-check: device vs host from the same perturbed seeds --
seeds = lam0 + (0.003 - 0.004j)
lam_host = seeds.copy()
for _ in range(10):
    a_, ap_, _, _ = host_sweep(lam_host)
    lam_host = lam_host - a_ / ap_
chunk = pick_chunk_len(d, eps, float(np.abs(lam0.imag).max()) + 1.0)
box = jnp.asarray(np.float32([-1e30, 1e30, 0.0, 1e30]))
nout = newton_stage_cdf(_split_planes(q), _split_planes(seeds), box, 10,
                        float(eps), float(te - tb), int(chunk))
lam_dev = (np.asarray(nout[0], np.float64) + np.asarray(nout[1], np.float64)
           + 1j * (np.asarray(nout[2], np.float64)
                   + np.asarray(nout[3], np.float64)))
newton_diff = float(np.max(np.abs(lam_dev - lam_host)))

# ---- ab sweep cross-check at the host-refined states -------------------
a_ref, ap_ref, phis, psis = host_sweep(lam_host, want_traj=True)
with np.errstate(all='ignore'):
    ratio = (phis[..., 1] / psis[..., 1]) / (phis[..., 0] / psis[..., 0])
    met = np.abs(0.5 * np.log(np.abs(ratio)))
met = np.where(np.isnan(met), np.inf, met)
jbest = np.argmin(met, axis=0)
b_ref_hat = phis[jbest, np.arange(K), 0] / psis[jbest, np.arange(K), 0]
out = ab_stage_cdf(_split_planes(q), _split_planes(lam_host), float(eps),
                   int(chunk))
ap_hat = (_join_planes(out['ap_hat'])
          + 1j * (te - tb) * _join_planes(out['a_hat'])) * np.exp2(
    np.asarray(out['w_a'], np.float64))
b_hat = _join_planes(out['b_hat']) * np.exp2(
    np.asarray(out['w_b'], np.float64))
rec = dict(cfg)
rec.update(
    newton_dev_vs_host=newton_diff,
    ap_rel=float(np.max(np.abs(ap_hat - ap_ref) / np.abs(ap_ref))),
    b_rel=float(np.max(np.abs(b_hat - b_ref_hat) / np.abs(b_ref_hat))),
    metric_dev=[float(x) for x in np.asarray(out['metric'])],
    metric_ref=[float(met[jbest[k2], k2]) for k2 in range(K)],
    jbest_ref=[int(x) for x in jbest],
    platform=jax.devices()[0].platform,
    ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
rec['accuracy_check_passed'] = bool(rec['ap_rel'] < 1e-10
                                    and rec['b_rel'] < 1e-10
                                    and newton_diff < 1e-10)
print('STAGE_JSON ' + json.dumps(rec))
"""

ROOTS_CEILING_STAGE = _PRELUDE + """
from fnft_tpu.ops.tpu_roots import poly_roots_rc, polish_certify_cdf
from fnft_tpu.ops.roots import certified_tol

data = np.load('tests/data/ceiling_split7a_deg107520.npz')
c = data['coeffs']
eps_sub = float(data['eps_sub'])
exact = data['bound_states']
deg = c.shape[-1] - 1
cr = jax.device_put(jnp.asarray(c.real.astype(np.float32)))
ci = jax.device_put(jnp.asarray(c.imag.astype(np.float32)))
t0 = time.perf_counter()
rr, ri = poly_roots_rc((cr, ci), num_iters=cfg.get('iters', 60))
sync_scalar(rr)
aberth_s = time.perf_counter() - t0
roots32 = np.asarray(rr, np.float64) + 1j * np.asarray(ri, np.float64)
t0 = time.perf_counter()
pol, eta = polish_certify_cdf(c, roots32, iters=3)
polish_s = time.perf_counter() - t0
tol = certified_tol(deg)
frac = float((eta <= tol).mean())
lam = np.log(pol.astype(np.complex128)) / (2j * eps_sub / 105.0)
keep = lam[(np.abs(lam.real) < 2) & (lam.imag > 0.2) & (lam.imag < 5)]
dists = [float(np.min(np.abs(keep - e))) if keep.size else float('inf')
         for e in exact]
rec = dict(cfg)
rec.update(best_seconds=aberth_s + polish_s, aberth_seconds=aberth_s,
           polish_seconds=polish_s, certified_fraction=frac,
           certified_tol=tol, eta_median=float(np.median(eta)),
           bound_state_distances=dists, deg=deg,
           platform=jax.devices()[0].platform,
           accuracy_check_passed=bool(frac >= 0.999
                                      and max(dists) < 5e-3),
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
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
    # ---- round 5: discrete spectrum, Pallas validation, kdvv ----------
    dict(name="pallas_repulsion_hw_validation", d=1 << 12, reps=5,
         repulsion=True, timeout=1200),
    dict(name="pallas_repulsion_deg65536", d=1 << 16, reps=3,
         repulsion=True, timeout=1800),
    dict(name="kdvv_df64_harness_D4096", d=1 << 12, reps=3, kdvv=True,
         harness=True, timeout=1800),
    dict(name="ab_validation_D512", d=512, ab_validation=True,
         timeout=1800),
    dict(name="ab_validation_D4096", d=1 << 12, ab_validation=True,
         timeout=1800),
    # rerun of the D=512 validation with the fixed Newton update (the
    # first record is the acc=False diagnostic of the pre-fix code)
    dict(name="ab_validation_D512_v2", d=512, ab_validation=True,
         timeout=1800),
    dict(name="fullspec_D4096_harness_v2", d=1 << 12, fullspec=True,
         harness=True, timeout=2400),
    dict(name="df64_single_D262144", d=1 << 18, m=1 << 18, reps=3,
         expect_rho0=0.7265425, df64=True, timeout=3000),
    dict(name="kdvv_df64_D131072", d=1 << 17, reps=3, kdvv=True,
         timeout=3000),
    dict(name="fullspec_batched16_D4096", d=1 << 12, batch=16,
         fullspec_batch=True, timeout=2400),
    dict(name="df64_fullspec_D1048576", d=1 << 20, fullspec=True,
         timeout=3600),
    # eiscor-ceiling rootfinding ON TPU: rc Aberth + df64 polish/certify
    dict(name="roots_ceiling_deg107520_tpu", d=107520, iters=60,
         roots_ceiling=True, timeout=3600),
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
                if st.get("roots_ceiling"):
                    template = ROOTS_CEILING_STAGE
                elif st.get("ab_validation"):
                    template = AB_VALIDATION_STAGE
                elif st.get("repulsion"):
                    template = REPULSION_STAGE
                elif st.get("fullspec"):
                    template = FULLSPEC_STAGE
                elif st.get("fullspec_batch"):
                    template = FULLSPEC_BATCH_STAGE
                elif st.get("kdvv"):
                    template = KDVV_STAGE
                elif st.get("harness"):
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
                    lines = out.strip().splitlines()
                    err = next((ln for ln in lines
                                if ln.startswith("STAGE_ERR")), None)
                    mark = [ln for ln in lines if ln.startswith("MARK ")]
                    tail = err or (lines[-1][:120] if lines else "?")
                    if mark and not err:
                        tail = f"{tail} (last {mark[-1]})"
                    log(f"stage {st['name']} FAIL: {tail[:400]}")
                    break  # tunnel likely degraded; next probe cycle
            else:
                if not args.redo and done_stages() >= {s["name"] for s in STAGES}:
                    log("all stages recorded — watcher idling (probe only)")
        if args.once:
            return 0
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
