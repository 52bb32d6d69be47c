"""Opportunistic TPU benchmark watcher.

The axon TPU tunnel in this container is intermittently healthy (see
ROUND1_NOTES.md): executions may return UNIMPLEMENTED, and a failed
program can poison the whole interpreter session. This watcher loops
forever: it probes the tunnel with a tiny op in a fresh subprocess, and
when the probe passes it runs the benchmark stages, each in its own
subprocess. Every successful measurement is appended as a JSON line to
TPU_MEASUREMENTS.jsonl, so a later tunnel outage cannot lose data.

Timings are only recorded if a scalar checksum of the result can be
fetched afterwards (block_until_ready alone can "succeed" on a poisoned
execution).

Usage:  python tools/tpu_watch.py [--once]
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

PROBE = """
import jax, jax.numpy as jnp, numpy as np
x = jnp.fft.fft(jnp.arange(256, dtype=jnp.complex64))
jax.block_until_ready(x)
print('EXEC_OK', flush=True)  # NB: bur can be fire-and-forget when degraded
a = np.asarray(x)
assert abs(a[0] - 32640) < 1, a[0]
print('PROBE_OK')
"""

STAGE = """
import json, time
import jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _rho_pipeline

cfg = json.loads('''{cfg}''')
d, m, batch, reps = cfg['d'], cfg['m'], cfg['batch'], cfg['reps']
if cfg.get('fused') is not None:
    import fnft_tpu.ops.poly as _poly
    _poly.set_fused_early_levels(cfg['fused'])
t = np.linspace(-25.0, 25.0, d)
if batch == 1:
    q = (1j * 3.2 / np.cosh(t)).astype(np.complex64)[None, :]
else:
    q = np.stack([(1j * (1.0 + k / batch) / np.cosh(t)).astype(np.complex64)
                  for k in range(batch)])
rho = jax.jit(_rho_pipeline(d, m, (-25.0, 25.0), (-2.0, 2.0)))
qd = jax.device_put(jnp.asarray(q))
t0 = time.perf_counter()
out = rho(qd)
out.block_until_ready()
compile_s = time.perf_counter() - t0
best = float('inf')
for _ in range(reps):
    t0 = time.perf_counter()
    out = rho(qd)
    out.block_until_ready()
    best = min(best, time.perf_counter() - t0)
# validate: fetch scalar checksum + the rho(0) sample
mid = float(np.abs(np.asarray(jax.block_until_ready(jnp.abs(out[0, m // 2])))))
l2 = float(np.asarray(jax.block_until_ready(jnp.sum(jnp.abs(out) ** 2))))
rec = dict(cfg)
rec.update(best_seconds=best, compile_seconds=compile_s,
           rho0_abs=mid, l2=l2, platform=jax.devices()[0].platform,
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
if batch == 1 and abs(cfg.get('expect_rho0', -1) - mid) > 5e-3 and cfg.get('expect_rho0'):
    rec['accuracy_check_passed'] = False
else:
    rec['accuracy_check_passed'] = True
print('STAGE_JSON ' + json.dumps(rec))
"""

DF64_STAGE = """
import json, time
import jax, jax.numpy as jnp, numpy as np
from fnft_tpu.ops.df64_pipeline import nsev_contspec_df64

cfg = json.loads('''{cfg}''')
d = cfg['d']
t = np.linspace(-25.0, 25.0, d)
q = (1j * 3.2 / np.cosh(t)).astype(np.complex128)
t0 = time.perf_counter()
rho = nsev_contspec_df64(q, d=d, m=d, t_span=(-25.0, 25.0),
                         xi_span=(-2.0, 2.0))
compile_s = time.perf_counter() - t0
best = float('inf')
for _ in range(cfg['reps']):
    t0 = time.perf_counter()
    rho = nsev_contspec_df64(q, d=d, m=d, t_span=(-25.0, 25.0),
                             xi_span=(-2.0, 2.0))
    best = min(best, time.perf_counter() - t0)
mid = float(np.abs(rho[d // 2]))
rec = dict(cfg)
rec.update(best_seconds=best, compile_seconds=compile_s, rho0_abs=mid,
           platform=jax.devices()[0].platform,
           accuracy_check_passed=bool(abs(mid - 0.7265425) < 5e-4),
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
print('STAGE_JSON ' + json.dumps(rec))
"""

PALLAS_VALIDATE_STAGE = """
import json, time
import jax, jax.numpy as jnp, numpy as np
import fnft_tpu.ops.poly as _poly
from __graft_entry__ import _rho_pipeline

cfg = json.loads('''{cfg}''')
d = m = cfg['d']
t = np.linspace(-25.0, 25.0, d)
q = (1j * 3.2 / np.cosh(t)).astype(np.complex64)[None, :]
qd = jax.device_put(jnp.asarray(q))
outs = dict()
for lv in (0, cfg.get('levels', 2)):
    _poly.set_fused_early_levels(lv)
    rho = jax.jit(_rho_pipeline(d, m, (-25.0, 25.0), (-2.0, 2.0)))
    outs[lv] = np.asarray(jax.block_until_ready(rho(qd)))
_poly.set_fused_early_levels(None)
lv = cfg.get('levels', 2)
diff = float(np.max(np.abs(outs[lv] - outs[0])))
scale = float(np.max(np.abs(outs[0])) + 1e-30)
agree = bool(diff <= 1e-5 * scale) and bool(np.all(np.isfinite(outs[lv])))
rec = dict(cfg)
rec.update(name='pallas_hw_validation', agree=agree, max_abs_diff=diff,
           platform=jax.devices()[0].platform,
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
print('STAGE_JSON ' + json.dumps(rec))
"""

REPULSION_VALIDATE_STAGE = """
import json, time
import jax, jax.numpy as jnp, numpy as np
from fnft_tpu.ops.pallas_kernels import repulsion_sum
from fnft_tpu.ops.roots import _repulsion_chunked

cfg = json.loads('''{cfg}''')
deg = cfg['d']
rng = np.random.default_rng(0)
z = (rng.normal(size=deg) + 1j * rng.normal(size=deg)).astype(np.complex64)
idx = jnp.arange(deg, dtype=jnp.int32)
zd = jax.device_put(jnp.asarray(z))
interp = jax.default_backend() != 'tpu'  # degraded-tunnel CPU fallback
t0 = time.perf_counter()
got = np.asarray(jax.block_until_ready(
    repulsion_sum(zd, zd, idx, interpret=interp)))
kern_s = time.perf_counter() - t0
t0 = time.perf_counter()
ref = np.asarray(jax.block_until_ready(_repulsion_chunked(zd, zd, idx)))
xla_s = time.perf_counter() - t0
scale = float(np.max(np.abs(ref)) + 1e-30)
diff = float(np.max(np.abs(got - ref)))
# f32 accumulation-order noise only: both paths are f32 on TPU
agree = bool(diff <= 1e-4 * scale) and bool(np.all(np.isfinite(got)))
rec = dict(cfg)
rec.update(name='pallas_repulsion_hw_validation', agree=agree,
           max_rel_diff=diff / scale, kernel_seconds=kern_s,
           xla_seconds=xla_s, platform=jax.devices()[0].platform,
           ts=time.strftime('%Y-%m-%dT%H:%M:%S'))
print('STAGE_JSON ' + json.dumps(rec))
"""

# expect_rho0: |rho(0)| of the Satsuma-Yajima A=3.2 sech
STAGES = [
    # first: cheap hardware validation of the Pallas fused tree — its
    # recorded `agree` flag is what ops/poly.py gates the auto-enable on
    dict(name="pallas_hw_validation", d=1 << 12, levels=2, reps=1,
         pallas_validate=True),
    # Aberth repulsion kernel vs the XLA chunked path (gates
    # ops/roots.set_pallas_repulsion auto-enable); also records the
    # kernel-vs-XLA timing ratio at a representative degree
    dict(name="pallas_repulsion_hw_validation", d=20480,
         repulsion_validate=True),
    dict(name="single_D4096", d=1 << 12, m=1 << 12, batch=1, reps=5,
         expect_rho0=0.7265425),
    dict(name="single_D65536", d=1 << 16, m=1 << 16, batch=1, reps=5,
         expect_rho0=0.7265425),
    dict(name="single_D262144", d=1 << 18, m=1 << 18, batch=1, reps=3,
         expect_rho0=0.7265425),
    dict(name="single_D1048576", d=1 << 20, m=1 << 20, batch=1, reps=3,
         expect_rho0=0.7265425),
    dict(name="batched64_D4096", d=1 << 12, m=1 << 12, batch=64, reps=3),
    dict(name="batched256_D4096", d=1 << 12, m=1 << 12, batch=256, reps=3),
    # Pallas fused-level sweep at the headline size (fused=0 disables;
    # None/absent = auto). Records which tree strategy wins on hardware.
    dict(name="D1048576_fused0", d=1 << 20, m=1 << 20, batch=1, reps=3,
         expect_rho0=0.7265425, fused=0),
    dict(name="D1048576_fused1", d=1 << 20, m=1 << 20, batch=1, reps=3,
         expect_rho0=0.7265425, fused=1),
    dict(name="D1048576_fused3", d=1 << 20, m=1 << 20, batch=1, reps=3,
         expect_rho0=0.7265425, fused=3),
    dict(name="batched256_D4096_fused0", d=1 << 12, m=1 << 12, batch=256,
         reps=3, fused=0),
    # reference-accuracy df64 pipeline timings
    dict(name="df64_D4096", d=1 << 12, reps=3, df64=True),
    dict(name="df64_D65536", d=1 << 16, reps=2, df64=True),
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
                tmo = 360 if st["d"] < (1 << 18) else 900
                if st.get("pallas_validate"):
                    template = PALLAS_VALIDATE_STAGE
                elif st.get("repulsion_validate"):
                    template = REPULSION_VALIDATE_STAGE
                elif st.get("df64"):
                    template = DF64_STAGE
                else:
                    template = STAGE
                ok, out = run_py(template.replace("{cfg}", cfg), tmo)
                line = next((ln for ln in out.splitlines()
                             if ln.startswith("STAGE_JSON ")), None)
                if ok and line:
                    rec = json.loads(line[len("STAGE_JSON "):])
                    with OUT.open("a") as f:
                        f.write(json.dumps(rec) + "\n")
                    if "best_seconds" in rec:
                        log(f"stage {st['name']} OK: "
                            f"best={rec['best_seconds']:.4f}s "
                            f"rho0={rec.get('rho0_abs', float('nan')):.5f}")
                    else:
                        log(f"stage {st['name']} OK: "
                            f"agree={rec.get('agree')} "
                            f"diff={rec.get('max_abs_diff')}")
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
