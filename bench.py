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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2d", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from __graft_entry__ import _rho_pipeline

    d = m = 1 << args.log2d
    t_span, xi_span = (-25.0, 25.0), (-2.0, 2.0)
    t = np.linspace(*t_span, d)
    q = (1j * 3.2 / np.cosh(t)).astype(np.complex64)[None, :]  # [1, D]

    rho = jax.jit(_rho_pipeline(d, m, t_span, xi_span))
    q_dev = jax.device_put(jnp.asarray(q))

    out = rho(q_dev)          # compile + first run
    out.block_until_ready()

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = rho(q_dev)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    # sanity: |rho| at xi=0 for the Satsuma-Yajima A=3.2 sech is
    # |sin(pi A)|/... = 0.72654 (see testcases); complex64 tolerance is loose
    check = float(np.abs(np.asarray(out)[0, m // 2]))
    ok = abs(check - 0.7265425) < 5e-3

    baseline = C_BASELINE_SECONDS.get(d)
    result = {
        "metric": f"nsev_contspec_sech_D{d}_M{m}_2split4b_c64_seconds",
        "value": round(best, 6),
        "unit": "s",
        "vs_baseline": round(baseline / best, 3) if baseline else None,
        "accuracy_check_passed": bool(ok),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
