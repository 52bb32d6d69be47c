#!/bin/sh
# Round preflight: the checks the driver/judge will run, in order of cost.
# Usage: sh tools/preflight.sh [--full]
set -e
cd "$(dirname "$0")/.."
echo "== graft entry compile-check"
# The tunnel's failure mode can be a silent hang (dispatch ok, d2h dead),
# so the on-backend check is bounded; on timeout/error the same program is
# re-validated on CPU, which is what the driver's compile-check needs.
if ! timeout 300 python -c "
import __graft_entry__ as g
fn, args = g.entry()
import jax
jax.block_until_ready(jax.jit(fn)(*args))
print('entry ok (backend: %s)' % jax.default_backend())"; then
    echo "-- default backend hung/failed; validating entry on CPU"
    timeout 600 python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry()
jax.block_until_ready(jax.jit(fn)(*args))
print('entry ok (backend: cpu fallback)')"
fi
echo "== 8-device dryrun"
# Skip the axon boot hook (a dead tunnel hangs jax.devices()) and honor
# the virtual-device flag directly — the same env dryrun_multichip's own
# subprocess re-exec uses.
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    timeout 900 python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun ok')"
echo "== bench smoke (CPU, small)"
python bench.py --cpu --log2d 12 --reps 1 --no-df64 --no-harness
if [ "$1" = "--full" ]; then
    echo "== full suite"
    python -m pytest tests/ -q
    echo "== gated slow tests"
    FNFT_SLOW_TESTS=1 python -m pytest \
        tests/test_scatter_chunked.py::test_full_spectrum_d_2pow16 \
        tests/test_df64.py::test_df64_contspec_at_scale_d_2pow16 \
        tests/test_roots_scale.py -q
fi
echo "PREFLIGHT OK"
