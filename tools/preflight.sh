#!/bin/sh
# Round preflight: the checks the driver/judge will run, in order of cost.
# Usage: sh tools/preflight.sh [--full]
set -e
cd "$(dirname "$0")/.."
echo "== graft entry compile-check (TPU lowering) + 8-device dryrun"
python -c "
import __graft_entry__ as g
fn, args = g.entry()
import jax
jax.block_until_ready(jax.jit(fn)(*args))
print('entry ok')
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
