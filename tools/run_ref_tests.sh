#!/bin/bash
# Run reference sourmash test suites against this framework.
# Usage: tools/run_ref_tests.sh test_sourmash.py [pytest args...]
set -u
export PATH=/root/repo/bin:$PATH
# prepend (not clobber): site dirs on the ambient PYTHONPATH may register
# jax plugin platforms (e.g. the axon TPU tunnel) that JAX_PLATFORMS names
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORMS=cpu
cd /root/reference
exec python -m pytest "$@" -q --no-header -p no:cacheprovider
