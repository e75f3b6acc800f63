#!/bin/bash
# Run reference sourmash test suites against this framework.
# Usage: tools/run_ref_tests.sh test_sourmash.py [pytest args...]
set -u
export PATH=/root/repo/bin:$PATH
export PYTHONPATH=/root/repo
export JAX_PLATFORMS=cpu
cd /root/reference
exec python -m pytest "$@" -q --no-header -p no:cacheprovider
