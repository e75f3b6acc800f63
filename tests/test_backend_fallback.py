"""The engine must degrade to host paths when no jax backend can
initialize (clobbered plugin platform, forked worker). Regression for the
round-2 device-platform fixes (see STATUS.md)."""

import subprocess
import sys

SCRIPT = r"""
import numpy as np
from sourmash_tpu.ops import default_backend
from sourmash_tpu.ops.intersect import (
    pairwise_intersection_counts, query_intersection_counts,
)

# the bogus platform in JAX_PLATFORMS has no registered factory, so
# jax.default_backend() raises -- default_backend() must degrade to cpu
assert default_backend() == "cpu", default_backend()

a = np.array([1, 5, 9, 20], dtype=np.uint64)
b = np.array([5, 9, 11], dtype=np.uint64)
counts = pairwise_intersection_counts([a, b])
assert counts[0, 1] == counts[1, 0] == 2, counts
qc = query_intersection_counts(a, [b, a])
assert list(qc) == [2, 4], qc
print("FALLBACK-OK")
"""


def test_host_paths_survive_unusable_backend(tmp_path):
    env = {
        "PYTHONPATH": "/root/repo",
        "PATH": "/usr/bin:/bin",
        "JAX_PLATFORMS": "no_such_platform",
        "HOME": str(tmp_path),
    }
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env,
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "FALLBACK-OK" in proc.stdout
