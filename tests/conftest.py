import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize force-registers a TPU PJRT plugin and
# overrides JAX_PLATFORMS; an explicit config.update after import wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolated_view_cache(tmp_path, monkeypatch):
    """Keep the sidecar flat-view cache out of ~/.cache during tests;
    test_view_cache overrides the dir itself where it matters."""
    monkeypatch.setenv(
        "SOURMASH_TPU_VIEW_CACHE_DIR", str(tmp_path / "_viewcache")
    )


REFERENCE_DIR = "/root/reference"
TEST_DATA = os.path.join(REFERENCE_DIR, "tests", "test-data")


@pytest.fixture
def test_data_dir():
    return TEST_DATA


def utils_test_data(filename):
    return os.path.join(TEST_DATA, filename)


@pytest.fixture(params=[True, False])
def track_abundance(request):
    return request.param
