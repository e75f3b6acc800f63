"""Repo-root pytest config: the doc/*.md doctests (like tests/) run on the
CPU platform — they must not grab the TPU out from under a real workload.
Must run before any jax import."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
