"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-native analog of a fake distributed backend — multi-chip
sharding tests (tests/test_sharding.py) run on 8 virtual CPU devices via
`--xla_force_host_platform_device_count` (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms to "axon,cpu" regardless of the env var — override it so
# tests run on the 8-device virtual CPU mesh, not the tunneled chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
