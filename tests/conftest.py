"""Test config: force an 8-device virtual CPU mesh before jax imports.

This is the TPU-world substitute for the fake-cluster fixtures the
reference lacks (SURVEY.md §4): multi-chip sharding tests run on
xla_force_host_platform_device_count=8 CPU devices.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (sitecustomize on PYTHONPATH) force-registers itself
# and ignores the JAX_PLATFORMS env var; config.update after import wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `import nic` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
