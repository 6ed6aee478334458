#!/bin/sh
# Run the test suite WITHOUT loading the axon TPU plugin.
#
# The axon sitecustomize (on PYTHONPATH) claims the single tunneled TPU chip
# at interpreter start, so even CPU-only pytest processes contend with any
# live training run for the chip session and can wedge it. Stripping
# PYTHONPATH keeps tests purely on the 8-device virtual CPU mesh.
cd "$(dirname "$0")/.." || exit 1
PYTHONPATH= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
exec python -m pytest tests/ -q "$@"
