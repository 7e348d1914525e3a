"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This is the TPU-native analog of the reference's "no distributed tests"
gap (SURVEY §4): every sharded code path is exercised on
``--xla_force_host_platform_device_count=8`` CPU devices.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU for tests even when the session env points at a TPU platform:
# the virtual 8-device mesh only exists on CPU.  The platform override must
# go through jax.config (a TPU plugin in this image re-registers itself over
# the JAX_PLATFORMS env var).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (env must be set before first backend init)

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() >= 8, jax.devices()
