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

# NO persistent compile cache for the suite: measured on this image, every
# cross-process load of an XLA:CPU AOT entry trips the cpu_aot_loader
# feature check (compile-time tuning pseudo-features like +prefer-no-gather
# are never reported by host detection), so a CPU cache can only be loaded
# through the "could lead to SIGILL" warning.  enable_persistent_cache
# skips cache setup on CPU by design (utils/cache.py docstring); calling it
# here still pins the decision for the whole session (and warms the heap).
from multimodal_clinical_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.config.jax_compilation_cache_dir is None, (
    jax.config.jax_compilation_cache_dir)

assert jax.device_count() >= 8, jax.devices()
