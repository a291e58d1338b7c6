"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests are cheap on JAX (unlike the reference, which
needs a real GPU even for its kernel self-tests): we force the CPU platform
with 8 fake devices before jax initializes.  Pallas kernels run in interpret
mode on CPU (see local_agg_pallas._use_interpret).
"""

import os

# hard override: the dev environment may preset JAX_PLATFORMS to a TPU
# platform; tests must be hermetic and run on the fake-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
