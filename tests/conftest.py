"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests are cheap on JAX (unlike the reference, which
needs a real GPU even for its kernel self-tests): we force the CPU platform
with 8 fake devices before jax initializes.  Pallas kernels run in interpret
mode on CPU (see local_agg_pallas._use_interpret).

The dev environment may preset a remote TPU platform (JAX_PLATFORMS=axon)
whose sitecustomize installs compile hooks into *every* python process,
slowing even CPU jits ~6x through a remote-compile round trip.  Those hooks
are installed before conftest runs, so we re-exec once with a scrubbed
environment to get a hermetic CPU test process.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "_COTNET_TESTS_REEXEC"):
    env = dict(os.environ)
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["_COTNET_TESTS_REEXEC"] = "1"
    os.execvpe(sys.executable,
               [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
