"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware. Must run before jax initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# CPU test runs disable the persistent XLA cache: the XLA:CPU AOT
# serialize/deserialize path is unreliable on this class of host —
# loading entries compiled on a different machine can SIGILL ("machine
# features ... prefer-no-scatter"), and writing entries segfaulted
# twice inside put_executable_and_time. The TPU campaign keeps its
# (TPU-keyed) cache; tests just recompile.
os.environ["PPG_TPU_NO_COMPILATION_CACHE"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the container's sitecustomize pre-imports jax with platforms=axon;
# override via config (env alone is read too early to take effect)
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"


def reference_available():
    return os.path.isdir(REFERENCE)
