"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard JAX way
(SURVEY.md §4.4): force the host platform to expose 8 fake devices.
Must run before jax is imported anywhere.
"""
import os

# The sandbox pre-sets JAX_PLATFORMS=axon (real TPU) and its sitecustomize
# re-asserts it via jax.config, so the env var alone is not enough; tests
# must force CPU through jax.config. Set POLY_TEST_TPU=1 to run the suite on
# the real chip instead.
_FORCE_CPU = not os.environ.get("POLY_TEST_TPU")
if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if _FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")
