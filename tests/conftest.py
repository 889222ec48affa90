"""Test configuration: force CPU with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding is validated on a
virtual 8-device CPU mesh (see repo instructions / SURVEY.md §5.8).

Note: the environment's sitecustomize may programmatically select a TPU
platform, overriding JAX_PLATFORMS — so we also force the platform via
jax.config after import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
