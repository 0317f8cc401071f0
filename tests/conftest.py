"""Test harness: run everything on CPU with 8 virtual devices.

Per SURVEY.md §4.5, distributed paths are validated on a fake 8-device CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8); the real chip is
reserved for bench.py. This environment forces JAX_PLATFORMS=axon from
outside, so the platform override must go through jax.config before any
backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
