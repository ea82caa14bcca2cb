"""Test configuration: run the suite on CPU with a virtual 8-device mesh.

Golden tests compare against torch-CPU numerics, and distributed tests use
the JAX-native fake-mesh mechanism (xla_force_host_platform_device_count) per
SURVEY.md §4 — no TPU hardware required for CI correctness.

Note: this environment pre-imports jax (sitecustomize registers a TPU
backend), so the platform must be forced via jax.config *before* backend
initialization rather than via JAX_PLATFORMS alone.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Match torch fp32 matmul accumulation in golden tests.
jax.config.update("jax_default_matmul_precision", "highest")
