"""Test configuration: run everything on a virtual 8-device CPU mesh.

This environment registers a TPU PJRT plugin via sitecustomize in every Python
process and pins JAX_PLATFORMS itself, so plain env vars are not enough — the
platform must be forced back to CPU through jax.config before any backend use
(otherwise tests fight over the single real TPU chip and run matmuls in bf16).
Multi-host logic is tested on 8 simulated CPU devices (SURVEY.md §4).
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
