"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding/multi-chip paths are validated on host CPU with
``--xla_force_host_platform_device_count=8`` (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).

Note: this environment's sitecustomize registers the axon TPU backend and
force-sets ``jax_platforms="axon,cpu"`` at interpreter start, so plain env
vars are not enough — we must override jax.config after import, before any
backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# ADVMH_TEST_TPU=1 runs against the real accelerator (used for the TPU-gated
# Pallas kernel tests); default is the 8-device virtual CPU mesh.
if os.environ.get("ADVMH_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

