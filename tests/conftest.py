"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU pods, per SURVEY.md §4 (multi-device tests).

The environment pre-registers a TPU backend via sitecustomize and pins
JAX_PLATFORMS=axon, so we override through jax.config (which wins over the
env var) before any backend is initialised.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
