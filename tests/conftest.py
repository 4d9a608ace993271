"""Test configuration: force a local 8-device virtual CPU backend.

Two things are needed in this environment:
- ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (before backend init)
  so mesh/sharding tests run anywhere (the standard JAX fake-backend trick;
  SURVEY.md §4);
- ``jax.config.update('jax_platforms', 'cpu')`` — a plain env var is NOT enough
  here because the ambient sitecustomize registers a remote-TPU PJRT plugin and
  re-points ``jax_platforms`` at it, which would silently route every test op
  (and compile) over a network tunnel.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
