"""Test harness config: run on a virtual 8-device CPU mesh.

The environment's axon TPU plugin force-sets JAX_PLATFORMS=axon during
interpreter startup (sitecustomize), so env vars alone cannot select CPU —
we must override via jax.config after import. XLA_FLAGS still has to be set
before backend init for the virtual device count to take effect.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
# CPU-CI compile speed: tests trace tiny shapes hundreds of times; XLA's
# full optimization pipeline dominates suite runtime. Disabling most
# optimizations cuts compile time sharply and execution on these toy
# shapes is negligible either way.
jax.config.update('jax_disable_most_optimizations', True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
