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
# NOTE: jax_disable_most_optimizations was tried here (round 2) and
# reverted: it cuts compile time but makes multi-step tests (overfit,
# runner) several times slower in EXECUTION; with the persistent compile
# cache below, full optimizations + cached compiles is strictly better.

import numpy as np
import pytest

import tpu_bev3d.models  # noqa: F401 — populate the registry for every
# test, so single-test invocations don't depend on import order


@pytest.fixture
def rng():
    return np.random.default_rng(0)

# Persistent compile cache: test graphs are deterministic (fixed shapes,
# same jax/XLA build in CI), so caching compilations across runs cuts the
# suite from ~1h (cold) to minutes (warm). The cache directory ships in
# the repo for exactly that reason.
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '.jax_cache_cpu'))
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
