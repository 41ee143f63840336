"""tpu_bev3d — TPU-native (JAX/XLA/Pallas) 3D perception framework."""
import os as _os

if _os.environ.get('TPU_BEV3D_PLATFORM'):
    # This environment's sitecustomize force-sets JAX_PLATFORMS at
    # interpreter start, so the env var alone cannot select a platform;
    # jax.config.update after import can (tests/conftest.py recipe).
    # Centralized here so every CLI (tools/, demo/) honors it.
    try:
        import jax as _jax
        _jax.config.update('jax_platforms',
                           _os.environ['TPU_BEV3D_PLATFORM'])
    except Exception:  # backend already initialized — leave as-is
        pass
