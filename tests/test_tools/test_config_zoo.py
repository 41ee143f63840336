"""Every config under configs/ must parse and build its model module.

Mirrors the reference's config-zoo CI check (mmdet3d tests build every
config's model from cfg.model). Full init at reference scale is too slow
for CI; per-family forward tests in tests/test_models cover numerics on
tiny shapes.
"""
import glob
import os

import pytest

import tpu_bev3d.datasets  # noqa: F401 — trigger transform registration
import tpu_bev3d.models  # noqa: F401 — trigger registration
from tpu_bev3d.config import Config
from tpu_bev3d.registry import MODELS, TASK_UTILS, TRANSFORMS

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CONFIGS = sorted(glob.glob(os.path.join(REPO, 'configs', '*', '*.py')))


def test_config_zoo_nonempty():
    assert len(CONFIGS) >= 25, CONFIGS


@pytest.mark.parametrize(
    'path', CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_parses_and_builds(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg, path
    model = MODELS.build(dict(cfg.model))
    assert model is not None
    # registry sanity for nested component types
    def check_types(d):
        if isinstance(d, dict):
            t = d.get('type')
            if isinstance(t, str):
                assert t in MODELS or t in TASK_UTILS, \
                    f'{t} (from {path}) not registered'
            for v in d.values():
                check_types(v)
        elif isinstance(d, (list, tuple)):
            for v in d:
                check_types(v)
    check_types(dict(cfg.model))

    # kwarg validation for LAZILY-built submodules: detector shells build
    # nested model dicts (img_backbone, img_neck, …) verbatim inside
    # flax setup(), so the top-level build above never constructs them —
    # a misspelled field surfaces only at init_model time (the DLA
    # `depths=` vs `levels=` config bug escaped this test that way).
    # Constructing each nested MODELS dict validates its kwargs; failures
    # other than an unexpected keyword (e.g. a required field the parent
    # injects at build time) are tolerated.
    def build_nested(d):
        if isinstance(d, dict):
            t = d.get('type')
            if isinstance(t, str) and t in MODELS:
                try:
                    MODELS.build(dict(d))
                except Exception as e:  # noqa: BLE001
                    assert 'unexpected keyword' not in str(e), \
                        f'{t} (from {path}): {e}'
            for v in d.values():
                build_nested(v)
        elif isinstance(d, (list, tuple)):
            for v in d:
                build_nested(v)
    for sub in dict(cfg.model).values():
        build_nested(sub)


@pytest.mark.parametrize(
    'path', CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_pipelines_construct(path):
    """Every transform in every pipeline of the config must construct
    with its configured kwargs (TRANSFORMS.build validates fields; data
    loading happens only at call time, so this is cheap)."""
    cfg = Config.fromfile(path)
    pipelines = []
    for key in ('train_dataloader', 'val_dataloader', 'test_dataloader'):
        ds = cfg.get(key, {}).get('dataset', {}) if key in cfg else {}
        pipe = ds.get('pipeline')
        if pipe:
            pipelines.append(pipe)
    for pipe in pipelines:
        for t in pipe:
            assert t.get('type') in TRANSFORMS, \
                f'{t.get("type")} (from {path}) not registered'
            TRANSFORMS.build(dict(t))
