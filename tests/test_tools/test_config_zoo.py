"""Every config under configs/ must parse and build its model module.

Mirrors the reference's config-zoo CI check (mmdet3d tests build every
config's model from cfg.model). Full init at reference scale is too slow
for CI; per-family forward tests in tests/test_models cover numerics on
tiny shapes.
"""
import glob
import os

import pytest

import tpu_bev3d.models  # noqa: F401 — trigger registration
from tpu_bev3d.config import Config
from tpu_bev3d.registry import MODELS, TASK_UTILS

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
