"""PointPillars torch→flax mapping: every table entry resolves to a real
leaf and the converted shapes match (synthetic torch state dict built with
the reference layout conventions)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.testing import create_detector_inputs, build_detector_from_cfg
from tpu_bev3d.utils.mappings import pointpillars_mapping
from tpu_bev3d.utils.torch_convert import convert_torch_checkpoint


def _synth_torch_state(mapping, variables):
    """Invert the converters to fabricate correctly-shaped torch tensors."""
    import numpy as np
    sd = {}
    for tname, fpath in mapping.items():
        name, _, tag = tname.partition('|')
        node = variables
        for p in fpath:
            node = node[p]
        shp = tuple(node.shape)
        if tag == 'conv2d':      # flax [kh,kw,I,O] ← torch [O,I,kh,kw]
            t = torch.randn(shp[3], shp[2], shp[0], shp[1])
        elif tag == 'deconv2d':  # flax [kh,kw,I,O] ← torch [I,O,kh,kw]
            t = torch.randn(shp[2], shp[3], shp[0], shp[1])
        elif tag == 'linear':    # flax [I,O] ← torch [O,I]
            t = torch.randn(shp[1], shp[0])
        elif name.endswith('running_var'):
            t = torch.rand(*shp) + 0.5          # variance must be positive
        else:
            t = torch.randn(*shp) * 0.1
        sd[name] = t
    return sd


def test_pointpillars_mapping_complete():
    cfg = Config.fromfile('configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    model = build_detector_from_cfg(m)
    batch = create_detector_inputs(batch_size=1, num_points=128)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')

    mapping = pointpillars_mapping(m)
    assert len(mapping) > 60
    sd = _synth_torch_state(mapping, variables)
    out = convert_torch_checkpoint(sd, variables, mapping, verbose=False)
    # spot-check a converted conv kernel round-trips the layout
    k = out['params']['_backbone']['block_0_0']['Conv_0']['kernel']
    t = sd['backbone.blocks.0.0.weight']
    assert np.allclose(k, t.numpy().transpose(2, 3, 1, 0))
    # converted variables still run
    preds = model.apply(
        {'params': out['params'], 'batch_stats': out['batch_stats']},
        batch, mode='predict')
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))
