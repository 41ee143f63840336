"""Zoo checkpoint-import parity (VERDICT r3 item 5): CenterPoint, SECOND,
and PointPillars torch state_dicts convert through utils/mappings.py and
reproduce the torch forward — mirroring test_full_model_parity.py for the
non-flagship families whose published reference checkpoints
(ref configs/centerpoint/README.md:109-119) a user would import.

Each test also asserts the mapping is COMPLETE against the real torch
layout: every mapping key exists in the ref state_dict and every torch
parameter/buffer is consumed (so a renamed key cannot silently fall back
to random init)."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from tpu_bev3d.config import Config
from tpu_bev3d.ops.voxelize import batch_hard_voxelize
from tpu_bev3d.testing import build_detector_from_cfg, create_detector_inputs
from tpu_bev3d.utils.torch_convert import convert_torch_checkpoint


def _agree(a, b, tol=5e-3, name=''):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    err = np.max(np.abs(a - b)) / max(1e-6, float(np.max(np.abs(b))))
    assert err < tol, f'{name}: rel err {err:.2e}'


def _randomize_bn(tm, pfn_safe=False):
    """Keep activations alive through deep ReLU chains; pfn_safe pins
    BN(0) < 0 so the torch PFN's unmasked point-padding slots relu to
    exactly 0 (matching our masked-max semantics)."""
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                                torch.nn.BatchNorm3d)):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0.2, 0.2)
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
                if pfn_safe and isinstance(mod, torch.nn.BatchNorm1d):
                    mod.running_mean.uniform_(0.0, 0.1)
                    mod.bias.uniform_(-1.0, -0.5)


def _check_mapping_complete(mapping, sd, name=''):
    want = {k.partition('|')[0] for k in mapping}
    have = {k for k in sd if not k.endswith('num_batches_tracked')}
    missing = want - have
    unused = have - want
    assert not missing, f'{name}: mapping keys absent from torch: {missing}'
    assert not unused, f'{name}: torch tensors unmapped: {unused}'


def _convert(tm, model, batch, mapping, name):
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    sd = tm.state_dict()
    _check_mapping_complete(mapping, sd, name)
    out = convert_torch_checkpoint(sd, variables, mapping, verbose=False)
    return {'params': out['params'], 'batch_stats': out['batch_stats']}


# --------------------------------------------------------------- CenterPoint

def test_centerpoint_checkpoint_forward_parity():
    from tests.torch_refs.zoo_refs import CenterPointE2ERef
    from tpu_bev3d.utils.mappings import centerpoint_mapping

    cfg = Config.fromfile(
        'configs/centerpoint/centerpoint_voxel01_second_secfpn_nus.py')
    m = cfg.model
    pc_range = [-24.0, -24.0, -5.0, 24.0, 24.0, 3.0]
    m.point_cloud_range = pc_range
    m.voxel_size = [1.0, 1.0, 8.0 / 24]
    m.max_voxels = 512
    m.max_num_points = 10
    m.middle_encoder.sparse_shape = [25, 48, 48]
    m.middle_encoder.tile_capacity = 2048
    m.middle_encoder.tile_dtype = ''     # f32 vs the f32 torch oracle
    m.backbone.in_channels = 128
    m.backbone.layer_nums = [2, 2]
    m.backbone.out_channels = [32, 64]
    m.backbone.layer_strides = [1, 2]
    m.neck.in_channels = [32, 64]
    m.neck.out_channels = [48, 48]
    m.neck.upsample_strides = [1, 2]
    tasks = [dict(num_class=1, class_names=['car']),
             dict(num_class=2, class_names=['pedestrian', 'traffic_cone'])]
    m.bbox_head.tasks = tasks
    m.bbox_head.in_channels = 96
    m.bbox_head.grid_size = [48, 48]
    m.bbox_head.post_max_size = 16   # 6x6 tiny heatmap
    m.bbox_head.min_radius_by_task = [4, 1]
    m.bbox_head.voxel_size = m.voxel_size
    m.bbox_head.point_cloud_range = pc_range
    model = build_detector_from_cfg(m)

    batch = create_detector_inputs(batch_size=1, num_points=600,
                                   point_dim=5, num_gt=4, num_classes=3,
                                   pc_range=tuple(pc_range),
                                   with_velocity=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    torch.manual_seed(0)
    common = {'reg': (2, 2), 'height': (1, 2), 'dim': (3, 2),
              'rot': (2, 2), 'vel': (2, 2)}
    tm = CenterPointE2ERef(
        middle_kw=dict(in_channels=5, sparse_shape=(25, 48, 48),
                       base_channels=16, output_channels=128,
                       active_rule='spconv'),
        second_kw=dict(in_channels=128, out_channels=(32, 64),
                       layer_nums=(2, 2), layer_strides=(1, 2)),
        secfpn_kw=dict(in_channels=(32, 64), out_channels=(48, 48),
                       upsample_strides=(1, 2)),
        head_kw=dict(in_ch=96, tasks=tasks, common_heads=common,
                     share_conv_channel=64)).eval()
    _randomize_bn(tm)

    conv = _convert(tm, model, batch, centerpoint_mapping(m), 'centerpoint')

    outs_f = model.apply(conv, batch, mode='tensor', train=False)
    vox = batch_hard_voxelize(
        batch['points'], batch['points_mask'],
        voxel_size=tuple(m.voxel_size), pc_range=tuple(pc_range),
        max_points=m.max_num_points, max_voxels_per_sample=m.max_voxels,
        reduce='mean')
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(np.asarray(vox['voxels'])),
                    torch.from_numpy(np.asarray(vox['coords'])), 1)

    assert len(outs_f) == len(outs_t) == len(tasks)
    for t, (df, dt) in enumerate(zip(outs_f, outs_t)):
        for k in dt:
            _agree(jnp.transpose(df[k], (0, 3, 1, 2)), dt[k].numpy(),
                   tol=5e-3, name=f'task{t}.{k}')
    # converted model decodes finite boxes end-to-end
    preds = model.apply(conv, batch, mode='predict', train=False)
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))


# --------------------------------------------------------------- SECOND

def test_second_checkpoint_forward_parity():
    from tests.torch_refs.zoo_refs import SECONDE2ERef
    from tpu_bev3d.utils.mappings import second_kitti_mapping

    cfg = Config.fromfile('configs/second/second_kitti_3class.py')
    m = cfg.model
    pc_range = [0.0, -24.0, -3.0, 48.0, 24.0, 1.0]
    m.point_cloud_range = pc_range
    m.voxel_size = [1.0, 1.0, 4.0 / 24]
    m.max_voxels = 512
    m.max_num_points = 5
    m.middle_encoder.sparse_shape = [25, 48, 48]
    m.middle_encoder.tile_capacity = 2048
    m.middle_encoder.tile_dtype = ''
    m.backbone.in_channels = 128
    m.backbone.layer_nums = [2, 2]
    m.backbone.out_channels = [32, 64]
    m.neck.in_channels = [32, 64]
    m.neck.out_channels = [48, 48]
    m.bbox_head.in_channels = 96
    m.bbox_head.feat_channels = 96
    model = build_detector_from_cfg(m)

    batch = create_detector_inputs(batch_size=1, num_points=600,
                                   point_dim=4, num_gt=4, num_classes=3,
                                   pc_range=tuple(pc_range))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    torch.manual_seed(1)
    tm = SECONDE2ERef(
        middle_kw=dict(
            in_channels=4, sparse_shape=(25, 48, 48), base_channels=16,
            output_channels=128,
            encoder_channels=tuple(m.middle_encoder.encoder_channels),
            encoder_paddings=tuple(m.middle_encoder.encoder_paddings),
            active_rule='spconv'),
        second_kw=dict(in_channels=128, out_channels=(32, 64),
                       layer_nums=(2, 2), layer_strides=(1, 2)),
        secfpn_kw=dict(in_channels=(32, 64), out_channels=(48, 48),
                       upsample_strides=(1, 2)),
        head_kw=dict(in_ch=96, num_anchors=6, num_classes=3)).eval()
    _randomize_bn(tm)

    conv = _convert(tm, model, batch, second_kitti_mapping(m), 'second')

    cls_f, reg_f, dir_f = model.apply(conv, batch, mode='tensor',
                                      train=False)
    vox = batch_hard_voxelize(
        batch['points'], batch['points_mask'],
        voxel_size=tuple(m.voxel_size), pc_range=tuple(pc_range),
        max_points=m.max_num_points, max_voxels_per_sample=m.max_voxels,
        reduce='mean')
    with torch.no_grad():
        cls_t, reg_t, dir_t = tm(
            torch.from_numpy(np.asarray(vox['voxels'])),
            torch.from_numpy(np.asarray(vox['coords'])), 1)

    _agree(jnp.transpose(cls_f, (0, 3, 1, 2)), cls_t.numpy(), 5e-3, 'cls')
    _agree(jnp.transpose(reg_f, (0, 3, 1, 2)), reg_t.numpy(), 5e-3, 'reg')
    _agree(jnp.transpose(dir_f, (0, 3, 1, 2)), dir_t.numpy(), 5e-3, 'dir')


def _check_init_model_pth(cfg, tm, tmp_path):
    """init_model(config, checkpoint='*.pth') loads a reference-zoo torch
    state dict through mapping_for_model."""
    from tpu_bev3d.apis.inference import init_model
    p = str(tmp_path / 'zoo.pth')
    torch.save({'state_dict': tm.state_dict()}, p)
    im = init_model(cfg, checkpoint=p)
    w = np.asarray(
        im.variables['params']['_backbone']['block_0_0']['Conv_0']['kernel'])
    key = [k for k in tm.state_dict() if k.endswith('blocks.0.0.weight')][0]
    t = tm.state_dict()[key].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(w, t, rtol=1e-6)


# --------------------------------------------------------------- PointPillars

def test_pointpillars_checkpoint_forward_parity(tmp_path):
    from tests.torch_refs.zoo_refs import PointPillarsE2ERef
    from tpu_bev3d.models.voxel_encoders.pillar_encoder import \
        decorate_pillars
    from tpu_bev3d.utils.mappings import pointpillars_mapping

    cfg = Config.fromfile(
        'configs/pointpillars/pointpillars_kitti_3class.py')
    m = cfg.model
    m.voxel_size = [0.64, 0.64, 4]
    m.max_voxels = 256
    m.max_num_points = 8
    m.voxel_encoder.voxel_size = [0.64, 0.64, 4]
    m.middle_encoder.output_shape = [128, 112]
    model = build_detector_from_cfg(m)

    batch = create_detector_inputs(batch_size=1, num_points=400,
                                   point_dim=4, num_gt=4, num_classes=3)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    torch.manual_seed(2)
    tm = PointPillarsE2ERef(
        pfn_kw=dict(in_ch=10, out_ch=64), ny=128, nx=112,
        second_kw=dict(in_channels=64,
                       out_channels=tuple(m.backbone.out_channels),
                       layer_nums=tuple(m.backbone.layer_nums),
                       layer_strides=tuple(m.backbone.layer_strides)),
        secfpn_kw=dict(in_channels=tuple(m.neck.in_channels),
                       out_channels=tuple(m.neck.out_channels),
                       upsample_strides=tuple(m.neck.upsample_strides)),
        head_kw=dict(in_ch=int(np.sum(m.neck.out_channels)),
                     num_anchors=6, num_classes=3)).eval()
    _randomize_bn(tm, pfn_safe=True)

    conv = _convert(tm, model, batch, pointpillars_mapping(m),
                    'pointpillars')

    cls_f, reg_f, dir_f = model.apply(conv, batch, mode='tensor',
                                      train=False)
    vox = batch_hard_voxelize(
        batch['points'], batch['points_mask'],
        voxel_size=tuple(m.voxel_size),
        pc_range=tuple(m.point_cloud_range),
        max_points=m.max_num_points, max_voxels_per_sample=m.max_voxels)
    decorated, _ = decorate_pillars(
        vox['voxels'], vox['num_points'], vox['coords'],
        voxel_size=tuple(m.voxel_size),
        point_cloud_range=tuple(m.point_cloud_range))
    with torch.no_grad():
        cls_t, reg_t, dir_t = tm(
            torch.from_numpy(np.asarray(decorated)),
            torch.from_numpy(np.asarray(vox['coords'])), 1)

    _agree(jnp.transpose(cls_f, (0, 3, 1, 2)), cls_t.numpy(), 5e-3, 'cls')
    _agree(jnp.transpose(reg_f, (0, 3, 1, 2)), reg_t.numpy(), 5e-3, 'reg')
    _agree(jnp.transpose(dir_f, (0, 3, 1, 2)), dir_t.numpy(), 5e-3, 'dir')

    _check_init_model_pth(cfg, tm, tmp_path)
