"""FULL-MODEL forward parity vs torch (VERDICT r1 item 2).

One test runs the ENTIRE BEVFusion L+C predict chain — Swin →
GeneralizedLSSFPN → DepthLSS lift/pool → sparse middle encoder → SECOND
→ SECONDFPN → ConvFuser → TransFusion head → box decode — on BOTH sides:
the flax detector (built from the reference-faithful sparse-encoder
config) and a torch composition of the per-block reference modules
(tests/torch_refs), with ONE random torch state_dict converted through
the composed bevfusion_mapping. Final boxes, scores, and labels must
agree. This is the largest NDS-parity de-risk available without the real
val set (ref projects/BEVFusion/bevfusion/bevfusion.py:294-381).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from tpu_bev3d.utils.torch_convert import convert_torch_checkpoint


def _agree(a, b, tol=5e-3, name=''):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    err = np.max(np.abs(a - b)) / max(1e-6, float(np.max(np.abs(b))))
    assert err < tol, f'{name}: rel err {err:.2e}'


def test_full_bevfusion_forward_parity():
    from tests.torch_refs.bevfusion_ref import BEVFusionE2ERef
    from tpu_bev3d.config import Config
    from tpu_bev3d.models.view_transforms.depth_lss import \
        project_points_to_depth
    from tpu_bev3d.ops.voxelize import batch_hard_voxelize
    from tpu_bev3d.testing import (build_detector_from_cfg,
                                   create_multimodal_inputs)
    from tpu_bev3d.utils.mappings import bevfusion_mapping

    # ---- tiny but architecture-faithful config (same topology/mapping
    # as the full flagship; only widths/shapes shrink) ----
    cfg = Config.fromfile(
        'configs/bevfusion/bevfusion_lidar_cam_voxel0075_second_secfpn_nus'
        '.py')
    m = cfg.model
    m.voxel_size = [1.125, 1.125, 0.32]
    m.max_num_points = 10
    m.max_voxels = 600
    m.img_backbone.embed_dims = 32
    m.img_backbone.num_heads = [2, 4, 8, 16]
    m.img_neck.in_channels = [64, 128, 256]
    m.img_neck.out_channels = 64
    m.middle_encoder.sparse_shape = [25, 96, 96]
    m.view_transform.in_channels = 64
    m.view_transform.out_channels = 16
    m.view_transform.image_size = [64, 176]
    m.view_transform.feature_size = [8, 22]
    m.view_transform.xbound = [-54.0, 54.0, 4.5]
    m.view_transform.ybound = [-54.0, 54.0, 4.5]
    m.view_transform.dbound = [1.0, 25.0, 1.0]
    m.view_transform.depth_topk = 0          # exact mode for parity
    m.fuser.out_channels = 64
    m.backbone.in_channels = 64
    m.backbone.out_channels = [32, 64]
    m.backbone.layer_nums = [2, 2]
    m.neck.in_channels = [32, 64]
    m.neck.out_channels = [48, 48]
    m.bbox_head.in_channels = 96
    m.bbox_head.hidden_channel = 32
    m.bbox_head.num_proposals = 16
    m.bbox_head.num_heads = 2
    m.bbox_head.ffn_channel = 64
    m.bbox_head.voxel_size = [1.125, 1.125, 0.32]
    m.compute_dtype = 'float32'
    # the faithful config ships the tile backend with bf16 GEMMs
    # (tile_dtype='bfloat16'); parity vs the f32 torch oracle needs f32
    # compute — the tile ACTIVE-SET rule stays the exact spconv rule
    # either way, so this still parity-tests the shipped backend
    m.middle_encoder.tile_dtype = ''
    m.head_dtype = 'float32'
    model = build_detector_from_cfg(m)

    batch = create_multimodal_inputs(
        batch_size=1, num_points=800, point_dim=5, num_gt=4,
        num_classes=10, image_size=(64, 176),
        pc_range=tuple(cfg.point_cloud_range), with_velocity=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')

    # ---- torch side: every block composed, matching dims ----
    torch.manual_seed(0)
    tm = BEVFusionE2ERef(
        swin_kw=dict(embed_dims=32, depths=(2, 2, 6, 2),
                     num_heads=(2, 4, 8, 16), window_size=7,
                     out_indices=(1, 2, 3)),
        fpn_kw=dict(in_channels=(64, 128, 256), out_channels=64),
        lss_kw=dict(in_channels=64, out_channels=16, image_size=(64, 176),
                    feature_size=(8, 22), xbound=(-54.0, 54.0, 4.5),
                    ybound=(-54.0, 54.0, 4.5), zbound=(-10.0, 10.0, 20.0),
                    dbound=(1.0, 25.0, 1.0), downsample=2),
        middle_kw=dict(in_channels=5, sparse_shape=(25, 96, 96),
                       base_channels=16, output_channels=128,
                       active_rule='spconv'),   # == the faithful config
        fuser_in=16 + 128,          # cam 16 + lidar 128·D(=1)
        fuser_out=64,
        second_kw=dict(in_channels=64, out_channels=(32, 64),
                       layer_nums=(2, 2), layer_strides=(1, 2)),
        secfpn_kw=dict(in_channels=(32, 64), out_channels=(48, 48),
                       upsample_strides=(1, 2)),
        head_kw=dict(num_classes=10, in_channels=96, hidden=32,
                     num_proposals=16,
                     heads={'center': (2, 2), 'height': (1, 2),
                            'dim': (3, 2), 'rot': (2, 2), 'vel': (2, 2),
                            'heatmap': (10, 2)},
                     num_heads=2, ff=64)).eval()
    # keep activations alive through ~40 ReLU layers: randomize BN params
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                                torch.nn.BatchNorm3d)):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0.2, 0.2)
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)

    mapping = bevfusion_mapping(m)
    conv = convert_torch_checkpoint(tm.state_dict(), variables, mapping,
                                    verbose=False)
    conv = {'params': conv['params'], 'batch_stats': conv['batch_stats']}

    # ---- shared deterministic inputs for the torch side ----
    vox = batch_hard_voxelize(
        batch['points'], batch['points_mask'],
        voxel_size=tuple(m.voxel_size),
        pc_range=tuple(cfg.point_cloud_range),
        max_points=m.max_num_points,
        max_voxels_per_sample=m.max_voxels, reduce='mean')
    dm = project_points_to_depth(batch['points'], batch['points_mask'],
                                 batch['lidar2img'], (64, 176))

    # ---- run both ----
    preds_f = model.apply(conv, batch, mode='predict', train=False)
    with torch.no_grad():
        res_t, inter = tm(
            torch.from_numpy(np.asarray(batch['imgs'])),
            torch.from_numpy(np.asarray(dm)),
            torch.from_numpy(np.asarray(batch['cam2lidar'])),
            torch.from_numpy(np.asarray(batch['intrins'])),
            torch.from_numpy(np.asarray(batch['post_rots'])),
            torch.from_numpy(np.asarray(batch['post_trans'])),
            torch.from_numpy(np.asarray(vox['voxels'].reshape(-1, 5))),
            torch.from_numpy(np.asarray(vox['coords'].reshape(-1, 4))),
            1)

    # ---- numpy decode of the torch head output (mirrors
    # BEVFusionHead.decode / ref TransFusionBBoxCoder.decode) ----
    vx, vy = m.voxel_size[:2]
    f = m.bbox_head.out_size_factor
    x0, y0 = cfg.point_cloud_range[:2]
    center = res_t['center'].numpy()
    x = center[..., 0] * f * vx + x0
    y = center[..., 1] * f * vy + y0
    z = res_t['height'].numpy()[..., 0]
    dim = np.exp(np.clip(res_t['dim'].numpy(), -5, 5))
    rot = np.arctan2(res_t['rot'].numpy()[..., 0],
                     res_t['rot'].numpy()[..., 1])
    boxes_t = np.concatenate(
        [x[..., None], y[..., None], z[..., None], dim, rot[..., None],
         res_t['vel'].numpy()], -1)
    sig = 1 / (1 + np.exp(-res_t['heatmap'].numpy()))
    qhs = res_t['query_heatmap_score'].numpy()
    lab_t = res_t['query_labels'].numpy()
    scores_t = np.take_along_axis(sig * qhs, lab_t[..., None], -1)[..., 0]

    # ---- final agreement ----
    assert np.array_equal(np.asarray(preds_f['labels']), lab_t)
    _agree(preds_f['scores'], scores_t, tol=1e-2, name='scores')
    bf = np.asarray(preds_f['bboxes'])
    # centers within 5 cm, dims within 2%, rot within 0.01 rad
    assert np.max(np.abs(bf[..., :3] - boxes_t[..., :3])) < 0.05
    _agree(bf[..., 3:6], boxes_t[..., 3:6], tol=2e-2, name='dims')
    dr = np.abs(((bf[..., 6] - boxes_t[..., 6]) + np.pi)
                % (2 * np.pi) - np.pi)
    assert np.max(dr) < 1e-2
    _agree(bf[..., 7:9], boxes_t[..., 7:9], tol=2e-2, name='vel')

    # ---- intermediates (localize regressions quickly) ----
    bev_img, depth_logits, _ = model.apply(
        conv, batch, train=False, method=model.extract_img_feat)
    _agree(jnp.transpose(bev_img, (0, 3, 1, 2)), inter['bev_img'].numpy(),
           tol=5e-3, name='camera bev')
    pts_bev = model.apply(conv, batch['points'], batch['points_mask'],
                          False, method=model.extract_pts_feat)
    _agree(jnp.transpose(pts_bev, (0, 3, 1, 2)), inter['bev_pts'].numpy(),
           tol=5e-3, name='lidar bev')
