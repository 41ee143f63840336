"""Flagship-chain torch→flax conversion parity: build a randomly
initialized torch module with the reference's state-dict layout, convert
its weights through the mapping tables, and assert FORWARD AGREEMENT
(≤1e-3) with the flax module — the gate for any checkpoint-parity claim
(VERDICT round 1, item 3).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from tpu_bev3d.utils.torch_convert import convert_torch_checkpoint


def _agree(a, b, tol=1e-3, name=''):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    err = np.max(np.abs(a - b)) / max(1e-6, float(np.max(np.abs(b))))
    assert err < tol, f'{name}: rel err {err:.2e}'


def test_lss_fpn_forward_parity():
    from tests.torch_refs.bevfusion_ref import GeneralizedLSSFPNRef
    from tpu_bev3d.models.necks.generalized_lss_fpn import GeneralizedLSSFPN
    from tpu_bev3d.utils.mappings import lss_fpn_mapping

    torch.manual_seed(1)
    tm = GeneralizedLSSFPNRef(in_channels=(8, 16, 32), out_channels=16).eval()
    fm = GeneralizedLSSFPN(in_channels=(8, 16, 32), out_channels=16,
                           num_outs=2)
    rng = np.random.RandomState(1)
    feats = [rng.randn(2, 16, 22, 8).astype(np.float32),
             rng.randn(2, 8, 11, 16).astype(np.float32),
             rng.randn(2, 4, 6, 32).astype(np.float32)]
    variables = fm.init(jax.random.PRNGKey(0),
                        tuple(jnp.asarray(f) for f in feats))
    mapping = lss_fpn_mapping(num_ins=3, prefix='', flax_prefix=())
    conv = convert_torch_checkpoint(tm.state_dict(), variables, mapping,
                                    verbose=False)
    outs_f = fm.apply(conv, tuple(jnp.asarray(f) for f in feats))
    with torch.no_grad():
        outs_t = tm([torch.from_numpy(f).permute(0, 3, 1, 2)
                     for f in feats])
    for i, (of, ot) in enumerate(zip(outs_f, outs_t)):
        _agree(of, ot.permute(0, 2, 3, 1).numpy(), name=f'lssfpn {i}')


def test_second_secondfpn_forward_parity():
    from tests.torch_refs.bevfusion_ref import SECONDRef, SECONDFPNRef
    from tpu_bev3d.models.backbones.second import SECOND
    from tpu_bev3d.models.necks.second_fpn import SECONDFPN
    from tpu_bev3d.utils.mappings import second_mapping, secondfpn_mapping

    torch.manual_seed(2)
    tb = SECONDRef(in_channels=16, out_channels=(16, 32),
                   layer_nums=(2, 2), layer_strides=(2, 2)).eval()
    tn = SECONDFPNRef(in_channels=(16, 32), out_channels=(16, 16),
                      upsample_strides=(1, 2)).eval()
    fb = SECOND(in_channels=16, out_channels=(16, 32), layer_nums=(2, 2),
                layer_strides=(2, 2))
    fn = SECONDFPN(in_channels=(16, 32), out_channels=(16, 16),
                   upsample_strides=(1, 2))
    rng = np.random.RandomState(2)
    x = rng.randn(2, 32, 32, 16).astype(np.float32)
    vb = fb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    feats_f = fb.apply(vb, jnp.asarray(x))
    vn = fn.init(jax.random.PRNGKey(1), feats_f)

    mb = second_mapping((2, 2), prefix='', flax_prefix=())
    mn = secondfpn_mapping((1, 2), prefix='', flax_prefix=())
    cb = convert_torch_checkpoint(tb.state_dict(), vb, mb, verbose=False)
    cn = convert_torch_checkpoint(tn.state_dict(), vn, mn, verbose=False)
    feats_f = fb.apply(cb, jnp.asarray(x))
    out_f = fn.apply(cn, feats_f)
    with torch.no_grad():
        feats_t = tb(torch.from_numpy(x).permute(0, 3, 1, 2))
        out_t = tn(feats_t)
    for i, (ff, ft) in enumerate(zip(feats_f, feats_t)):
        _agree(ff, ft.permute(0, 2, 3, 1).numpy(), name=f'second {i}')
    _agree(out_f, out_t.permute(0, 2, 3, 1).numpy(), name='secondfpn')


def test_convfuser_forward_parity():
    from tests.torch_refs.bevfusion_ref import ConvFuserRef
    from tpu_bev3d.models.detectors.bevfusion import ConvFuser
    from tpu_bev3d.utils.mappings import convfuser_mapping

    torch.manual_seed(3)
    tm = ConvFuserRef(24, 16).eval()
    fm = ConvFuser(out_channels=16)
    rng = np.random.RandomState(3)
    a = rng.randn(2, 12, 14, 8).astype(np.float32)
    b = rng.randn(2, 12, 14, 16).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0),
                        [jnp.asarray(a), jnp.asarray(b)])
    mapping = convfuser_mapping(prefix='', flax_prefix=())
    conv = convert_torch_checkpoint(tm.state_dict(), variables, mapping,
                                    verbose=False)
    out_f = fm.apply(conv, [jnp.asarray(a), jnp.asarray(b)])
    with torch.no_grad():
        out_t = tm([torch.from_numpy(a).permute(0, 3, 1, 2),
                    torch.from_numpy(b).permute(0, 3, 1, 2)])
    _agree(out_f, out_t.permute(0, 2, 3, 1).numpy(), name='convfuser')


def test_depth_lss_forward_parity():
    """Full DepthLSSTransform: conv stacks + frustum geometry + pool +
    downsample — forward agreement with converted torch weights. Both
    sides are xy-order (rows = x bins), like the whole reference BEVFusion
    BEV pipeline; only NHWC↔NCHW differs."""
    from tests.torch_refs.bevfusion_ref import DepthLSSRef
    from tpu_bev3d.models.view_transforms.depth_lss import DepthLSSTransform

    from tpu_bev3d.utils.mappings import depth_lss_mapping

    kw = dict(in_channels=32, out_channels=16, image_size=(64, 176),
              feature_size=(8, 22), xbound=(-10.0, 10.0, 0.5),
              ybound=(-10.0, 10.0, 0.5), zbound=(-10.0, 10.0, 20.0),
              dbound=(1.0, 25.0, 1.0), downsample=2)
    tm = DepthLSSRef(**kw).eval()
    fm = DepthLSSTransform(**kw)

    B, N = 1, 2
    rng = np.random.RandomState(4)
    img = rng.randn(B, N, 8, 22, 32).astype(np.float32)
    # plausible cam geometry: forward-looking cams, fx=fy=60
    intrins = np.tile(np.array([[60., 0, 88.], [0, 60., 32.],
                                [0, 0, 1.]], np.float32), (B, N, 1, 1))
    cam2lidar = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    # cam z → lidar x (typical front cam): R = [[0,0,1],[-1,0,0],[0,-1,0]]
    R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    cam2lidar[:, :, :3, :3] = R
    cam2lidar[:, :, :3, 3] = rng.randn(B, N, 3) * 0.1
    post_rots = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_trans = np.zeros((B, N, 3), np.float32)
    lidar2cam = np.linalg.inv(cam2lidar)
    K4 = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    K4[:, :, :3, :3] = intrins
    lidar2img = K4 @ lidar2cam
    pts = rng.randn(B, 512, 5).astype(np.float32) * 8
    pts[..., 0] = np.abs(pts[..., 0]) + 2   # in front of the cams
    pmask = np.ones((B, 512), bool)

    cam_params = dict(cam2lidar=jnp.asarray(cam2lidar),
                      intrins=jnp.asarray(intrins),
                      post_rots=jnp.asarray(post_rots),
                      post_trans=jnp.asarray(post_trans),
                      lidar2img=jnp.asarray(lidar2img))
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(img), cam_params,
                        points=jnp.asarray(pts), points_mask=jnp.asarray(pmask))
    mapping = depth_lss_mapping(prefix='', flax_prefix=(), downsample=2)
    conv = convert_torch_checkpoint(tm.state_dict(), variables, mapping,
                                    verbose=False)
    out_f, dl_f = fm.apply(conv, jnp.asarray(img), cam_params,
                           points=jnp.asarray(pts),
                           points_mask=jnp.asarray(pmask))

    # same sparse depth map on both sides (our deterministic scatter-min)
    from tpu_bev3d.models.view_transforms.depth_lss import \
        project_points_to_depth
    dm = project_points_to_depth(jnp.asarray(pts), jnp.asarray(pmask),
                                 jnp.asarray(lidar2img), (64, 176))
    with torch.no_grad():
        out_t, dl_t = tm(torch.from_numpy(img).permute(0, 1, 4, 2, 3),
                         torch.from_numpy(np.asarray(dm)),
                         torch.from_numpy(cam2lidar),
                         torch.from_numpy(intrins),
                         torch.from_numpy(post_rots),
                         torch.from_numpy(post_trans))
    # depth logits agree per camera
    _agree(dl_f, dl_t.permute(0, 1, 3, 4, 2).numpy(), name='depth logits')
    # BEV map agrees (both xy-order; NHWC vs NCHW only)
    _agree(jnp.transpose(out_f, (0, 3, 1, 2)), out_t.numpy(),
           name='bev out')


def test_full_bevfusion_mapping_resolves_and_runs():
    """Composed flagship table: every entry resolves into the real
    variable tree of a (tiny) BEVFusion L+C with the sparse encoder, and
    the converted model still runs predict."""
    import jax.numpy as jnp
    from tpu_bev3d.config import Config
    from tpu_bev3d.testing import (build_detector_from_cfg,
                                   create_multimodal_inputs)
    from tpu_bev3d.utils.mappings import bevfusion_mapping

    cfg = Config.fromfile(
        'configs/bevfusion/bevfusion_lidar_cam_voxel0075_second_secfpn_nus'
        '.py')
    m = cfg.model
    m.voxel_size = [0.5625, 0.5625, 0.2]
    m.max_voxels = 256
    m.middle_encoder.sparse_shape = [41, 192, 192]
    m.bbox_head.num_proposals = 16
    m.view_transform.image_size = [64, 176]
    m.view_transform.feature_size = [8, 22]
    m.view_transform.xbound = [-54.0, 54.0, 2.25]
    m.view_transform.ybound = [-54.0, 54.0, 2.25]
    m.view_transform.dbound = [1.0, 25.0, 1.0]
    m.bbox_head.voxel_size = [0.5625, 0.5625, 0.2]
    model = build_detector_from_cfg(m)
    batch = create_multimodal_inputs(
        batch_size=1, num_points=512, point_dim=5, num_gt=4,
        num_classes=10, image_size=(64, 176),
        pc_range=tuple(cfg.point_cloud_range), with_velocity=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')

    mapping = bevfusion_mapping(m)
    assert len(mapping) > 450
    sd = _synth_torch_state(mapping, variables)
    out = convert_torch_checkpoint(sd, variables, mapping, verbose=False)
    preds = model.apply(
        {'params': out['params'], 'batch_stats': out['batch_stats']},
        batch, mode='predict')
    assert np.all(np.isfinite(np.asarray(preds['bboxes'])))


def _synth_torch_state(mapping, variables):
    """Invert the converters to fabricate correctly-shaped torch tensors
    for every mapping entry (covers conv2d/deconv2d/linear/conv1d/spconv/
    mha_* tags)."""
    sd = {}
    for tname, fpath in mapping.items():
        name, _, tag = tname.partition('|')
        if name in sd:
            continue
        node = variables
        for p in fpath:
            node = node[p]
        shp = tuple(node.shape)
        if tag == 'conv2d':
            t = torch.randn(shp[3], shp[2], shp[0], shp[1])
        elif tag == 'deconv2d':
            t = torch.randn(shp[2], shp[3], shp[0], shp[1])
        elif tag in ('linear', 'conv1d'):
            t = torch.randn(shp[1], shp[0])
            if tag == 'conv1d':
                t = t[..., None]
        elif tag == 'spconv':
            K, I, O = shp
            kz, ky, kx = (3, 3, 3) if K == 27 else (3, 1, 1)
            t = torch.randn(O, kz, ky, kx, I) * 0.05
        elif tag in ('mha_q', 'mha_k', 'mha_v'):
            if len(shp) == 3:   # kernel [E, h, dh]
                E = shp[0]
                t = torch.randn(3 * E, E) * 0.05
            else:               # bias [h, dh]
                t = torch.randn(3 * int(np.prod(shp))) * 0.05
        elif tag == 'mha_out':
            E = shp[-1]
            t = torch.randn(E, E) * 0.05
        elif name.endswith('running_var'):
            t = torch.rand(*shp) + 0.5
        else:
            t = torch.randn(*shp) * 0.1
        sd[name] = t
    return sd


def test_transfusion_head_forward_parity():
    from tests.torch_refs.bevfusion_ref import TransFusionHeadRef
    from tpu_bev3d.models.dense_heads.transfusion_head import BEVFusionHead
    from tpu_bev3d.utils.mappings import transfusion_head_mapping

    torch.manual_seed(5)
    K, Cin, hid, Q = 4, 24, 16, 8
    theads = {'center': (2, 2), 'height': (1, 2), 'dim': (3, 2),
              'rot': (2, 2), 'heatmap': (K, 2)}
    tm = TransFusionHeadRef(num_classes=K, in_channels=Cin, hidden=hid,
                            num_proposals=Q, heads=theads, num_heads=2,
                            ff=32).eval()
    fm = BEVFusionHead(num_classes=K, in_channels=Cin, hidden_channel=hid,
                       num_proposals=Q, num_heads=2, ffn_channel=32,
                       with_velocity=False, code_size=8)
    rng = np.random.RandomState(5)
    bev = rng.randn(1, 12, 10, Cin).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(bev))
    mapping = transfusion_head_mapping(
        prefix='', flax_prefix=(),
        heads=('center', 'height', 'dim', 'rot', 'heatmap'))
    conv = convert_torch_checkpoint(tm.state_dict(), variables, mapping,
                                    verbose=False)
    res_f = fm.apply(conv, jnp.asarray(bev))
    with torch.no_grad():
        res_t = tm(torch.from_numpy(bev).permute(0, 3, 1, 2))
    _agree(res_f['dense_heatmap'],
           res_t['dense_heatmap'].permute(0, 2, 3, 1).numpy(),
           name='dense heatmap')
    assert np.array_equal(np.asarray(res_f['query_labels']),
                          res_t['query_labels'].numpy())
    for k in ('center', 'height', 'dim', 'rot', 'heatmap'):
        _agree(res_f[k], res_t[k].numpy(), tol=5e-3, name=f'head {k}')


def test_swin_forward_parity():
    from tests.torch_refs.swin_ref import SwinRef
    from tpu_bev3d.models.backbones.swin import SwinTransformer
    from tpu_bev3d.utils.mappings import swin_mapping

    torch.manual_seed(0)
    depths, heads = (2, 2), (2, 4)
    tm = SwinRef(embed_dims=32, depths=depths, num_heads=heads,
                 window_size=7, out_indices=(0, 1)).eval()
    fm = SwinTransformer(embed_dims=32, depths=depths, num_heads=heads,
                         window_size=7, out_indices=(0, 1))
    # 40x60 image → 10x15 patches: not window-divisible → exercises the
    # pad+mask path that official 256x704 BEVFusion inputs also hit
    x = np.random.RandomState(0).randn(2, 40, 60, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))

    mapping = swin_mapping(prefix='', flax_prefix=(), depths=depths,
                           out_indices=(0, 1))
    sd = {k: v for k, v in tm.state_dict().items()}
    conv = convert_torch_checkpoint(sd, variables, mapping, verbose=False)
    outs_f = fm.apply(conv, jnp.asarray(x))

    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(outs_f) == len(outs_t) == 2
    for i, (of, ot) in enumerate(zip(outs_f, outs_t)):
        _agree(of, ot.numpy(), name=f'swin out {i}')


def test_swin_w7_checkpoint_into_w8_model():
    """The TPU-fast flagship uses window-8 Swin; importing a window-7
    torch checkpoint goes through relpos_bias_resample (bicubic table
    resample). This validates the conversion resolves every tensor and
    the w8 model runs finite with the imported weights."""
    from tests.torch_refs.swin_ref import SwinRef
    from tpu_bev3d.models.backbones.swin import SwinTransformer
    from tpu_bev3d.utils.mappings import swin_mapping

    torch.manual_seed(0)
    depths, heads = (2, 2), (2, 4)
    tm = SwinRef(embed_dims=32, depths=depths, num_heads=heads,
                 window_size=7, out_indices=(0, 1)).eval()
    fm = SwinTransformer(embed_dims=32, depths=depths, num_heads=heads,
                         window_size=8, out_indices=(0, 1))
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))

    mapping = swin_mapping(prefix='', flax_prefix=(), depths=depths,
                           out_indices=(0, 1), window_size=8)
    sd = {k: v for k, v in tm.state_dict().items()}
    conv = convert_torch_checkpoint(sd, variables, mapping, verbose=False)
    # bias tables resampled 13x13 -> 15x15
    t = conv['params']['stage0_block0']['WindowAttention_0']['rel_pos_bias']
    assert t.shape == (15 * 15, heads[0])
    outs = fm.apply(conv, jnp.asarray(x))
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))
    # window change only perturbs attention bias: outputs stay close to
    # the torch w7 reference in distribution (loose sanity bound)
    with torch.no_grad():
        outs_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    of = np.asarray(outs[0]).ravel()
    ot = outs_t[0].numpy().ravel()
    corr = np.corrcoef(of, ot)[0, 1]
    assert corr > 0.8, corr
