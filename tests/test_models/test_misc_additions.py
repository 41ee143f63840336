"""DLA backbone, PointNet2Seg + TTA, MSDeformAttn integration smoke."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.models.backbones import DLA
from tpu_bev3d.registry import MODELS


def test_dla_backbone():
    m = DLA(levels=(1, 1, 1, 2), channels=(8, 16, 32, 64),
            out_indices=(2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(variables, x, mutable=['batch_stats'])
    assert outs[0].shape == (1, 16, 16, 32)
    assert outs[1].shape == (1, 8, 8, 64)


def test_pointnet2_seg_and_tta():
    seg_cfg = dict(
        type='PointNet2Seg', num_classes=6, channels=[16],
        backbone=dict(type='PointNet2SASSG', in_channels=4,
                      num_points=(64, 32, 16, 8),
                      radius=(0.5, 1.0, 2.0, 4.0),
                      num_samples=(8, 8, 8, 8),
                      sa_channels=((8, 8), (16, 16), (16, 16), (16, 16)),
                      fp_channels=((16, 16), (16, 16), (16, 16))))
    model = MODELS.build(seg_cfg)
    rng = np.random.default_rng(0)
    B, P = 2, 128
    batch = dict(points=jnp.asarray(
        rng.normal(size=(B, P, 4)).astype(np.float32) * 5),
        points_mask=jnp.ones((B, P), bool),
        pts_semantic_mask=jnp.asarray(rng.integers(0, 6, (B, P))))
    variables = model.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = model.apply(variables, batch, mode='loss', train=True,
                            mutable=['batch_stats'])
    assert np.isfinite(float(losses['loss_sem_seg']))
    pred = model.apply(variables, batch, mode='predict')
    S = pred['pts_semantic_mask'].shape[1]

    tta = MODELS.build(dict(type='Seg3DTTAModel', segmentor=seg_cfg))
    tv = tta.init(jax.random.PRNGKey(0), batch)
    out = tta.apply(tv, batch)
    assert out['pts_semantic_mask'].shape == (B, S)
    assert np.isfinite(np.asarray(out['logits'])).all()


def test_nostem_regnet_and_multibackbone():
    from tpu_bev3d.registry import MODELS
    m = MODELS.build(dict(type='NoStemRegNet', in_channels=16,
                          stage_channels=[16, 32], stage_blocks=[1, 2],
                          stage_strides=[2, 2], out_indices=[0, 1]))
    x = jnp.zeros((1, 32, 32, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(v, x, mutable=['batch_stats'])
    assert outs[0].shape == (1, 16, 16, 16)
    assert outs[1].shape == (1, 8, 8, 32)

    mb = MODELS.build(dict(
        type='MultiBackbone', num_streams=2, aggregation_channels=24,
        backbone=dict(type='SECOND', in_channels=16,
                      out_channels=[16, 32], layer_nums=[1, 1],
                      layer_strides=[2, 2])))
    v = mb.init(jax.random.PRNGKey(0), x)
    outs, _ = mb.apply(v, x, mutable=['batch_stats'])
    assert outs[0].shape[-1] == 24     # concat 32 -> agg 24
    assert outs[1].shape[-1] == 24


def test_spvcnn_backbone():
    from tpu_bev3d.registry import MODELS
    from tpu_bev3d.ops.sparse_conv import SparseTensor
    rng = np.random.default_rng(0)
    V, P = 64, 96
    coords = np.stack([np.zeros(V), rng.integers(0, 16, V),
                       rng.integers(0, 32, V),
                       rng.integers(0, 32, V)], 1).astype(np.int32)
    coords[50:] = -1
    feats = rng.normal(size=(V, 4)).astype(np.float32)
    st = SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                      (16, 32, 32), 1)
    pc = np.stack([np.zeros(P), rng.integers(0, 16, P),
                   rng.integers(0, 32, P),
                   rng.integers(0, 32, P)], 1).astype(np.int32)
    pf = rng.normal(size=(P, 4)).astype(np.float32)
    pv = np.ones(P, bool)
    m = MODELS.build(dict(type='SPVCNNBackbone', in_channels=4,
                          base_channels=8, encoder_channels=[8, 16],
                          decoder_channels=[16, 16],
                          point_channels=[16]))
    v = m.init(jax.random.PRNGKey(0), st, jnp.asarray(pc),
               jnp.asarray(pf), jnp.asarray(pv))
    (st_out, pfeat), _ = m.apply(v, st, jnp.asarray(pc),
                                 jnp.asarray(pf), jnp.asarray(pv),
                                 mutable=['batch_stats'])
    assert pfeat.shape == (P, 16)
    assert np.isfinite(np.asarray(pfeat)).all()


def test_paconv_sa_module():
    from tpu_bev3d.models.layers.pointnet_modules import (PAConv,
                                                          PAConvSAModule)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    mask = jnp.ones(64, bool)
    m = PAConvSAModule(num_point=16, radius=1.0, num_sample=8,
                       mlp_channels=[16, 16], num_kernels=4)
    v = m.init(jax.random.PRNGKey(0), xyz, feats, mask)
    nx, nf, nm, _ = m.apply(v, xyz, feats, mask)
    assert nf.shape == (16, 16)
    assert np.isfinite(np.asarray(nf)).all()
    # correlation regularizer is finite and positive for random banks
    wb = v['params']['paconv0']['weight_bank']
    r = PAConv.corr_loss(wb)
    assert float(r) > 0 and np.isfinite(float(r))


def test_pointnet2_paconv_backbone():
    """sa_module='paconv' routes SA through PAConvSAModule (configs/paconv)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_bev3d.registry import MODELS
    m = MODELS.build(dict(
        type='PointNet2SASSG', in_channels=4, sa_module='paconv',
        paconv_kernels=4, num_points=(32, 16), radius=(0.5, 1.0),
        num_samples=(8, 8), sa_channels=((8, 8), (16, 16)),
        fp_channels=((16, 16),)))
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(2, 64, 4)).astype(np.float32))
    mask = jnp.ones((2, 64), bool)
    v = m.init(jax.random.PRNGKey(0), pts, mask)
    flat = jax.tree_util.tree_flatten_with_path(v['params'])[0]
    assert any('paconv' in str(path) for path, _ in flat)
    out, _ = m.apply(v, pts, mask, mutable=['batch_stats'])
    assert out['fp_features'].shape == (2, 32, 16)
    assert np.isfinite(np.asarray(out['fp_features'])).all()


def test_fpn_and_cpfpn():
    """Additive FPN (mmdet semantics) + checkpointed CPFPN variant."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_bev3d.registry import MODELS
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(2, 16, 16, 8))
                         .astype(np.float32)),
             jnp.asarray(rng.normal(size=(2, 8, 8, 16))
                         .astype(np.float32)),
             jnp.asarray(rng.normal(size=(2, 4, 4, 32))
                         .astype(np.float32))]
    fpn = MODELS.build(dict(type='FPN', in_channels=[8, 16, 32],
                            out_channels=8, num_outs=4))
    v = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(v, feats)
    assert [o.shape for o in outs] == [(2, 16, 16, 8), (2, 8, 8, 8),
                                       (2, 4, 4, 8), (2, 2, 2, 8)]
    cp = MODELS.build(dict(type='CPFPN', in_channels=[8, 16, 32],
                           out_channels=8, num_outs=3))
    v2 = cp.init(jax.random.PRNGKey(0), feats, train=True)
    outs2 = cp.apply(v2, feats, train=True)
    assert np.isfinite(np.asarray(outs2[0])).all()


def test_iou_neg_piecewise_sampler():
    """Fixed-shape RoI sampler: positive quota by IoU, negatives filled
    from piecewise IoU intervals (Part-A2 recipe)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_bev3d.models.task_modules import IoUNegPiecewiseSampler

    s = IoUNegPiecewiseSampler(num=32, pos_fraction=0.5,
                               neg_piece_fractions=[0.8, 0.2],
                               neg_iou_piece_thrs=[0.55, 0.1],
                               pos_iou_thr=0.55)
    rng = np.random.default_rng(0)
    ious = jnp.asarray(rng.uniform(0, 1, (300,)).astype(np.float32))
    idx, is_pos, valid = s.sample(jax.random.PRNGKey(0), ious)
    assert idx.shape == (32,) and is_pos.shape == (32,)
    iou_sel = np.asarray(ious)[np.asarray(idx)]
    v = np.asarray(valid)
    p = np.asarray(is_pos)
    # every valid positive slot has IoU >= thr; negatives below
    assert np.all(iou_sel[p] >= 0.55)
    assert np.all(iou_sel[v & ~p] < 0.55)
    assert p.sum() == 16                      # pos quota filled
    # per-piece fill: thr[i] is the UPPER bound of piece i, so with
    # uniform IoUs both pieces have plenty of candidates and all 16 neg
    # slots must be valid — piece 0 drawn from [0.1, 0.55), piece 1 (the
    # last 3 slots by quota rounding) from [0, 0.55) after back-fill.
    neg_sel = iou_sel[16:]
    assert v[16:].all(), 'all neg slots should fill (400+ candidates)'
    assert np.all(neg_sel < 0.55)
    # piece 0 quota = round(16*0.8) = 13 slots strictly in [0.1, 0.55)
    assert np.all(neg_sel[:13] >= 0.1)
    # piece 1 covers [0, 0.1): at least one low-IoU negative sampled
    assert np.any(neg_sel[13:] < 0.1)
    # scarce positives -> invalid pos slots flagged
    ious2 = jnp.asarray(np.full((300,), 0.2, np.float32))
    _, is_pos2, valid2 = s.sample(jax.random.PRNGKey(1), ious2)
    assert np.asarray(is_pos2).sum() == 0
    assert np.asarray(valid2)[:16].sum() == 0  # no positives available
    # back-fill: a piece with zero candidates still fills from the pool
    _, _, valid3 = s.sample(jax.random.PRNGKey(2), ious2)
    assert np.asarray(valid3)[16:].all()  # all IoU=0.2 -> piece 0 + fill


def test_mono_coders_match_heads():
    """SMOKE/MonoFlex/FCOS3D coders (task-module API) share the heads'
    decode implementations exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_bev3d.registry import MODELS, TASK_UTILS
    from tpu_bev3d.models.dense_heads.smoke_head import SMOKEMono3DHead
    from tpu_bev3d.models.dense_heads.fcos_mono3d_head import \
        FCOSMono3DHead

    rng = np.random.default_rng(0)
    cam2img = jnp.asarray(np.tile(np.array(
        [[100., 0, 64], [0, 100., 48], [0, 0, 1]], np.float32),
        (2, 1, 1)))

    # SMOKE
    out = dict(heatmap=jnp.asarray(rng.normal(size=(2, 12, 16, 3))
                                   .astype(np.float32)),
               reg=jnp.asarray(rng.normal(size=(2, 12, 16, 8))
                               .astype(np.float32)))
    head = SMOKEMono3DHead(max_num=8)
    coder = TASK_UTILS.get('SMOKECoder')(max_num=8)
    b1, s1, c1 = head._decode_common(out, cam2img)
    b2, s2, c2 = coder.decode(out, cam2img)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    # MonoFlex
    from tpu_bev3d.models.dense_heads.monoflex_head import (MonoFlexHead,
                                                            REG_CH)
    outm = dict(heatmap=jnp.asarray(rng.normal(size=(2, 12, 16, 3))
                                    .astype(np.float32)),
                reg=jnp.asarray(rng.normal(size=(2, 12, 16, REG_CH))
                                .astype(np.float32)))
    mh = MonoFlexHead(max_num=8)
    mc = TASK_UTILS.get('MonoFlexCoder')(max_num=8)
    b1, s1, c1 = mh._decode_common(outm, cam2img)
    b2, s2, c2 = mc.decode(outm, cam2img)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    # FCOS3D level decode
    outf = dict(cls=jnp.asarray(rng.normal(size=(2, 8, 12, 10))
                                .astype(np.float32)),
                centerness=jnp.asarray(rng.normal(size=(2, 8, 12, 1))
                                       .astype(np.float32)),
                reg=jnp.asarray(rng.normal(size=(2, 8, 12, 8))
                                .astype(np.float32)))
    fh = FCOSMono3DHead()
    fc = TASK_UTILS.get('FCOS3DBBoxCoder')()
    b1, s1 = fh._decode_level(outf, 8, cam2img)
    b2, s2 = fc.decode_level(outf, 8, cam2img)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_yolox2d_detector_nuimages_family():
    """The nuimages-family 2D detector (configs/nuimages): backbone →
    FPN → YOLOXHead2D; loss finite with SimOTA targets, predict returns
    top-k 2D boxes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_bev3d.registry import MODELS

    m = MODELS.build(dict(
        type='YOLOX2DDetector',
        backbone=dict(type='SwinTransformer', embed_dims=16,
                      depths=[2, 2], num_heads=[2, 2], window_size=4,
                      out_indices=[0, 1]),
        neck=dict(type='FPN', in_channels=[16, 32], out_channels=16,
                  num_outs=2),
        bbox_head=dict(type='YOLOXHead2D', num_classes=10, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       strides=[4, 8]),
        num_pred=16))
    rng = np.random.default_rng(0)
    B, G = 2, 4
    imgs = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)).astype(np.float32))
    x0 = rng.uniform(0, 60, (B, G)); y0 = rng.uniform(0, 40, (B, G))
    gtb = jnp.asarray(np.stack([x0, y0, x0 + 16, y0 + 12], -1)
                      .astype(np.float32))
    batch = dict(imgs=imgs, gt_bboxes_2d=gtb,
                 gt_labels_2d=jnp.asarray(rng.integers(0, 10, (B, G))),
                 gt_mask_2d=jnp.ones((B, G), bool))
    v = m.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = m.apply(v, batch, mode='loss', train=True,
                        mutable=['batch_stats'])
    assert all(np.isfinite(float(x)) for x in losses.values()), losses
    preds = m.apply(v, batch, mode='predict')
    assert preds['bboxes'].shape == (B, 16, 4)
    assert np.isfinite(np.asarray(preds['bboxes'])).all()


def test_yolox2d_mask_branch():
    """YOLACT-style prototype mask branch (nuImages instance-mask parity,
    ref configs/nuimages mask-rcnn family): enc_loss_mask is finite and
    has nonzero grads into the proto net; predict emits per-detection
    masks cropped to their boxes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_bev3d.registry import MODELS

    m = MODELS.build(dict(
        type='YOLOX2DDetector',
        backbone=dict(type='SwinTransformer', embed_dims=16,
                      depths=[2, 2], num_heads=[2, 2], window_size=4,
                      out_indices=[0, 1]),
        neck=dict(type='FPN', in_channels=[16, 32], out_channels=16,
                  num_outs=2),
        bbox_head=dict(type='YOLOXHead2D', num_classes=10, in_channels=16,
                       feat_channels=16, stacked_convs=1,
                       strides=[4, 8], mask_channels=8, mask_pos_topk=8),
        num_pred=16))
    rng = np.random.default_rng(0)
    B, G = 2, 4
    imgs = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)).astype(np.float32))
    x0 = rng.uniform(0, 60, (B, G)); y0 = rng.uniform(0, 40, (B, G))
    gtb = np.stack([x0, y0, x0 + 16, y0 + 12], -1).astype(np.float32)
    # GT masks: box interiors at image resolution
    gm = np.zeros((B, G, 64, 96), np.uint8)
    for b in range(B):
        for g in range(G):
            x1, y1, x2, y2 = gtb[b, g].astype(int)
            gm[b, g, y1:y2, x1:x2] = 1
    batch = dict(imgs=imgs, gt_bboxes_2d=jnp.asarray(gtb),
                 gt_labels_2d=jnp.asarray(rng.integers(0, 10, (B, G))),
                 gt_mask_2d=jnp.ones((B, G), bool),
                 gt_masks_2d=jnp.asarray(gm))
    v = m.init(jax.random.PRNGKey(0), batch, mode='tensor')
    losses, _ = m.apply(v, batch, mode='loss', train=True,
                        mutable=['batch_stats'])
    assert 'enc_loss_mask' in losses
    assert np.isfinite(float(losses['enc_loss_mask']))

    def total(params):
        ls, _ = m.apply({'params': params, **{k: v[k] for k in v
                                              if k != 'params'}},
                        batch, mode='loss', train=True,
                        mutable=['batch_stats'])
        return ls['enc_loss_mask']
    g = jax.grad(total)(v['params'])
    pg = jax.tree_util.tree_leaves(
        {k: x for k, x in g['_bbox_head'].items() if 'proto' in k})
    assert any(float(jnp.abs(x).max()) > 0 for x in pg)

    preds = m.apply(v, batch, mode='predict')
    assert preds['masks'].shape[:2] == (B, 16)
    mk = np.asarray(preds['masks'])
    assert np.isfinite(mk).all() and mk.min() >= 0 and mk.max() <= 1
    # crop semantics: mask is zero outside its decoded box
    boxes = np.asarray(preds['bboxes'])
    Hp, Wp = mk.shape[2:]
    s = 4.0  # finest stride
    ys = (np.arange(Hp) + 0.5) * s
    xs = (np.arange(Wp) + 0.5) * s
    for b in range(B):
        for q in range(0, 16, 5):
            x1, y1, x2, y2 = boxes[b, q]
            outside = ((xs[None, :] < x1) | (xs[None, :] > x2)
                       | (ys[:, None] < y1) | (ys[:, None] > y2))
            assert mk[b, q][outside].max() == 0


def test_pack_inputs_mask_size():
    """Pack3DDetInputs(mask_size) decodes per-ann RLEs to fixed-shape
    binary instance masks."""
    import numpy as np
    from tpu_bev3d.datasets.transforms.formating import Pack3DDetInputs
    from tpu_bev3d.utils.rle import mask_encode
    m0 = np.zeros((90, 160), np.uint8)
    m0[10:50, 40:120] = 1
    anns = [[dict(bbox=[40, 10, 120, 50], center2d=[80, 30],
                  bbox_label=1, segmentation=mask_encode(m0))],
            []]
    pack = Pack3DDetInputs(max_gt_2d=3, mask_size=(45, 80))
    out = pack(dict(anns_2d=anns, imgs=np.zeros((2, 90, 160, 3),
                                                np.float32)))
    gm = out['gt_masks_2d']
    assert gm.shape == (2, 3, 45, 80)
    assert gm[0, 0, 15, 40] == 1 and gm[0, 0, 0, 0] == 0
    assert gm[1].sum() == 0 and gm[0, 1].sum() == 0
