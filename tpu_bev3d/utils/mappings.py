"""Model-specific torch→flax name mapping tables.

The reference's checkpoints use mmdet3d module naming; these builders emit
the {torch_name|converter: flax_path} tables consumed by
``utils.torch_convert.convert_torch_checkpoint``. Layer counts are read
from the model config so the tables stay in sync with the built model.
"""
from __future__ import annotations

from typing import Dict, Tuple


def _convbn(torch_conv: str, torch_bn: str, flax_prefix: Tuple[str, ...],
            kind: str = 'conv2d') -> Dict[str, Tuple[str, ...]]:
    """ConvBNAct/DeconvBNAct mapping: separate torch conv/bn module names."""
    conv_mod = 'ConvTranspose_0' if kind == 'deconv2d' else 'Conv_0'
    return {
        f'{torch_conv}.weight|{kind}':
            ('params',) + flax_prefix + (conv_mod, 'kernel'),
        f'{torch_bn}.weight':
            ('params',) + flax_prefix + ('BatchNorm_0', 'scale'),
        f'{torch_bn}.bias':
            ('params',) + flax_prefix + ('BatchNorm_0', 'bias'),
        f'{torch_bn}.running_mean':
            ('batch_stats',) + flax_prefix + ('BatchNorm_0', 'mean'),
        f'{torch_bn}.running_var':
            ('batch_stats',) + flax_prefix + ('BatchNorm_0', 'var'),
    }


def _ln(torch_name: str, flax_path: Tuple[str, ...]) -> Dict[str, Tuple[str, ...]]:
    return {f'{torch_name}.weight': ('params',) + flax_path + ('scale',),
            f'{torch_name}.bias': ('params',) + flax_path + ('bias',)}


def _linear(torch_name: str, flax_path: Tuple[str, ...],
            bias: bool = True) -> Dict[str, Tuple[str, ...]]:
    m = {f'{torch_name}.weight|linear':
         ('params',) + flax_path + ('kernel',)}
    if bias:
        m[f'{torch_name}.bias'] = ('params',) + flax_path + ('bias',)
    return m


def swin_mapping(prefix: str = 'img_backbone.',
                 flax_prefix: Tuple[str, ...] = ('_img_backbone',),
                 depths=(2, 2, 6, 2),
                 out_indices=(1, 2, 3),
                 window_size: int = 7) -> Dict[str, Tuple[str, ...]]:
    """mmdet SwinTransformer → models/backbones/swin.py.

    Torch layout: patch_embed.projection/.norm, stages.S.blocks.B.{norm1,
    attn.w_msa.{relative_position_bias_table,qkv,proj},norm2,
    ffn.layers.0.0,ffn.layers.1}, stages.S.downsample.{norm,reduction},
    norm{i} (mmdet swin.py; BEVFusion config projects/BEVFusion/configs/
    nuscenes/bevfusion_lidar-cam_*.py:16-35).
    """
    m: Dict[str, Tuple[str, ...]] = {}
    P, F = prefix, flax_prefix
    m[f'{P}patch_embed.projection.weight|conv2d'] = \
        ('params',) + F + ('patch_embed', 'kernel')
    m[f'{P}patch_embed.projection.bias'] = \
        ('params',) + F + ('patch_embed', 'bias')
    m.update(_ln(f'{P}patch_embed.norm', F + ('patch_norm',)))
    for s, depth in enumerate(depths):
        for b in range(depth):
            tb = f'{P}stages.{s}.blocks.{b}'
            fb = F + (f'stage{s}_block{b}',)
            m.update(_ln(f'{tb}.norm1', fb + ('LayerNorm_0',)))
            # |relpos<w>: bicubic-resamples the (2w'-1)² bias table when
            # the target window differs (e.g. the TPU-fast window-8
            # flagship importing window-7 torch checkpoints)
            m[f'{tb}.attn.w_msa.relative_position_bias_table'
              f'|relpos{window_size}'] = \
                ('params',) + fb + ('WindowAttention_0', 'rel_pos_bias')
            m.update(_linear(f'{tb}.attn.w_msa.qkv',
                             fb + ('WindowAttention_0', 'qkv')))
            m.update(_linear(f'{tb}.attn.w_msa.proj',
                             fb + ('WindowAttention_0', 'proj')))
            m.update(_ln(f'{tb}.norm2', fb + ('LayerNorm_1',)))
            m.update(_linear(f'{tb}.ffn.layers.0.0', fb + ('Dense_0',)))
            m.update(_linear(f'{tb}.ffn.layers.1', fb + ('Dense_1',)))
        if s < len(depths) - 1:
            m.update(_ln(f'{P}stages.{s}.downsample.norm',
                         F + (f'merge{s}', 'LayerNorm_0')))
            m.update(_linear(f'{P}stages.{s}.downsample.reduction',
                             F + (f'merge{s}', 'Dense_0'), bias=False))
    for i in out_indices:
        m.update(_ln(f'{P}norm{i}', F + (f'out_norm{i}',)))
    return m


def second_mapping(layer_nums, prefix: str = 'backbone.',
                   flax_prefix: Tuple[str, ...] = ('_backbone',)
                   ) -> Dict[str, Tuple[str, ...]]:
    """SECOND backbone: blocks.S = Sequential(Conv,BN,ReLU ×(n+1))
    (ref mmdet3d/models/backbones/second.py)."""
    m: Dict[str, Tuple[str, ...]] = {}
    for s, n in enumerate(layer_nums):
        for j in range(n + 1):
            m.update(_convbn(f'{prefix}blocks.{s}.{3 * j}',
                             f'{prefix}blocks.{s}.{3 * j + 1}',
                             flax_prefix + (f'block_{s}_{j}',)))
    return m


def secondfpn_mapping(upsample_strides, prefix: str = 'neck.',
                      flax_prefix: Tuple[str, ...] = ('_neck',)
                      ) -> Dict[str, Tuple[str, ...]]:
    """SECONDFPN: deblocks.S = Sequential(ConvTranspose/Conv, BN, ReLU)."""
    m: Dict[str, Tuple[str, ...]] = {}
    for s, st in enumerate(upsample_strides):
        kind = 'deconv2d' if st >= 1 else 'conv2d'
        m.update(_convbn(f'{prefix}deblocks.{s}.0', f'{prefix}deblocks.{s}.1',
                         flax_prefix + (f'deblock_{s}',), kind=kind))
    return m


def _seq_convbn(torch_seq: str, idx_conv: int, flax_path: Tuple[str, ...],
                bias: bool = True) -> Dict[str, Tuple[str, ...]]:
    """One Conv2d+BN pair inside a torch nn.Sequential (indices i, i+1)
    mapped onto a flax ConvBNAct subtree."""
    m = {f'{torch_seq}.{idx_conv}.weight|conv2d':
         ('params',) + flax_path + ('Conv_0', 'kernel')}
    if bias:
        m[f'{torch_seq}.{idx_conv}.bias'] = \
            ('params',) + flax_path + ('Conv_0', 'bias')
    b = idx_conv + 1
    m.update({
        f'{torch_seq}.{b}.weight':
            ('params',) + flax_path + ('BatchNorm_0', 'scale'),
        f'{torch_seq}.{b}.bias':
            ('params',) + flax_path + ('BatchNorm_0', 'bias'),
        f'{torch_seq}.{b}.running_mean':
            ('batch_stats',) + flax_path + ('BatchNorm_0', 'mean'),
        f'{torch_seq}.{b}.running_var':
            ('batch_stats',) + flax_path + ('BatchNorm_0', 'var'),
    })
    return m


def lss_fpn_mapping(num_ins: int = 3, prefix: str = 'img_neck.',
                    flax_prefix: Tuple[str, ...] = ('_img_neck',)
                    ) -> Dict[str, Tuple[str, ...]]:
    """GeneralizedLSSFPN: lateral_convs.I / fpn_convs.I ConvModules
    (ref projects/BEVFusion/bevfusion/bevfusion_necks.py:40-70)."""
    from .torch_convert import auto_map_convbn
    m: Dict[str, Tuple[str, ...]] = {}
    for i in range(num_ins - 1):
        m.update(auto_map_convbn(f'{prefix}lateral_convs.{i}',
                                 flax_prefix + (f'lateral_{i}',)))
        m.update(auto_map_convbn(f'{prefix}fpn_convs.{i}',
                                 flax_prefix + (f'fpn_{i}',)))
    return m


def depth_lss_mapping(prefix: str = 'view_transform.',
                      flax_prefix: Tuple[str, ...] = ('_view_transform',),
                      downsample: int = 2) -> Dict[str, Tuple[str, ...]]:
    """DepthLSSTransform sequentials (ref depth_lss.py:581-620):
    dtransform convs at indices 0/3/6 (bias=True), depthnet convs at
    0/3 + final 1×1 at 6, downsample convs at 0/3/6 (bias=False)."""
    P, F = prefix, flax_prefix
    m: Dict[str, Tuple[str, ...]] = {}
    for i, name in zip((0, 3, 6), ('dt0', 'dt1', 'dt2')):
        m.update(_seq_convbn(f'{P}dtransform', i, F + (name,), bias=True))
    for i, name in zip((0, 3), ('dn0', 'dn1')):
        m.update(_seq_convbn(f'{P}depthnet', i, F + (name,), bias=True))
    m[f'{P}depthnet.6.weight|conv2d'] = ('params',) + F + ('dn_out', 'kernel')
    m[f'{P}depthnet.6.bias'] = ('params',) + F + ('dn_out', 'bias')
    if downsample > 1:
        for i, name in zip((0, 3, 6),
                           ('down_conv1', 'down_conv2', 'down_conv3')):
            m.update(_seq_convbn(f'{P}downsample', i, F + (name,),
                                 bias=False))
    return m


def convfuser_mapping(prefix: str = 'fuser.',
                      flax_prefix: Tuple[str, ...] = ('_fuser',)
                      ) -> Dict[str, Tuple[str, ...]]:
    """ConvFuser = Sequential(Conv2d bias=False, BN, ReLU)
    (ref bevfusion.py ConvFuser). Torch keys are bare indices
    ('fuser.0.weight', or '0.weight' with no prefix)."""
    base = prefix.rstrip('.')
    m = _seq_convbn(base if base else '', 0,
                    flax_prefix + ('ConvBNAct_0',), bias=False)
    if not base:  # strip the leading '.' produced by an empty prefix
        m = {k.lstrip('.'): v for k, v in m.items()}
    return m


def _mha(torch_name: str, flax_path: Tuple[str, ...]
         ) -> Dict[str, Tuple[str, ...]]:
    """torch nn.MultiheadAttention → flax MultiHeadDotProductAttention
    (packed in_proj split into query/key/value DenseGenerals)."""
    m: Dict[str, Tuple[str, ...]] = {}
    for part, tag in (('query', 'mha_q'), ('key', 'mha_k'),
                      ('value', 'mha_v')):
        m[f'{torch_name}.in_proj_weight|{tag}'] = \
            ('params',) + flax_path + (part, 'kernel')
        m[f'{torch_name}.in_proj_bias|{tag}'] = \
            ('params',) + flax_path + (part, 'bias')
    m[f'{torch_name}.out_proj.weight|mha_out'] = \
        ('params',) + flax_path + ('out', 'kernel')
    m[f'{torch_name}.out_proj.bias'] = \
        ('params',) + flax_path + ('out', 'bias')
    return m


def _bn1d(torch_name: str, flax_path: Tuple[str, ...]
          ) -> Dict[str, Tuple[str, ...]]:
    return {
        f'{torch_name}.weight': ('params',) + flax_path + ('scale',),
        f'{torch_name}.bias': ('params',) + flax_path + ('bias',),
        f'{torch_name}.running_mean':
            ('batch_stats',) + flax_path + ('mean',),
        f'{torch_name}.running_var':
            ('batch_stats',) + flax_path + ('var',),
    }


def _posembed(torch_name: str, flax_path: Tuple[str, ...]
              ) -> Dict[str, Tuple[str, ...]]:
    """PositionEncodingLearned: Sequential(Conv1d, BN1d, ReLU, Conv1d)
    (ref transformer.py:7-22)."""
    m: Dict[str, Tuple[str, ...]] = {}
    p = f'{torch_name}.position_embedding_head'
    m[f'{p}.0.weight|conv1d'] = ('params',) + flax_path + ('Dense_0', 'kernel')
    m[f'{p}.0.bias'] = ('params',) + flax_path + ('Dense_0', 'bias')
    m.update(_bn1d(f'{p}.1', flax_path + ('BatchNorm_0',)))
    m[f'{p}.3.weight|conv1d'] = ('params',) + flax_path + ('Dense_1', 'kernel')
    m[f'{p}.3.bias'] = ('params',) + flax_path + ('Dense_1', 'bias')
    return m


def transfusion_head_mapping(prefix: str = 'bbox_head.',
                             flax_prefix: Tuple[str, ...] = ('_bbox_head',),
                             heads=('center', 'height', 'dim', 'rot', 'vel',
                                    'heatmap')) -> Dict[str, Tuple[str, ...]]:
    """BEVFusion TransFusionHead (ref bevfusion_head.py:41-160 +
    transformer.py TransformerDecoderLayer + SeparateHead):
    shared_conv / heatmap_head.{0,1} / class_encoding / decoder.0.* /
    prediction_heads.0.<key>.{0(ConvModule),1(Conv1d)}."""
    P, F = prefix, flax_prefix
    m: Dict[str, Tuple[str, ...]] = {}
    m[f'{P}shared_conv.weight|conv2d'] = \
        ('params',) + F + ('shared_conv', 'kernel')
    m[f'{P}shared_conv.bias'] = ('params',) + F + ('shared_conv', 'bias')
    from .torch_convert import auto_map_convbn
    m.update(auto_map_convbn(f'{P}heatmap_head.0', F + ('heatmap_conv',)))
    m[f'{P}heatmap_head.1.weight|conv2d'] = \
        ('params',) + F + ('heatmap_out', 'kernel')
    m[f'{P}heatmap_head.1.bias'] = \
        ('params',) + F + ('heatmap_out', 'bias')
    m[f'{P}class_encoding.weight|conv1d'] = \
        ('params',) + F + ('class_encoding', 'kernel')
    m[f'{P}class_encoding.bias'] = \
        ('params',) + F + ('class_encoding', 'bias')
    # decoder layer 0
    d = f'{P}decoder.0'
    Fd = F + ('decoder',)
    m.update(_posembed(f'{d}.self_posembed', Fd + ('q_posenc',)))
    m.update(_posembed(f'{d}.cross_posembed', Fd + ('k_posenc',)))
    m.update(_mha(f'{d}.self_attn.attn', Fd + ('self_attn',)))
    m.update(_mha(f'{d}.cross_attn.attn', Fd + ('cross_attn',)))
    for i in range(3):
        m.update(_ln(f'{d}.norms.{i}', Fd + (f'LayerNorm_{i}',)))
    m.update(_linear(f'{d}.ffn.layers.0.0', Fd + ('Dense_0',)))
    m.update(_linear(f'{d}.ffn.layers.1', Fd + ('Dense_1',)))
    # separate prediction heads
    for k in heads:
        ph = f'{P}prediction_heads.0.{k}'
        Fp = F + ('prediction_head',)
        m[f'{ph}.0.conv.weight|conv1d'] = \
            ('params',) + Fp + (f'{k}_fc0', 'kernel')
        m.update(_bn1d(f'{ph}.0.bn', Fp + (f'{k}_bn0',)))
        m[f'{ph}.1.weight|conv1d'] = \
            ('params',) + Fp + (f'{k}_out', 'kernel')
        m[f'{ph}.1.bias'] = ('params',) + Fp + (f'{k}_out', 'bias')
    return m


def _spconv_bn(torch_seq: str, flax_path: Tuple[str, ...]
               ) -> Dict[str, Tuple[str, ...]]:
    """make_sparse_convmodule block: SparseSequential(conv, BN1d, ReLU) →
    SparseConvLayer (kernel + MaskedBatchNorm_0)."""
    return {
        f'{torch_seq}.0.weight|spconv':
            ('params',) + flax_path + ('kernel',),
        f'{torch_seq}.1.weight':
            ('params',) + flax_path + ('MaskedBatchNorm_0', 'scale'),
        f'{torch_seq}.1.bias':
            ('params',) + flax_path + ('MaskedBatchNorm_0', 'bias'),
        f'{torch_seq}.1.running_mean':
            ('batch_stats',) + flax_path + ('MaskedBatchNorm_0', 'mean'),
        f'{torch_seq}.1.running_var':
            ('batch_stats',) + flax_path + ('MaskedBatchNorm_0', 'var'),
    }


def sparse_encoder_mapping(encoder_channels,
                           prefix: str = 'pts_middle_encoder.',
                           flax_prefix: Tuple[str, ...] = (
                               '_middle_encoder',)
                           ) -> Dict[str, Tuple[str, ...]]:
    """(BEVFusion)SparseEncoder: conv_input / encoder_layers.
    encoder_layer{i+1}.{j} / conv_out (ref mmdet3d sparse_encoder.py
    make_encoder_layers + projects/BEVFusion/bevfusion/sparse_encoder.py;
    weight layout shim ref write_spconv2.py)."""
    P, F = prefix, flax_prefix
    m = dict(_spconv_bn(f'{P}conv_input', F + ('conv_input',)))
    for i, stage in enumerate(encoder_channels):
        for j in range(len(stage)):
            m.update(_spconv_bn(
                f'{P}encoder_layers.encoder_layer{i + 1}.{j}',
                F + (f'encoder_{i}_{j}',)))
    m.update(_spconv_bn(f'{P}conv_out', F + ('conv_out',)))
    return m


def bevfusion_mapping(model_cfg: dict) -> Dict[str, Tuple[str, ...]]:
    """Composed mapping for the full BEVFusion L+C flagship chain
    (every block's table is individually forward-verified in
    tests/test_utils/test_flagship_parity.py)."""
    m: Dict[str, Tuple[str, ...]] = {}
    m.update(swin_mapping(
        window_size=model_cfg['img_backbone'].get('window_size', 7)))
    m.update(lss_fpn_mapping(
        num_ins=len(model_cfg['img_neck']['in_channels'])))
    m.update(depth_lss_mapping(
        downsample=model_cfg['view_transform'].get('downsample', 2)))
    m.update(convfuser_mapping())
    m.update(sparse_encoder_mapping(
        model_cfg['middle_encoder'].get(
            'encoder_channels',
            ((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))),
        prefix='pts_middle_encoder.'))
    m.update(second_mapping(list(model_cfg['backbone']['layer_nums']),
                            prefix='pts_backbone.'))
    m.update(secondfpn_mapping(
        list(model_cfg['neck']['upsample_strides']), prefix='pts_neck.'))
    m.update(transfusion_head_mapping())
    return m


def anchor3d_head_mapping(prefix: str = 'bbox_head.',
                          flax_prefix: Tuple[str, ...] = ('_bbox_head',)
                          ) -> Dict[str, Tuple[str, ...]]:
    """Anchor3DHead 1×1 convs (ref mmdet3d/models/dense_heads/
    anchor3d_head.py:23 conv_cls/conv_reg/conv_dir_cls)."""
    m: Dict[str, Tuple[str, ...]] = {}
    for tname, fname in (('conv_cls', 'conv_cls'), ('conv_reg', 'conv_reg'),
                         ('conv_dir_cls', 'conv_dir')):
        m[f'{prefix}{tname}.weight|conv2d'] = \
            ('params',) + flax_prefix + (fname, 'kernel')
        m[f'{prefix}{tname}.bias'] = \
            ('params',) + flax_prefix + (fname, 'bias')
    return m


def centerhead_mapping(head_cfg: dict, prefix: str = 'pts_bbox_head.',
                       flax_prefix: Tuple[str, ...] = ('_bbox_head',)
                       ) -> Dict[str, Tuple[str, ...]]:
    """CenterHead (ref mmdet3d/models/dense_heads/centerpoint_head.py:
    20-123 SeparateHead Sequentials `task_heads.{t}.{key}.{i}` — ConvModule
    conv/bn pairs then a plain final conv — plus :322 shared_conv
    ConvModule)."""
    from .torch_convert import auto_map_convbn
    P, F = prefix, flax_prefix
    m = dict(auto_map_convbn(f'{P}shared_conv', F + ('shared_conv',)))
    common = dict(head_cfg.get('common_heads') or {
        'reg': (2, 2), 'height': (1, 2), 'dim': (3, 2), 'rot': (2, 2),
        **({'vel': (2, 2)} if head_cfg.get('with_velocity', True) else {})})
    for t, task in enumerate(head_cfg['tasks']):
        heads = {**{k: tuple(v) for k, v in common.items()},
                 'heatmap': (len(task['class_names']), 2)}
        Ft = F + (f'task_{t}',)
        for name, (_, num_conv) in heads.items():
            seq = f'{P}task_heads.{t}.{name}'
            for i in range(num_conv - 1):
                m.update(auto_map_convbn(f'{seq}.{i}',
                                         Ft + (f'{name}_conv{i}',)))
            m[f'{seq}.{num_conv - 1}.weight|conv2d'] = \
                ('params',) + Ft + (f'{name}_out', 'kernel')
            m[f'{seq}.{num_conv - 1}.bias'] = \
                ('params',) + Ft + (f'{name}_out', 'bias')
    return m


_SECOND_ENC_CHANNELS = ((16, 16, 32), (32, 32, 64), (64, 64, 128),
                        (128, 128))


def centerpoint_mapping(model_cfg: dict) -> Dict[str, Tuple[str, ...]]:
    """CenterPoint voxel-variant (ref configs/centerpoint/centerpoint_
    voxel01_second_secfpn_*.py; the detector subclasses MVXTwoStageDetector
    so every torch key carries the pts_ prefix; pts_voxel_encoder is the
    paramless HardSimpleVFE)."""
    m: Dict[str, Tuple[str, ...]] = {}
    m.update(sparse_encoder_mapping(
        model_cfg['middle_encoder'].get('encoder_channels',
                                        _SECOND_ENC_CHANNELS),
        prefix='pts_middle_encoder.'))
    m.update(second_mapping(list(model_cfg['backbone']['layer_nums']),
                            prefix='pts_backbone.'))
    m.update(secondfpn_mapping(
        list(model_cfg['neck']['upsample_strides']), prefix='pts_neck.'))
    m.update(centerhead_mapping(model_cfg['bbox_head'],
                                prefix='pts_bbox_head.'))
    return m


def second_kitti_mapping(model_cfg: dict) -> Dict[str, Tuple[str, ...]]:
    """SECOND (VoxelNet shell, ref configs/second/second_hv_secfpn_
    8xb6-80e_kitti-3d-3class.py): paramless HardSimpleVFE + SparseEncoder
    + SECOND + SECONDFPN + Anchor3DHead, unprefixed torch keys."""
    m: Dict[str, Tuple[str, ...]] = {}
    m.update(sparse_encoder_mapping(
        model_cfg['middle_encoder'].get('encoder_channels',
                                        _SECOND_ENC_CHANNELS),
        prefix='middle_encoder.'))
    m.update(second_mapping(list(model_cfg['backbone']['layer_nums'])))
    m.update(secondfpn_mapping(list(model_cfg['neck']['upsample_strides'])))
    m.update(anchor3d_head_mapping())
    return m


def vovnetcp_mapping(backbone_cfg: dict, prefix: str = 'img_backbone.',
                     flax_prefix: Tuple[str, ...] = ('_img_backbone',)
                     ) -> Dict[str, Tuple[str, ...]]:
    """VoVNetCP (PETR/StreamPETR image backbone) — ref state-dict names
    from projects/PETR/petr/vovnetcp.py:346: OrderedDict'd conv names
    with slashes (``stem.stem_1/conv``), stages ``stage{S}.OSA{S}_{B}``
    with ``layers.{i}.OSA{S}_{B}_{i}/conv``, ``concat.*_concat/conv``,
    and ``ese.fc``. Parity-tested in
    tests/test_utils/test_vovnet_minkunet_import.py."""
    m: Dict[str, Tuple[str, ...]] = {}
    P, F = prefix, flax_prefix
    for i in range(3):
        m.update(_convbn(f'{P}stem.stem_{i + 1}/conv',
                         f'{P}stem.stem_{i + 1}/norm', F + (f'stem{i}',)))
    bps = list(backbone_cfg.get('block_per_stage', (1, 1, 2, 2)))
    lpb = int(backbone_cfg.get('layer_per_block', 5))
    for si, nb in enumerate(bps):
        sn = si + 2
        for bi in range(nb):
            mod = f'OSA{sn}_{bi + 1}'
            tp = f'{P}stage{sn}.{mod}.'
            fp = F + (f'stage{si}_osa{bi}',)
            for li in range(lpb):
                m.update(_convbn(f'{tp}layers.{li}.{mod}_{li}/conv',
                                 f'{tp}layers.{li}.{mod}_{li}/norm',
                                 fp + (f'conv{li}',)))
            m.update(_convbn(f'{tp}concat.{mod}_concat/conv',
                             f'{tp}concat.{mod}_concat/norm',
                             fp + ('concat_conv',)))
            m[f'{tp}ese.fc.weight|conv2d'] = \
                ('params',) + fp + ('ese', 'fc', 'kernel')
            m[f'{tp}ese.fc.bias'] = ('params',) + fp + ('ese', 'fc', 'bias')
    return m


def minkunet_mapping(model_cfg: dict, prefix: str = 'backbone.',
                     flax_prefix: Tuple[str, ...] = ('_backbone',)
                     ) -> Dict[str, Tuple[str, ...]]:
    """MinkUNet (torchsparse backend) — ref state-dict names from
    mmdet3d/models/backbones/minkunet_backbone.py:118-198 +
    layers/torchsparse_block.py: ``conv_input.{0,1}.net.{0=conv,1=bn}``,
    ``encoder.{i}.{0=down, j+1=block}``, ``decoder.{i}.{0=up,
    1.{j}=block}``; blocks carry ``net.{0,1,3,4}`` + optional
    ``downsample.{0,1}``; the head is ``decode_head.conv_seg`` (Linear).

    Kernel-order contract (documented assumption, torchsparse 2.x
    ``get_kernel_offsets``): odd-volume kernels enumerate z-outer/
    x-fastest — identical to ops/sparse_conv._offsets, so they
    pass through ('|raw'); even-volume kernels (the k2-s2 down/up convs)
    enumerate x-outer/z-fastest and permute ('|tsparse_even'). 1×1
    downsample kernels are stored [Cin, Cout] → Dense kernel directly.
    """
    m: Dict[str, Tuple[str, ...]] = {}
    P, F = prefix, flax_prefix
    b = model_cfg['backbone']
    base = int(b.get('base_channels', 32))
    enc = [base] + [int(c) for c in b['encoder_channels']]
    dec = [enc[-1]] + [int(c) for c in b['decoder_channels']]
    eb = [int(x) for x in b.get('encoder_blocks', (2, 2, 2, 2))]
    db = [int(x) for x in b.get('decoder_blocks', (2, 2, 2, 2))]

    def conv_bn(tconv, tbn, fpath, kind='raw'):
        m[f'{tconv}.kernel|{kind}'] = ('params',) + fpath + ('kernel',)
        m[f'{tbn}.weight'] = \
            ('params',) + fpath + ('MaskedBatchNorm_0', 'scale')
        m[f'{tbn}.bias'] = \
            ('params',) + fpath + ('MaskedBatchNorm_0', 'bias')
        m[f'{tbn}.running_mean'] = \
            ('batch_stats',) + fpath + ('MaskedBatchNorm_0', 'mean')
        m[f'{tbn}.running_var'] = \
            ('batch_stats',) + fpath + ('MaskedBatchNorm_0', 'var')

    def block(tp, fp, cin, cout):
        conv_bn(f'{tp}.net.0', f'{tp}.net.1', fp + ('conv1',))
        conv_bn(f'{tp}.net.3', f'{tp}.net.4', fp + ('conv2',))
        if cin != cout:
            m[f'{tp}.downsample.0.kernel|raw'] = \
                ('params',) + fp + ('down', 'kernel')
            m[f'{tp}.downsample.1.weight'] = \
                ('params',) + fp + ('down_bn', 'scale')
            m[f'{tp}.downsample.1.bias'] = \
                ('params',) + fp + ('down_bn', 'bias')
            m[f'{tp}.downsample.1.running_mean'] = \
                ('batch_stats',) + fp + ('down_bn', 'mean')
            m[f'{tp}.downsample.1.running_var'] = \
                ('batch_stats',) + fp + ('down_bn', 'var')

    conv_bn(f'{P}conv_input.0.net.0', f'{P}conv_input.0.net.1',
            F + ('stem0',))
    conv_bn(f'{P}conv_input.1.net.0', f'{P}conv_input.1.net.1',
            F + ('stem1',))
    n = len(enc) - 1
    for i in range(n):
        conv_bn(f'{P}encoder.{i}.0.net.0', f'{P}encoder.{i}.0.net.1',
                F + (f'down{i}',), kind='tsparse_even')
        cin = enc[i]
        for j in range(eb[i]):
            block(f'{P}encoder.{i}.{j + 1}', F + (f'enc{i}_{j}',),
                  cin, enc[i + 1])
            cin = enc[i + 1]
    for i in range(n):
        conv_bn(f'{P}decoder.{i}.0.net.0', f'{P}decoder.{i}.0.net.1',
                F + (f'up{i}',), kind='tsparse_even')
        skip = enc[-2 - i]
        cin = dec[i + 1] + skip
        for j in range(db[i]):
            block(f'{P}decoder.{i}.1.{j}', F + (f'dec{i}_{j}',),
                  cin, dec[i + 1])
            cin = dec[i + 1]
    m['decode_head.conv_seg.weight|linear'] = ('params', '_cls', 'kernel')
    m['decode_head.conv_seg.bias'] = ('params', '_cls', 'bias')
    return m


def mapping_for_model(model_cfg: dict) -> Dict[str, Tuple[str, ...]]:
    """Dispatch a model config to its torch→flax mapping table (consumed by
    apis.init_model for .pth checkpoints and
    tools/model_converters/convert_mmdet3d_checkpoint.py)."""
    t = model_cfg['type']
    if t == 'BEVFusion':
        return bevfusion_mapping(model_cfg)
    if t == 'CenterPoint':
        return centerpoint_mapping(model_cfg)
    if t in ('VoxelNet', 'SECOND'):
        ve = model_cfg.get('voxel_encoder', {}).get('type', '')
        if 'Pillar' in ve:
            return pointpillars_mapping(model_cfg)
        return second_kitti_mapping(model_cfg)
    if t == 'PointPillars':
        return pointpillars_mapping(model_cfg)
    if t == 'MinkUNet':
        return minkunet_mapping(model_cfg)
    raise KeyError(f'no torch mapping table for model type {t!r}')


def pointpillars_mapping(model_cfg: dict) -> Dict[str, Tuple[str, ...]]:
    """Mapping for the VoxelNet/PointPillars family (ref state_dict names:
    voxel_encoder.pfn_layers.N.{linear,norm}, backbone.blocks.S.I
    Sequential indices, neck.deblocks.S.I, bbox_head.conv_{cls,reg,dir_cls}
    — mmdet3d PillarFeatureNet/SECOND/SECONDFPN/Anchor3DHead layouts)."""
    m: Dict[str, Tuple[str, ...]] = {}
    # --- PillarFeatureNet: pfn_layers.N.linear + .norm → Dense_N + MaskedBN
    feat_channels = list(model_cfg['voxel_encoder'].get('feat_channels',
                                                        [64]))
    for i in range(len(feat_channels)):
        m[f'voxel_encoder.pfn_layers.{i}.linear.weight|linear'] = \
            ('params', '_voxel_encoder', f'Dense_{i}', 'kernel')
        m[f'voxel_encoder.pfn_layers.{i}.norm.weight'] = \
            ('params', '_voxel_encoder', f'MaskedBatchNorm_{i}', 'scale')
        m[f'voxel_encoder.pfn_layers.{i}.norm.bias'] = \
            ('params', '_voxel_encoder', f'MaskedBatchNorm_{i}', 'bias')
        m[f'voxel_encoder.pfn_layers.{i}.norm.running_mean'] = \
            ('batch_stats', '_voxel_encoder', f'MaskedBatchNorm_{i}',
             'mean')
        m[f'voxel_encoder.pfn_layers.{i}.norm.running_var'] = \
            ('batch_stats', '_voxel_encoder', f'MaskedBatchNorm_{i}',
             'var')
    # --- SECOND backbone + SECONDFPN neck
    m.update(second_mapping(list(model_cfg['backbone']['layer_nums'])))
    m.update(secondfpn_mapping(list(model_cfg['neck']['upsample_strides'])))
    # --- Anchor3DHead 1×1 convs
    m.update(anchor3d_head_mapping())
    return m
