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
    # --- SECOND backbone: blocks.S = Sequential(Conv,BN,ReLU, [Conv,BN,ReLU]×n)
    layer_nums = list(model_cfg['backbone']['layer_nums'])
    for s, n in enumerate(layer_nums):
        for j in range(n + 1):
            tc = f'backbone.blocks.{s}.{3 * j}'
            tb = f'backbone.blocks.{s}.{3 * j + 1}'
            m.update(_convbn(tc, tb,
                             ('_backbone', f'block_{s}_{j}')))
    # --- SECONDFPN: deblocks.S = Sequential(ConvTranspose/Conv, BN, ReLU)
    ups = list(model_cfg['neck']['upsample_strides'])
    for s, st in enumerate(ups):
        kind = 'deconv2d' if st > 1 or st == 1 else 'conv2d'
        m.update(_convbn(f'neck.deblocks.{s}.0', f'neck.deblocks.{s}.1',
                         ('_neck', f'deblock_{s}'), kind=kind))
    # --- Anchor3DHead 1×1 convs
    for tname, fname in (('conv_cls', 'conv_cls'), ('conv_reg', 'conv_reg'),
                         ('conv_dir_cls', 'conv_dir')):
        m[f'bbox_head.{tname}.weight|conv2d'] = \
            ('params', '_bbox_head', fname, 'kernel')
        m[f'bbox_head.{tname}.bias'] = \
            ('params', '_bbox_head', fname, 'bias')
    return m
