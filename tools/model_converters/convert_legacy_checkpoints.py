"""Upgrade legacy torch checkpoints to modern mmdet3d key layouts, so they
can then pass through convert_mmdet3d_checkpoint.py.

Covers the reference's remaining model_converters group:
- votenet / h3dnet pre-v0.6 layouts (ref tools/model_converters/
  convert_votenet_checkpoints.py:96-146 and
  convert_h3dnet_checkpoints.py:120-170): the fused `conv_pred.conv_out`
  tensor splits into conv_cls ([0:2] objectness + [-C:] classes) and
  conv_reg ([2:-C]) rows, and `conv_pred.{0,1}` ConvModules rename to
  `conv_pred.shared_convs.layer{0,1}`.
- pycls RegNet -> mmdet naming (ref regnet2mmdet.py: stem.conv->conv1,
  stem.bn->bn1, head.fc->fc, sN.bK.{proj,bn,f.*} -> layerN.(K-1)
  downsample/convN/bnN).

Usage:
    python tools/model_converters/convert_legacy_checkpoints.py \
        {votenet,h3dnet,regnet} IN.pth OUT.pth [--num-classes 18]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..', '..'))


def upgrade_vote_head(sd, num_classes, head_prefix):
    """Pre-v0.6 VoteNet/H3DNet head upgrade (rules from the reference
    converters; `head_prefix` is 'bbox_head' or 'rpn_head')."""
    out = {}
    pred = f'{head_prefix}.conv_pred'
    for k, v in sd.items():
        if k.endswith('num_batches_tracked') and f'{pred}.' in k:
            continue
        nk = (k.replace(f'{pred}.0.', f'{pred}.shared_convs.layer0.')
               .replace(f'{pred}.1.', f'{pred}.shared_convs.layer1.'))
        out[nk] = v
    w = out.pop(f'{pred}.conv_out.weight', None)
    b = out.pop(f'{pred}.conv_out.bias', None)
    if w is not None:
        import torch
        C = num_classes
        # ref EXTRACT_KEYS: cls rows = [0:2] objectness + [-C:] classes,
        # reg rows = [2:-C] (the (start, -1) pair means slice-to-end)
        out[f'{pred}.conv_cls.weight'] = torch.cat([w[0:2], w[-C:]], 0)
        out[f'{pred}.conv_cls.bias'] = torch.cat([b[0:2], b[-C:]], 0)
        out[f'{pred}.conv_reg.weight'] = w[2:-C]
        out[f'{pred}.conv_reg.bias'] = b[2:-C]
    return out


def upgrade_regnet(sd):
    """pycls RegNet state dict -> mmdet ResNet-style naming (rules from
    ref regnet2mmdet.py convert_stem/convert_head/convert_reslayer)."""
    out = {}
    for k, v in sd.items():
        if k.startswith('stem.conv'):
            out[k.replace('stem.conv', 'conv1')] = v
        elif k.startswith('stem.bn'):
            out[k.replace('stem.bn', 'bn1')] = v
        elif k.startswith('head.fc'):
            out[k.replace('head.fc', 'fc')] = v
        elif k.startswith('s'):
            parts = k.split('.')
            layer, block, module = parts[:3]
            lname = f'layer{int(layer[1:])}'
            bname = str(int(block[1:]) - 1)
            tail = parts[-1]
            if int(block[1:]) == 1 and module == 'bn':
                nk = f'{lname}.{bname}.downsample.1.{tail}'
            elif int(block[1:]) == 1 and module == 'proj':
                nk = f'{lname}.{bname}.downsample.0.{tail}'
            elif module == 'f':
                sub = parts[3]
                conv_map = {'a': 'conv1', 'b': 'conv2', 'c': 'conv3',
                            'a_bn': 'bn1', 'b_bn': 'bn2', 'c_bn': 'bn3'}
                if sub == 'se':
                    nk = f'{lname}.{bname}.se.{".".join(parts[4:])}'
                else:
                    nk = f'{lname}.{bname}.{conv_map[sub]}.{tail}'
            else:
                nk = k
            out[nk] = v
        else:
            out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('family', choices=['votenet', 'h3dnet', 'regnet'])
    ap.add_argument('src')
    ap.add_argument('dst')
    ap.add_argument('--num-classes', type=int, default=18,
                    help='18 ScanNet / 10 SUNRGBD (vote heads)')
    args = ap.parse_args()
    import torch
    ckpt = torch.load(args.src, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    if args.family == 'votenet':
        sd = upgrade_vote_head(sd, args.num_classes, 'bbox_head')
    elif args.family == 'h3dnet':
        sd = upgrade_vote_head(sd, args.num_classes, 'rpn_head')
    else:
        sd = upgrade_regnet(sd)
    torch.save({'state_dict': sd}, args.dst)
    print(f'[convert] {len(sd)} tensors -> {args.dst}')


if __name__ == '__main__':
    main()
