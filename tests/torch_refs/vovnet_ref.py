"""Compact torch VoVNetCP oracle with the EXACT reference state-dict
naming (ref projects/PETR/petr/vovnetcp.py:346 — stem ``stem_N/conv``
OrderedDict names, ``stageS.OSAS_B.layers.i.OSAS_B_i/conv``, concat
``OSAS_B_concat/conv``, eSE ``ese.fc``), written from spec for
conversion-parity tests (state-dict names necessarily match the
reference; the code is original)."""
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


def _conv(cin, cout, name, k, stride=1, pad=None):
    pad = (k - 1) // 2 if pad is None else pad
    return [
        (f'{name}/conv', nn.Conv2d(cin, cout, k, stride, pad, bias=False)),
        (f'{name}/norm', nn.BatchNorm2d(cout)),
        (f'{name}/relu', nn.ReLU(inplace=True)),
    ]


class eSEModule(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.avg_pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        s = self.fc(self.avg_pool(x))
        return x * (F.relu6(s + 3.0) / 6.0)


class _OSA(nn.Module):
    def __init__(self, cin, stage_ch, concat_ch, layer_per_block,
                 module_name, identity=False):
        super().__init__()
        self.identity = identity
        self.layers = nn.ModuleList()
        c = cin
        for i in range(layer_per_block):
            self.layers.append(nn.Sequential(OrderedDict(
                _conv(c, stage_ch, f'{module_name}_{i}', 3))))
            c = stage_ch
        self.concat = nn.Sequential(OrderedDict(
            _conv(cin + layer_per_block * stage_ch, concat_ch,
                  f'{module_name}_concat', 1)))
        self.ese = eSEModule(concat_ch)

    def forward(self, x):
        idf = x
        outs = [x]
        for layer in self.layers:
            x = layer(x)
            outs.append(x)
        x = self.ese(self.concat(torch.cat(outs, 1)))
        if self.identity:
            x = x + idf
        return x


class VoVNetCPRef(nn.Module):
    """Stages named stage2..stage5, blocks OSA{S}_{B} (ref naming)."""

    def __init__(self, stem_ch=(64, 64, 128), stage_ch=(128, 160, 192, 224),
                 concat_ch=(256, 512, 768, 1024),
                 block_per_stage=(1, 1, 2, 2), layer_per_block=5,
                 out_indices=(2, 3), input_ch=3):
        super().__init__()
        self.out_indices = out_indices
        stem = _conv(input_ch, stem_ch[0], 'stem_1', 3, 2)
        stem += _conv(stem_ch[0], stem_ch[1], 'stem_2', 3, 1)
        stem += _conv(stem_ch[1], stem_ch[2], 'stem_3', 3, 2)
        self.add_module('stem', nn.Sequential(OrderedDict(stem)))
        cin = stem_ch[2]
        for si in range(len(stage_ch)):
            blocks = OrderedDict()
            for bi in range(block_per_stage[si]):
                name = f'OSA{si + 2}_{bi + 1}'
                blocks[name] = _OSA(cin, stage_ch[si], concat_ch[si],
                                    layer_per_block, name, identity=bi > 0)
                cin = concat_ch[si]
            self.add_module(f'stage{si + 2}', nn.Sequential(blocks))
        self.n_stages = len(stage_ch)

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for si in range(self.n_stages):
            if si > 0:
                x = F.max_pool2d(x, 3, 2, 0, ceil_mode=True)
            x = getattr(self, f'stage{si + 2}')(x)
            if si in self.out_indices:
                outs.append(x)
        return outs
