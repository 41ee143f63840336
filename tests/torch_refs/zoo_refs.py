"""Torch conversion-parity oracles for the non-flagship zoo families
(CenterPoint / SECOND / PointPillars), with the reference's state-dict
layouts (mmdet3d/models/dense_heads/centerpoint_head.py:20-123,355;
anchor3d_head.py:23; voxel_encoders/pillar_encoder.py:14; detectors with
MVXTwoStageDetector pts_ prefixes). State-dict names only; code written
from spec."""
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_refs.bevfusion_ref import (ConvModule, SECONDFPNRef,
                                            SECONDRef, SparseEncoderRef)


class SeparateHead2DRef(nn.Module):
    """CenterHead SeparateHead (2D convs; distinct from the TransFusion
    1D SeparateHead). heads: {name: (out_c, num_conv)}; each branch is a
    Sequential of ConvModules then a plain biased conv — torch keys
    `<name>.{i}.conv/bn` then `<name>.{num_conv-1}.weight/bias`."""

    def __init__(self, in_ch, heads, head_conv=64, final_kernel=3):
        super().__init__()
        self.heads = dict(heads)
        for name, (out_c, num_conv) in self.heads.items():
            seq, ci = [], in_ch
            for _ in range(num_conv - 1):
                seq.append(ConvModule(ci, head_conv, final_kernel,
                                      padding=final_kernel // 2))
                ci = head_conv
            seq.append(nn.Conv2d(ci, out_c, final_kernel,
                                 padding=final_kernel // 2, bias=True))
            setattr(self, name, nn.Sequential(*seq))

    def forward(self, x):
        return {name: getattr(self, name)(x) for name in self.heads}


class CenterHeadRef(nn.Module):
    """ref centerpoint_head.py:244-360: shared ConvModule + per-task
    SeparateHeads (common_heads + per-task heatmap)."""

    def __init__(self, in_ch, tasks, common_heads, share_conv_channel=64,
                 final_kernel=3):
        super().__init__()
        self.shared_conv = ConvModule(in_ch, share_conv_channel, 3,
                                      padding=1)
        self.task_heads = nn.ModuleList([
            SeparateHead2DRef(
                share_conv_channel,
                {**{k: tuple(v) for k, v in common_heads.items()},
                 'heatmap': (len(t['class_names']), 2)},
                final_kernel=final_kernel)
            for t in tasks])

    def forward(self, x):
        x = self.shared_conv(x)
        return [h(x) for h in self.task_heads]


class Anchor3DHeadRef(nn.Module):
    """ref anchor3d_head.py:23: three 1x1 convs."""

    def __init__(self, in_ch, num_anchors, num_classes, box_code_size=7):
        super().__init__()
        self.conv_cls = nn.Conv2d(in_ch, num_anchors * num_classes, 1)
        self.conv_reg = nn.Conv2d(in_ch, num_anchors * box_code_size, 1)
        self.conv_dir_cls = nn.Conv2d(in_ch, num_anchors * 2, 1)

    def forward(self, x):
        return self.conv_cls(x), self.conv_reg(x), self.conv_dir_cls(x)


class PillarFeatureNetRef(nn.Module):
    """ref pillar_encoder.py:14 + utils.py PFNLayer (single layer):
    Linear(no bias) -> BN1d over channels -> ReLU -> max over points.
    Input is the already-decorated+masked [V, T, C'] tensor (decoration
    itself is parity-tested in test_ops/test_voxelize paths)."""

    def __init__(self, in_ch, out_ch=64):
        super().__init__()
        layer = nn.Module()
        layer.linear = nn.Linear(in_ch, out_ch, bias=False)
        layer.norm = nn.BatchNorm1d(out_ch, eps=1e-3, momentum=0.01)
        self.pfn_layers = nn.ModuleList([layer])

    def forward(self, feats):
        l = self.pfn_layers[0]
        x = l.linear(feats)                        # [V, T, C]
        x = l.norm(x.permute(0, 2, 1)).permute(0, 2, 1)
        x = F.relu(x)
        return x.max(dim=1)[0]                     # [V, C]


def scatter_pillars(vf, coords, batch_size, ny, nx):
    """PointPillarsScatter (ref pillar_scatter.py): [V, C] + (b,z,y,x)
    coords -> canvas [B, C, ny, nx]."""
    C = vf.shape[1]
    canvas = torch.zeros(batch_size, C, ny, nx)
    v = coords[:, 0] >= 0
    c = coords[v].long()
    canvas[c[:, 0], :, c[:, 2], c[:, 3]] = vf[v]
    return canvas


class CenterPointE2ERef(nn.Module):
    """Voxel-CenterPoint chain: SparseEncoder (plain mmdet3d yx order) ->
    SECOND -> SECONDFPN -> CenterHead, with the detector's pts_ key
    prefixes (ref mmdet3d/models/detectors/centerpoint.py)."""

    def __init__(self, middle_kw, second_kw, secfpn_kw, head_kw):
        super().__init__()
        self.pts_middle_encoder = SparseEncoderRef(xy_order=False,
                                                   **middle_kw)
        self.pts_backbone = SECONDRef(**second_kw)
        self.pts_neck = SECONDFPNRef(**secfpn_kw)
        self.pts_bbox_head = CenterHeadRef(**head_kw)

    def forward(self, voxel_feats, coords, batch_size):
        x = self.pts_middle_encoder(voxel_feats, coords, batch_size)
        x = self.pts_neck(self.pts_backbone(x))
        return self.pts_bbox_head(x)


class SECONDE2ERef(nn.Module):
    """SECOND-KITTI chain (VoxelNet shell, unprefixed keys): paramless
    mean-VFE happens outside; SparseEncoder -> SECOND -> SECONDFPN ->
    Anchor3DHead."""

    def __init__(self, middle_kw, second_kw, secfpn_kw, head_kw):
        super().__init__()
        self.middle_encoder = SparseEncoderRef(xy_order=False, **middle_kw)
        self.backbone = SECONDRef(**second_kw)
        self.neck = SECONDFPNRef(**secfpn_kw)
        self.bbox_head = Anchor3DHeadRef(**head_kw)

    def forward(self, voxel_feats, coords, batch_size):
        x = self.middle_encoder(voxel_feats, coords, batch_size)
        x = self.neck(self.backbone(x))
        return self.bbox_head(x)


class PointPillarsE2ERef(nn.Module):
    """PointPillars chain (unprefixed keys): PFN -> scatter -> SECOND ->
    SECONDFPN -> Anchor3DHead."""

    def __init__(self, pfn_kw, ny, nx, second_kw, secfpn_kw, head_kw):
        super().__init__()
        self.ny, self.nx = ny, nx
        self.voxel_encoder = PillarFeatureNetRef(**pfn_kw)
        self.backbone = SECONDRef(**second_kw)
        self.neck = SECONDFPNRef(**secfpn_kw)
        self.bbox_head = Anchor3DHeadRef(**head_kw)

    def forward(self, decorated, coords, batch_size):
        vf = self.voxel_encoder(decorated)
        x = scatter_pillars(vf, coords, batch_size, self.ny, self.nx)
        x = self.neck(self.backbone(x))
        return self.bbox_head(x)
