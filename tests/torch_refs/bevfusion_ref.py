"""Torch re-implementations of the BEVFusion-chain blocks with the
reference's state-dict layout — conversion-parity oracles for tests.

Layer layouts follow projects/BEVFusion/bevfusion/{bevfusion_necks.py,
depth_lss.py,bevfusion.py} and mmdet3d/models/{backbones/second.py,
necks/second_fpn.py} (state-dict names only; code written from spec).
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F



class ConvModule(nn.Module):
    """mmcv ConvModule (conv+bn+relu) state-dict layout: .conv / .bn."""

    def __init__(self, ci, co, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, k, stride=stride, padding=padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(co)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class GeneralizedLSSFPNRef(nn.Module):
    """ref bevfusion_necks.py:11-96."""

    def __init__(self, in_channels=(8, 16, 32), out_channels=16):
        super().__init__()
        self.lateral_convs = nn.ModuleList()
        self.fpn_convs = nn.ModuleList()
        n = len(in_channels)
        for i in range(n - 1):
            cin = in_channels[i] + (in_channels[i + 1] if i == n - 2
                                    else out_channels)
            self.lateral_convs.append(ConvModule(cin, out_channels, 1))
            self.fpn_convs.append(ConvModule(out_channels, out_channels, 3,
                                             padding=1))

    def forward(self, inputs):
        laterals = list(inputs)
        n = len(laterals)
        for i in range(n - 2, -1, -1):
            up = F.interpolate(laterals[i + 1],
                               size=laterals[i].shape[2:], mode='bilinear',
                               align_corners=False)
            x = torch.cat([laterals[i], up], dim=1)
            x = self.lateral_convs[i](x)
            laterals[i] = self.fpn_convs[i](x)
        return [laterals[i] for i in range(n - 1)]


class SECONDRef(nn.Module):
    """ref mmdet3d/models/backbones/second.py:15-95; blocks.S Sequential
    of Conv,BN,ReLU triples (first conv strided)."""

    def __init__(self, in_channels=16, out_channels=(16, 32),
                 layer_nums=(2, 2), layer_strides=(2, 2)):
        super().__init__()
        blocks = []
        ci = in_channels
        for i, n in enumerate(layer_nums):
            layers = [nn.Conv2d(ci, out_channels[i], 3,
                                stride=layer_strides[i], padding=1,
                                bias=False),
                      nn.BatchNorm2d(out_channels[i], eps=1e-3,
                                     momentum=0.01),
                      nn.ReLU(inplace=True)]
            for _ in range(n):
                layers += [nn.Conv2d(out_channels[i], out_channels[i], 3,
                                     padding=1, bias=False),
                           nn.BatchNorm2d(out_channels[i], eps=1e-3,
                                          momentum=0.01),
                           nn.ReLU(inplace=True)]
            blocks.append(nn.Sequential(*layers))
            ci = out_channels[i]
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        outs = []
        for b in self.blocks:
            x = b(x)
            outs.append(x)
        return outs


class SECONDFPNRef(nn.Module):
    """ref mmdet3d/models/necks/second_fpn.py:12-94."""

    def __init__(self, in_channels=(16, 32), out_channels=(16, 16),
                 upsample_strides=(1, 2)):
        super().__init__()
        deblocks = []
        for i, s in enumerate(upsample_strides):
            s = int(s)
            deblocks.append(nn.Sequential(
                nn.ConvTranspose2d(in_channels[i], out_channels[i], s,
                                   stride=s, bias=False),
                nn.BatchNorm2d(out_channels[i], eps=1e-3, momentum=0.01),
                nn.ReLU(inplace=True)))
        self.deblocks = nn.ModuleList(deblocks)

    def forward(self, feats):
        ups = [d(f) for f, d in zip(feats, self.deblocks)]
        return torch.cat(ups, dim=1) if len(ups) > 1 else ups[0]


class ConvFuserRef(nn.Sequential):
    """ref bevfusion.py ConvFuser(Sequential)."""

    def __init__(self, in_channels, out_channels):
        super().__init__(
            nn.Conv2d(in_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels), nn.ReLU(True))

    def forward(self, inputs):
        return super().forward(torch.cat(inputs, dim=1))


class DepthLSSRef(nn.Module):
    """ref depth_lss.py DepthLSSTransform:555-733 + BaseTransform geometry
    (create_frustum:53, get_geometry:68, bev_pool:179).

    Full forward: (img feats, sparse depth, cam params) → BEV [B, D*C, X, Y]
    using an exact scatter-add pool (mathematically identical to the CUDA
    interval kernel).
    """

    def __init__(self, in_channels, out_channels, image_size, feature_size,
                 xbound, ybound, zbound, dbound, downsample=1):
        super().__init__()
        self.image_size, self.feature_size = image_size, feature_size
        self.xbound, self.ybound = xbound, ybound
        self.zbound, self.dbound = zbound, dbound
        self.C = out_channels
        self.D = int(round((dbound[1] - dbound[0]) / dbound[2]))
        self.nx = [int(round((b[1] - b[0]) / b[2]))
                   for b in (xbound, ybound, zbound)]
        self.dtransform = nn.Sequential(
            nn.Conv2d(1, 8, 1), nn.BatchNorm2d(8), nn.ReLU(True),
            nn.Conv2d(8, 32, 5, stride=4, padding=2), nn.BatchNorm2d(32),
            nn.ReLU(True),
            nn.Conv2d(32, 64, 5, stride=2, padding=2), nn.BatchNorm2d(64),
            nn.ReLU(True))
        self.depthnet = nn.Sequential(
            nn.Conv2d(in_channels + 64, in_channels, 3, padding=1),
            nn.BatchNorm2d(in_channels), nn.ReLU(True),
            nn.Conv2d(in_channels, in_channels, 3, padding=1),
            nn.BatchNorm2d(in_channels), nn.ReLU(True),
            nn.Conv2d(in_channels, self.D + self.C, 1))
        self.downsample_factor = downsample
        if downsample > 1:
            c = out_channels
            self.downsample = nn.Sequential(
                nn.Conv2d(c, c, 3, padding=1, bias=False),
                nn.BatchNorm2d(c), nn.ReLU(True),
                nn.Conv2d(c, c, 3, stride=downsample, padding=1,
                          bias=False),
                nn.BatchNorm2d(c), nn.ReLU(True),
                nn.Conv2d(c, c, 3, padding=1, bias=False),
                nn.BatchNorm2d(c), nn.ReLU(True))

    def create_frustum(self):
        iH, iW = self.image_size
        fH, fW = self.feature_size
        ds = torch.arange(*self.dbound).float() \
            .view(-1, 1, 1).expand(-1, fH, fW)
        xs = torch.linspace(0, iW - 1, fW).view(1, 1, fW) \
            .expand(self.D, fH, fW)
        ys = torch.linspace(0, iH - 1, fH).view(1, fH, 1) \
            .expand(self.D, fH, fW)
        return torch.stack((xs, ys, ds), -1)                 # [D,fH,fW,3]

    def get_geometry(self, cam2lidar, intrins, post_rots, post_trans):
        B, N = intrins.shape[:2]
        frustum = self.create_frustum()
        points = frustum[None, None] - post_trans.view(B, N, 1, 1, 1, 3)
        points = torch.inverse(post_rots).view(B, N, 1, 1, 1, 3, 3) \
            .matmul(points.unsqueeze(-1))
        points = torch.cat(
            (points[..., :2, :] * points[..., 2:3, :], points[..., 2:3, :]),
            dim=5)
        combine = cam2lidar[..., :3, :3].matmul(torch.inverse(intrins))
        points = combine.view(B, N, 1, 1, 1, 3, 3).matmul(points).squeeze(-1)
        points = points + cam2lidar[..., :3, 3].view(B, N, 1, 1, 1, 3)
        return points                                        # [B,N,D,fH,fW,3]

    def bev_pool(self, geom, x):
        """x [B,N,D,fH,fW,C] → [B, Z*C, X, Y] (ref rank order x-major)."""
        B = x.shape[0]
        C = x.shape[-1]
        nx, ny, nz = self.nx
        dx = torch.tensor([self.xbound[2], self.ybound[2], self.zbound[2]])
        bx = torch.tensor([self.xbound[0], self.ybound[0], self.zbound[0]]) \
            + dx / 2.0
        g = ((geom - (bx - dx / 2.0)) / dx).long()           # [...,3]
        g = g.view(B, -1, 3)
        xf = x.reshape(B, -1, C)
        out = x.new_zeros((B, nz, nx, ny, C))
        for b in range(B):
            kept = ((g[b, :, 0] >= 0) & (g[b, :, 0] < nx)
                    & (g[b, :, 1] >= 0) & (g[b, :, 1] < ny)
                    & (g[b, :, 2] >= 0) & (g[b, :, 2] < nz))
            gb, xb = g[b][kept], xf[b][kept]
            flat = gb[:, 2] * (nx * ny) + gb[:, 0] * ny + gb[:, 1]
            acc = out.new_zeros((nz * nx * ny, C))
            acc.index_add_(0, flat, xb)
            out[b] = acc.view(nz, nx, ny, C)
        # [B, nz, nx, ny, C] → [B, C, nz, nx, ny] → cat over z: [B, z*C,X,Y]
        out = out.permute(0, 4, 1, 2, 3)
        return torch.cat(out.unbind(dim=2), 1)

    def forward(self, img, depth_map, cam2lidar, intrins, post_rots,
                post_trans):
        B, N, C, fH, fW = img.shape
        iH, iW = self.image_size
        d = self.dtransform(depth_map.view(B * N, 1, iH, iW))
        x = torch.cat([d, img.view(B * N, C, fH, fW)], dim=1)
        x = self.depthnet(x)
        depth_logits = x[:, :self.D]
        feats = x[:, self.D:self.D + self.C]
        depth = depth_logits.softmax(dim=1)
        frustum = depth.unsqueeze(1) * feats.unsqueeze(2)  # [BN,C,D,fH,fW]
        frustum = frustum.view(B, N, self.C, self.D, fH, fW) \
            .permute(0, 1, 3, 4, 5, 2)                     # [B,N,D,fH,fW,C]
        geom = self.get_geometry(cam2lidar, intrins, post_rots, post_trans)
        out = self.bev_pool(geom, frustum)
        if self.downsample_factor > 1:
            out = self.downsample(out)
        return out, depth_logits.view(B, N, self.D, fH, fW)


class FFN(nn.Module):
    """mmcv FFN with ReLU (DETR decoder default; state-dict names
    layers.0.0 / layers.1)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dim, hidden), nn.ReLU(True),
                          nn.Dropout(0.)),
            nn.Linear(hidden, dim), nn.Dropout(0.))

    def forward(self, x, identity):
        return identity + self.layers(x)


class PositionEncodingLearnedRef(nn.Module):
    """ref transformer.py:7-22."""

    def __init__(self, input_channel=2, num_pos_feats=128):
        super().__init__()
        self.position_embedding_head = nn.Sequential(
            nn.Conv1d(input_channel, num_pos_feats, 1),
            nn.BatchNorm1d(num_pos_feats), nn.ReLU(True),
            nn.Conv1d(num_pos_feats, num_pos_feats, 1))

    def forward(self, xy):                   # [B, N, 2]
        return self.position_embedding_head(
            xy.transpose(1, 2)).transpose(1, 2)   # [B, N, C]


class MHAWrap(nn.Module):
    """mmcv MultiheadAttention state-dict layout: .attn submodule."""

    def __init__(self, dim, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(dim, heads, batch_first=True)


class DecoderLayerRef(nn.Module):
    """ref TransformerDecoderLayer (transformer.py:26-113) on top of
    DetrTransformerDecoderLayer semantics (values carry pos encodings,
    post-norm)."""

    def __init__(self, dim, heads, ff):
        super().__init__()
        self.self_posembed = PositionEncodingLearnedRef(2, dim)
        self.cross_posembed = PositionEncodingLearnedRef(2, dim)
        self.self_attn = MHAWrap(dim, heads)
        self.cross_attn = MHAWrap(dim, heads)
        self.norms = nn.ModuleList([nn.LayerNorm(dim) for _ in range(3)])
        self.ffn = FFN(dim, ff)

    def forward(self, query, key, query_pos, key_pos):
        qp = self.self_posembed(query_pos)
        kp = self.cross_posembed(key_pos)
        out = self.self_attn.attn(query + qp, query + qp, query + qp)[0]
        query = self.norms[0](query + out)
        out = self.cross_attn.attn(query + qp, key + kp, key + kp)[0]
        query = self.norms[1](query + out)
        return self.norms[2](self.ffn(query, identity=query))


class SeparateHeadRef(nn.Module):
    """ref SeparateHead: per-key Sequential(ConvModule(Conv1d,BN1d,ReLU),
    Conv1d)."""

    def __init__(self, in_ch, heads, head_conv=64):
        super().__init__()
        self.keys = list(heads)
        for k, (out_c, num_conv) in heads.items():
            mods = []
            for _ in range(num_conv - 1):
                block = nn.Module()
                block.conv = nn.Conv1d(in_ch, head_conv, 1, bias=False)
                block.bn = nn.BatchNorm1d(head_conv)
                mods.append(block)
                in_c = head_conv
            seq = nn.Sequential(*mods, nn.Conv1d(head_conv, out_c, 1))
            setattr(self, k, seq)
            in_ch_local = in_ch
        self.in_ch = in_ch

    def forward(self, x):                    # [B, C, Q]
        out = {}
        for k in self.keys:
            seq = getattr(self, k)
            h = x
            for m in seq[:-1]:
                h = F.relu(m.bn(m.conv(h)))
            out[k] = seq[-1](h)
        return out


class TransFusionHeadRef(nn.Module):
    """ref bevfusion_head.py:41-316 forward (no loss): shared conv →
    heatmap → peak NMS → top-Q queries → 1 decoder layer → SeparateHead."""

    def __init__(self, num_classes, in_channels, hidden, num_proposals,
                 heads, nms_kernel_size=3, num_heads=2, ff=64):
        super().__init__()
        self.num_classes, self.num_proposals = num_classes, num_proposals
        self.nms_kernel_size = nms_kernel_size
        self.shared_conv = nn.Conv2d(in_channels, hidden, 3, padding=1)
        self.heatmap_head = nn.Sequential(
            ConvModule(hidden, hidden, 3, padding=1),
            nn.Conv2d(hidden, num_classes, 3, padding=1))
        self.class_encoding = nn.Conv1d(num_classes, hidden, 1)
        self.decoder = nn.ModuleList([DecoderLayerRef(hidden, num_heads,
                                                      ff)])
        self.prediction_heads = nn.ModuleList(
            [SeparateHeadRef(hidden, heads)])

    def forward(self, bev):                  # [B, C, H, W]
        B, _, H, W = bev.shape
        feat = self.shared_conv(bev)
        heatmap = self.heatmap_head(feat)
        hm = heatmap.sigmoid()
        k = self.nms_kernel_size
        pooled = F.max_pool2d(hm, k, stride=1, padding=k // 2)
        peaks = torch.where(hm == pooled, hm, torch.zeros_like(hm))
        if self.num_classes == 10:
            peaks[:, 8:] = hm[:, 8:]
        # note: torch layout [B, K, H, W] → flatten must match flax's
        # [B, H, W, K] class-minor order
        flat = peaks.permute(0, 2, 3, 1).reshape(B, -1)
        top_v, top_i = torch.topk(flat, self.num_proposals)
        top_cls = top_i % self.num_classes
        pix = top_i // self.num_classes
        xs = (pix // W).float()
        ys = (pix % W).float()
        feat_flat = feat.flatten(2).transpose(1, 2)       # [B, HW, C]
        q_feat = torch.gather(
            feat_flat, 1, pix.unsqueeze(-1).expand(-1, -1,
                                                   feat_flat.shape[-1]))
        onehot = F.one_hot(top_cls, self.num_classes).float()
        q_feat = q_feat + self.class_encoding(
            onehot.transpose(1, 2)).transpose(1, 2)
        q_pos = torch.stack([xs, ys], -1)
        gx, gy = torch.meshgrid(torch.arange(H).float(),
                                torch.arange(W).float(), indexing='ij')
        k_pos = torch.stack([gx, gy], -1).view(1, H * W, 2) \
            .expand(B, -1, -1)
        q = self.decoder[0](q_feat, feat_flat, q_pos, k_pos)
        res = self.prediction_heads[0](q.transpose(1, 2))
        res = {k2: v.transpose(1, 2) for k2, v in res.items()}
        res['center'] = res['center'] + q_pos
        res['query_heatmap_score'] = torch.gather(
            hm.permute(0, 2, 3, 1).reshape(B, H * W, -1), 1,
            pix.unsqueeze(-1).expand(-1, -1, self.num_classes))
        res['dense_heatmap'] = heatmap
        res['query_labels'] = top_cls
        return res


# --------------------------------------------------------------------------
# Sparse encoder (dense-conv3d emulation) + full-model composition
# --------------------------------------------------------------------------

class _SpConvW(nn.Module):
    """Holds one spconv-v2-layout weight [O, kz, ky, kx, I] (the layout
    mmdet3d's write_spconv2.py shim produces in checkpoints)."""

    def __init__(self, cin, cout, k=(3, 3, 3)):
        super().__init__()
        kz, ky, kx = k
        self.weight = nn.Parameter(
            torch.randn(cout, kz, ky, kx, cin) * (cin * kz * ky * kx) ** -0.5)


def _spblock(cin, cout, k=(3, 3, 3)):
    """state-dict names 0.weight (spconv layout) / 1.* (BN) like
    make_sparse_convmodule's SparseSequential(conv, BN1d, ReLU)."""
    m = nn.Module()
    m.add_module('0', _SpConvW(cin, cout, k))
    m.add_module('1', nn.BatchNorm3d(cout, eps=1e-3, momentum=0.01))
    return m


class SparseEncoderRef(nn.Module):
    """Dense-conv3d emulation of our TPU SparseEncoder semantics
    (tpu_bev3d/ops/sparse_conv.py, ops/tile_sparse.py): SubM conv ==
    dense conv3d at the active sites (inactive neighbors are zero either
    way); strided conv == dense strided conv3d masked to the active set
    of the chosen ``active_rule`` — 'floor' =
    unique(floor((c + pad - center)/stride)) (gather-GEMM backend
    default) or 'spconv' = the exact spconv receptive-field rule (site
    active iff any active input inside its k-window; emulated as a dense
    max-pool over the mask — this is the rule real SparseConv3d uses,
    ref projects/SparseConvolution/sparse_functional.py:169, and the
    faithful configs' tile-backend default). Exact value parity with
    either backend given the same active sets. State-dict layout =
    mmdet3d SparseEncoder (conv_input / encoder_layers.encoder_layerN.j /
    conv_out)."""

    def __init__(self, in_channels, sparse_shape, base_channels=16,
                 output_channels=128,
                 encoder_channels=((16, 16, 32), (32, 32, 64),
                                   (64, 64, 128), (128, 128)),
                 encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)),
                                   (0, 0)),
                 conv_out_kernel=(3, 1, 1), conv_out_stride=(2, 1, 1),
                 active_rule='floor', xy_order=True):
        super().__init__()
        self.active_rule = active_rule
        self.xy_order = xy_order  # False = plain mmdet3d SparseEncoder
        #                           ([B, C*D, y, x], no final transpose)
        self.sparse_shape = tuple(sparse_shape)
        self.encoder_channels = encoder_channels
        self.encoder_paddings = encoder_paddings
        self.conv_out_kernel = tuple(conv_out_kernel)
        self.conv_out_stride = tuple(conv_out_stride)
        self.conv_input = _spblock(in_channels, base_channels)
        self.encoder_layers = nn.Module()
        ci = base_channels
        for i, stage in enumerate(encoder_channels):
            layer = nn.Module()
            for j, ch in enumerate(stage):
                layer.add_module(str(j), _spblock(ci, ch))
                ci = ch
            self.encoder_layers.add_module(f'encoder_layer{i + 1}', layer)
        self.conv_out = _spblock(ci, output_channels, self.conv_out_kernel)

    @staticmethod
    def _dense_w(block):
        # [O, kz, ky, kx, I] -> conv3d [O, I, kz, ky, kx]
        return getattr(block, '0').weight.permute(0, 4, 1, 2, 3)

    @staticmethod
    def _bn_relu_mask(block, y, mask):
        y = getattr(block, '1')(y)
        return F.relu(y) * mask

    def _subm(self, block, x, mask):
        w = self._dense_w(block)
        k = w.shape[2:]
        pad = tuple((kk - 1) // 2 for kk in k)
        y = F.conv3d(x, w, padding=pad)
        return self._bn_relu_mask(block, y, mask), mask

    def _strided(self, block, x, mask, stride, padding):
        w = self._dense_w(block)
        k = np.asarray(w.shape[2:])
        strd = np.broadcast_to(np.asarray(stride), (3,))
        pad = np.broadcast_to(np.asarray(padding), (3,))
        y = F.conv3d(x, w, stride=tuple(int(s) for s in strd),
                     padding=tuple(int(p) for p in pad))
        if self.active_rule == 'spconv':
            # receptive-field rule: site active iff any active input in
            # its k-window == max-pool of the mask with the conv geometry
            new_mask = (F.max_pool3d(
                mask, kernel_size=tuple(int(kk) for kk in k),
                stride=tuple(int(s) for s in strd),
                padding=tuple(int(p) for p in pad)) > 0).to(x.dtype)
            return self._bn_relu_mask(block, y, new_mask), new_mask
        # floor-rule active set from the current mask
        center = (k - 1) // 2
        idx = mask[:, 0].nonzero()                       # [M, 4] b,z,y,x
        cand = idx.clone()
        shift = torch.tensor(pad - center, device=idx.device)
        sj = torch.tensor(strd.copy(), device=idx.device)
        cand[:, 1:] = torch.div(idx[:, 1:] + shift, sj,
                                rounding_mode='floor')
        out_sp = torch.tensor(y.shape[2:], device=idx.device)
        ok = ((cand[:, 1:] >= 0) & (cand[:, 1:] < out_sp)).all(1)
        cand = cand[ok]
        new_mask = torch.zeros((x.shape[0], 1) + tuple(y.shape[2:]),
                               dtype=x.dtype, device=x.device)
        new_mask[cand[:, 0], 0, cand[:, 1], cand[:, 2], cand[:, 3]] = 1
        return self._bn_relu_mask(block, y, new_mask), new_mask

    def forward(self, voxel_feats, coords, batch_size):
        """voxel_feats [V, C] float tensor; coords [V, 4] int (b,z,y,x;
        b=-1 invalid) -> BEV [B, C*D, x, y] (xy-order NCHW, BEVFusion)."""
        nz, ny, nx = self.sparse_shape
        C = voxel_feats.shape[1]
        x = torch.zeros(batch_size, C, nz, ny, nx)
        mask = torch.zeros(batch_size, 1, nz, ny, nx)
        v = coords[:, 0] >= 0
        c = coords[v].long()
        x[c[:, 0], :, c[:, 1], c[:, 2], c[:, 3]] = voxel_feats[v]
        mask[c[:, 0], 0, c[:, 1], c[:, 2], c[:, 3]] = 1
        x, mask = self._subm(self.conv_input, x, mask)
        n_stages = len(self.encoder_channels)
        for i, stage in enumerate(self.encoder_channels):
            layer = getattr(self.encoder_layers, f'encoder_layer{i + 1}')
            for j in range(len(stage)):
                block = getattr(layer, str(j))
                if j == len(stage) - 1 and i != n_stages - 1:
                    x, mask = self._strided(block, x, mask, 2,
                                            self.encoder_paddings[i][j])
                else:
                    x, mask = self._subm(block, x, mask)
        x, mask = self._strided(self.conv_out, x, mask,
                                self.conv_out_stride, 0)
        B, C2, D, H, W = x.shape
        out = x.reshape(B, C2 * D, H, W)          # H=y, W=x
        if not self.xy_order:
            return out                             # mmdet3d [B, C*D, y, x]
        return out.transpose(2, 3)                 # xy-order [B, C*D, x, y]


class BEVFusionE2ERef(nn.Module):
    """The ENTIRE BEVFusion L+C predict chain in torch with the
    reference's state-dict layout — composed from the per-block refs that
    each have their own forward-parity test. Attribute names equal the
    bevfusion_mapping prefixes so one state_dict converts the whole
    model. Ref forward: projects/BEVFusion/bevfusion/bevfusion.py:294-381.
    """

    def __init__(self, swin_kw, fpn_kw, lss_kw, middle_kw, fuser_in,
                 fuser_out, second_kw, secfpn_kw, head_kw):
        super().__init__()
        from tests.torch_refs.swin_ref import SwinRef
        self.img_backbone = SwinRef(**swin_kw)
        self.img_neck = GeneralizedLSSFPNRef(**fpn_kw)
        self.view_transform = DepthLSSRef(**lss_kw)
        self.pts_middle_encoder = SparseEncoderRef(**middle_kw)
        self.fuser = ConvFuserRef(fuser_in, fuser_out)
        self.pts_backbone = SECONDRef(**second_kw)
        self.pts_neck = SECONDFPNRef(**secfpn_kw)
        self.bbox_head = TransFusionHeadRef(**head_kw)

    def forward(self, imgs, depth_map, cam2lidar, intrins, post_rots,
                post_trans, voxel_feats, voxel_coords, batch_size):
        """imgs [B,N,H,W,3] normalized; depth_map [B,N,1,H,W] (sparse
        depth from the shared deterministic projection); voxel tables
        from the shared hard_voxelize."""
        B, N, H, W, _ = imgs.shape
        x = imgs.reshape(B * N, H, W, 3).permute(0, 3, 1, 2)
        feats = self.img_backbone(x)               # NHWC list
        feats = [f.permute(0, 3, 1, 2) for f in feats]
        feats = self.img_neck(feats)
        f = feats[0]                               # [BN, C, fh, fw]
        C, fh, fw = f.shape[1:]
        f = f.reshape(B, N, C, fh, fw)
        bev_img, depth_logits = self.view_transform(
            f, depth_map, cam2lidar, intrins, post_rots, post_trans)
        bev_pts = self.pts_middle_encoder(voxel_feats, voxel_coords,
                                          batch_size)
        fused = self.fuser([bev_img, bev_pts])
        outs = self.pts_backbone(fused)
        x2 = self.pts_neck(outs)
        res = self.bbox_head(x2)
        inter = dict(bev_img=bev_img, bev_pts=bev_pts, fused=fused,
                     neck=x2)
        return res, inter
