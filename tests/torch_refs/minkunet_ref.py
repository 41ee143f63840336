"""Dense-emulation torch MinkUNet oracle with the torchsparse state-dict
layout (ref mmdet3d/models/backbones/minkunet_backbone.py:118-198 +
layers/torchsparse_block.py), written from spec for conversion-parity
tests.

Sparse semantics emulated densely with an occupancy mask:
- submanifold k3: dense conv then zero inactive sites,
- k2-s2 down: strided VALID conv; out occupancy = 2³ max-pool,
- k2-s2 inverse: conv_transpose back onto the RECORDED finer occupancy.

Kernel-offset order (the torchsparse 2.x get_kernel_offsets contract the
converter assumes, utils/torch_convert.py tsparse_even_kernel): odd
volumes enumerate z-outer/x-fastest, even volumes x-outer/z-fastest;
1×1 kernels are stored [Cin, Cout].
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


class SPConv(nn.Module):
    """spnn.Conv3d stand-in: parameter named ``kernel`` in the
    torchsparse layout; densifies to an F.conv3d weight on use."""

    def __init__(self, cin, cout, k, stride=1, transposed=False):
        super().__init__()
        self.k, self.stride, self.transposed = k, stride, transposed
        self.cin, self.cout = cin, cout
        if k == 1:
            self.kernel = nn.Parameter(torch.randn(cin, cout) * 0.1)
        else:
            self.kernel = nn.Parameter(torch.randn(k ** 3, cin, cout) * 0.1)

    def dense_weight(self):
        k, ci, co = self.k, self.cin, self.cout
        if k == 1:
            return self.kernel.permute(1, 0).reshape(co, ci, 1, 1, 1)
        if k % 2 == 1:      # odd: z-outer / x-fastest
            w = self.kernel.reshape(k, k, k, ci, co)       # [z, y, x, ...]
            return w.permute(4, 3, 0, 1, 2)                # [O, I, z, y, x]
        # even: x-outer / z-fastest
        w = self.kernel.reshape(k, k, k, ci, co)           # [x, y, z, ...]
        if self.transposed:
            return w.permute(3, 4, 2, 1, 0)                # [I, O, z, y, x]
        return w.permute(4, 3, 2, 1, 0)                    # [O, I, z, y, x]

    def forward(self, x, mask, target_mask=None):
        """x [B, C, D, H, W], mask [B, 1, D, H, W] → (y, mask_out)."""
        w = self.dense_weight()
        if self.transposed:
            y = F.conv_transpose3d(x, w, stride=self.stride)
            return y * target_mask, target_mask
        if self.stride == 1:
            y = F.conv3d(x, w, padding=self.k // 2)
            return y * mask, mask
        y = F.conv3d(x, w, stride=self.stride)
        m = F.max_pool3d(mask, self.k, self.stride)
        return y * m, m


class SPBN(nn.BatchNorm1d):
    """BatchNorm1d-over-rows applied densely (eval running stats)."""

    def forward(self, x):  # [B, C, D, H, W]
        s = ((x - self.running_mean.view(1, -1, 1, 1, 1))
             / torch.sqrt(self.running_var.view(1, -1, 1, 1, 1) + self.eps))
        return s * self.weight.view(1, -1, 1, 1, 1) \
            + self.bias.view(1, -1, 1, 1, 1)


class ConvModuleRef(nn.Module):
    """TorchSparseConvModule: net = [conv, bn, relu]."""

    def __init__(self, cin, cout, k, stride=1, transposed=False):
        super().__init__()
        self.net = nn.ModuleList(
            [SPConv(cin, cout, k, stride, transposed), SPBN(cout)])

    def forward(self, x, mask, target_mask=None):
        y, m = self.net[0](x, mask, target_mask)
        return F.relu(self.net[1](y)) * m, m


class BasicBlockRef(nn.Module):
    """TorchSparseBasicBlock: net=[conv,bn,relu,conv,bn] + downsample."""

    def __init__(self, cin, cout):
        super().__init__()
        self.net = nn.ModuleList([SPConv(cin, cout, 3), SPBN(cout),
                                  nn.ReLU(), SPConv(cout, cout, 3),
                                  SPBN(cout)])
        if cin == cout:
            self.downsample = nn.Identity()
        else:
            self.downsample = nn.ModuleList(
                [SPConv(cin, cout, 1), SPBN(cout)])

    def forward(self, x, mask):
        y, _ = self.net[0](x, mask)
        y = F.relu(self.net[1](y)) * mask
        y, _ = self.net[3](y, mask)
        y = self.net[4](y) * mask
        if isinstance(self.downsample, nn.Identity):
            idt = x
        else:
            idt, _ = self.downsample[0](x, mask)
            idt = self.downsample[1](idt) * mask
        return F.relu(y + idt) * mask, mask


class MinkUNetRef(nn.Module):
    """Full torchsparse-layout MinkUNet34-style UNet + Linear head."""

    def __init__(self, in_channels=4, base_channels=8,
                 encoder_channels=(8, 16, 24, 32),
                 decoder_channels=(32, 24, 16, 16),
                 encoder_blocks=(2, 2, 2, 2), decoder_blocks=(2, 2, 2, 2),
                 num_classes=5):
        super().__init__()
        enc = [base_channels] + list(encoder_channels)
        dec = [enc[-1]] + list(decoder_channels)
        self.backbone = nn.Module()
        self.backbone.conv_input = nn.ModuleList(
            [ConvModuleRef(in_channels, base_channels, 3),
             ConvModuleRef(base_channels, base_channels, 3)])
        self.backbone.encoder = nn.ModuleList()
        self.backbone.decoder = nn.ModuleList()
        n = len(encoder_channels)
        for i in range(n):
            layer = nn.ModuleList([ConvModuleRef(enc[i], enc[i], 2, 2)])
            cin = enc[i]
            for _ in range(encoder_blocks[i]):
                layer.append(BasicBlockRef(cin, enc[i + 1]))
                cin = enc[i + 1]
            self.backbone.encoder.append(layer)
        for i in range(n):
            up = ConvModuleRef(dec[i], dec[i + 1], 2, 2, transposed=True)
            blocks = nn.ModuleList()
            cin = dec[i + 1] + enc[-2 - i]
            for _ in range(decoder_blocks[i]):
                blocks.append(BasicBlockRef(cin, dec[i + 1]))
                cin = dec[i + 1]
            self.backbone.decoder.append(nn.ModuleList([up, blocks]))
        self.decode_head = nn.Module()
        self.decode_head.conv_seg = nn.Linear(dec[-1], num_classes)
        self.n = n

    def forward(self, x, mask):
        """x [B, C, D, H, W] dense voxel features; mask [B,1,D,H,W]."""
        bb = self.backbone
        for cm in bb.conv_input:
            x, mask = cm(x, mask)
        laterals = [(x, mask)]
        for i in range(self.n):
            x, mask = bb.encoder[i][0](x, mask)
            for blk in list(bb.encoder[i])[1:]:
                x, mask = blk(x, mask)
            if i < self.n - 1:
                laterals.append((x, mask))
        laterals = laterals[::-1]
        for i in range(self.n):
            tgt_x, tgt_m = laterals[i]
            x, mask = bb.decoder[i][0](x, mask, target_mask=tgt_m)
            x = torch.cat([x, tgt_x], 1)
            for blk in bb.decoder[i][1]:
                x, mask = blk(x, mask)
        logits = self.decode_head.conv_seg(
            x.permute(0, 2, 3, 4, 1))            # [B, D, H, W, K]
        return logits, mask
