"""Camera-branch transforms.

Refs: projects/BEVFusion/bevfusion/transforms_3d.py — ImageAug3D:13
(per-camera resize/crop/flip/rotate with ground-aware crop height,
accumulating a 4×4 ``img_aug_matrix``), GridMask:205; loading.py:14
BEVLoadMultiViewImageFromFiles (adds lidar2img / cam2lidar stacks).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ...registry import TRANSFORMS


def _imread(path):
    try:
        from PIL import Image
        return np.asarray(Image.open(path).convert('RGB'), np.uint8)
    except ImportError:
        import matplotlib.image as mpimg
        img = mpimg.imread(path)
        if img.dtype.kind == 'f':
            img = (img * 255).astype(np.uint8)
        return img[..., :3]


def _resize_bilinear(img, out_hw):
    H, W = img.shape[:2]
    h, w = out_hw
    ys = np.linspace(0, H - 1, h)
    xs = np.linspace(0, W - 1, w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    im = img.astype(np.float32)
    out = (im[y0][:, x0] * (1 - wy) * (1 - wx)
           + im[y0][:, x1] * (1 - wy) * wx
           + im[y1][:, x0] * wy * (1 - wx)
           + im[y1][:, x1] * wy * wx)
    return out


@TRANSFORMS.register_module()
class BEVLoadMultiViewImageFromFiles:
    """Load N camera images + calibration stacks (ref loading.py:14-208)."""

    def __init__(self, to_float32: bool = True, color_type='unchanged',
                 num_views: int = 6, **kw):
        self.num_views = num_views

    def __call__(self, results: dict) -> dict:
        paths = results.get('img_paths', [])[:self.num_views]
        imgs = [_imread(p) for p in paths]
        results['imgs_raw'] = imgs
        for k in ('lidar2img', 'cam2lidar', 'cam2img'):
            if k in results:
                results[k] = np.stack(
                    [np.asarray(m, np.float32) for m in results[k]][
                        :self.num_views], 0)
        return results


@TRANSFORMS.register_module()
class ImageAug3D:
    """Resize/crop/flip/rotate each camera image, accumulating the 4×4
    img_aug_matrix (ref transforms_3d.py:13-129). Output: imgs
    [N, final_h, final_w, 3] float32 normalized, post_rots/post_trans for
    the view transform."""

    def __init__(self, final_dim: Tuple[int, int] = (256, 704),
                 resize_lim=(0.48, 0.48), bot_pct_lim=(0.0, 0.0),
                 rot_lim=(0.0, 0.0), rand_flip: bool = False,
                 is_train: bool = False,
                 mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375), **kw):
        self.final_dim = tuple(final_dim)
        self.resize_lim = resize_lim
        self.bot_pct_lim = bot_pct_lim
        self.rot_lim = rot_lim
        self.rand_flip = rand_flip
        self.is_train = is_train
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, results: dict) -> dict:
        rng = results.setdefault('_rng', np.random.default_rng())
        fH, fW = self.final_dim
        imgs, post_rots, post_trans = [], [], []
        for img in results['imgs_raw']:
            H, W = img.shape[:2]
            if self.is_train:
                resize = rng.uniform(*self.resize_lim)
                bot = rng.uniform(*self.bot_pct_lim)
                flip = self.rand_flip and rng.uniform() < 0.5
            else:
                resize = np.mean(self.resize_lim)
                bot = np.mean(self.bot_pct_lim)
                flip = False
            newW, newH = int(W * resize), int(H * resize)
            crop_h = int((1 - bot) * newH) - fH
            crop_w = max(0, int((newW - fW) / 2))
            im = _resize_bilinear(img, (newH, newW))
            crop_h = max(0, crop_h)
            im = im[crop_h:crop_h + fH, crop_w:crop_w + fW]
            # pad if short
            ph, pw = fH - im.shape[0], fW - im.shape[1]
            if ph > 0 or pw > 0:
                im = np.pad(im, ((0, max(ph, 0)), (0, max(pw, 0)), (0, 0)))
            if flip:
                im = im[:, ::-1]
            im = (im - self.mean) / self.std
            imgs.append(im.astype(np.float32))
            # aug matrix: pixel_final = R @ pixel_orig + t
            R = np.eye(3, dtype=np.float32) * resize
            R[2, 2] = 1.0
            t = np.asarray([-crop_w, -crop_h, 0], np.float32)
            if flip:
                F = np.diag([-1.0, 1.0, 1.0]).astype(np.float32)
                R = F @ R
                t = F @ t + np.asarray([fW - 1, 0, 0], np.float32)
            post_rots.append(R)
            post_trans.append(t)
        results['imgs'] = np.stack(imgs, 0)
        results['post_rots'] = np.stack(post_rots, 0)
        results['post_trans'] = np.stack(post_trans, 0)
        # compose aug into lidar2img so depth projection stays consistent
        if 'lidar2img' in results:
            A = np.tile(np.eye(4, dtype=np.float32),
                        (len(post_rots), 1, 1))
            A[:, :3, :3] = results['post_rots']
            A[:, :3, 3] = results['post_trans']
            results['lidar2img'] = A @ results['lidar2img']
        if 'cam2lidar' in results and 'cam2img' in results:
            results['intrins'] = results['cam2img'][:, :3, :3]
        return results


@TRANSFORMS.register_module()
class GridMask:
    """Structured grid dropout on images (ref transforms_3d.py:205-288)."""

    def __init__(self, use_h=True, use_w=True, ratio=0.5, prob=0.7,
                 max_epoch=1, **kw):
        self.ratio = ratio
        self.prob = prob

    def __call__(self, results: dict) -> dict:
        rng = results.setdefault('_rng', np.random.default_rng())
        if rng.uniform() > self.prob or 'imgs' not in results:
            return results
        imgs = results['imgs']
        H, W = imgs.shape[1:3]
        d = int(rng.integers(min(H, W) // 8, min(H, W) // 3))
        mask = np.ones((H, W), np.float32)
        keep = int(d * self.ratio)
        for y in range(0, H, d):
            mask[y + keep:y + d, :] = 0
        for x in range(0, W, d):
            mask[:, x + keep:x + d] = 0
        results['imgs'] = imgs * mask[None, :, :, None]
        return results
