"""The remaining reference transform classes (VERDICT r1 item 6).

Host-side numpy implementations of the 14 transforms the round-1 build
lacked, covering the reference training recipes for mono (SMOKE/MonoFlex/
PGD), indoor (ScanNet/S3DIS), and LiDAR-seg (SemanticKITTI) models.
Refs: mmdet3d/datasets/transforms/transforms_3d.py — line numbers cited
per class. Conventions follow this repo's pipeline: 'points' is a plain
[P, C] float32 array, 'img' a single HWC image (mono pipelines),
'imgs_raw' the multi-view list; randomness comes from the shared
results['_rng'] generator.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from ...registry import TRANSFORMS
from ...structures import boxes3d as B
from .transforms_3d import _rng


def _affine_matrix(center, size, output_scale):
    """3-point affine solve (ref AffineResize._get_transform_matrix:1786
    via cv2.getAffineTransform)."""
    src_w = size[0]
    dst_w, dst_h = output_scale

    def ref3(p1, p2):
        d = p1 - p2
        return p2 + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + np.array([0, src_w * -0.5], np.float32)
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + np.array([0, dst_w * -0.5], np.float32)
    src[2] = ref3(src[0], src[1])
    dst[2] = ref3(dst[0], dst[1])
    # solve [x, y, 1] @ M.T = [x', y'] for the 2x3 matrix M
    A = np.concatenate([src, np.ones((3, 1), np.float32)], 1)
    M = np.linalg.solve(A, dst).T                    # [2, 3]
    return np.concatenate([M, [[0., 0., 1.]]]).astype(np.float32)


def _warp_affine(img, M, out_wh):
    import cv2
    return cv2.warpAffine(img, M[:2], tuple(int(v) for v in out_wh))


@TRANSFORMS.register_module()
class RandomShiftScale:
    """Record shift/scale for AffineResize (ref :1829-1886). Adds
    'center', 'size', 'affine_aug'."""

    def __init__(self, shift_scale: Tuple[float, float], aug_prob: float,
                 **kw):
        self.shift_scale = shift_scale
        self.aug_prob = aug_prob

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        img = results['img']
        h, w = img.shape[:2]
        center = np.array([w / 2, h / 2], np.float32)
        size = np.array([w, h], np.float32)
        if rng.random() < self.aug_prob:
            shift, scale = self.shift_scale
            shift_choices = np.arange(-shift, shift + 0.1, 0.1)
            center[0] += size[0] * rng.choice(shift_choices)
            center[1] += size[1] * rng.choice(shift_choices)
            scale_choices = np.arange(1 - scale, 1 + scale + 0.1, 0.1)
            size *= rng.choice(scale_choices)
            results['affine_aug'] = True
        else:
            results['affine_aug'] = False
        results['center'] = center
        results['size'] = size
        return results


@TRANSFORMS.register_module()
class AffineResize:
    """Affine-resize image + 2D/3D annotations to a fixed size, recording
    the feature-map transform matrix (ref :1629-1826; the SMOKE/MonoFlex
    input pipeline)."""

    def __init__(self, img_scale: Tuple[int, int], down_ratio: int,
                 bbox_clip_border: bool = True, **kw):
        self.img_scale = tuple(img_scale)
        self.down_ratio = down_ratio
        self.bbox_clip_border = bbox_clip_border

    @staticmethod
    def _apply(points, M):
        hom = np.concatenate(
            [points, np.ones((len(points), 1), np.float32)], 1)
        return (hom @ M.T)[:, :2]

    def __call__(self, results: dict) -> dict:
        img = results['img']
        if 'center' not in results:
            h, w = img.shape[:2]
            center = np.array([w / 2, h / 2], np.float32)
            size = np.array([w, h], np.float32)
            results['affine_aug'] = False
        else:
            center, size = results['center'], results['size']
        M = _affine_matrix(center, size, self.img_scale)
        results['img'] = _warp_affine(img, M, self.img_scale)
        results['img_shape'] = results['img'].shape
        if isinstance(self.down_ratio, tuple):
            results['trans_mat'] = [
                _affine_matrix(center, size, (self.img_scale[0] // r,
                                              self.img_scale[1] // r))
                for r in self.down_ratio]
        else:
            results['trans_mat'] = _affine_matrix(
                center, size, (self.img_scale[0] // self.down_ratio,
                               self.img_scale[1] // self.down_ratio))
        if results.get('gt_bboxes') is not None \
                and len(results['gt_bboxes']):
            bb = np.asarray(results['gt_bboxes'], np.float32)
            bb[:, :2] = self._apply(bb[:, :2], M)
            bb[:, 2:] = self._apply(bb[:, 2:], M)
            if self.bbox_clip_border:
                bb[:, [0, 2]] = bb[:, [0, 2]].clip(0, self.img_scale[0] - 1)
                bb[:, [1, 3]] = bb[:, [1, 3]].clip(0, self.img_scale[1] - 1)
            results['gt_bboxes'] = bb
        if results.get('centers_2d') is not None \
                and len(results['centers_2d']):
            c2d = self._apply(np.asarray(results['centers_2d'], np.float32),
                              M)
            keep = ((c2d[:, 0] > 0) & (c2d[:, 0] < self.img_scale[0])
                    & (c2d[:, 1] > 0) & (c2d[:, 1] < self.img_scale[1]))
            results['centers_2d'] = c2d[keep]
            for k in ('gt_bboxes', 'gt_bboxes_labels', 'gt_bboxes_3d',
                      'gt_labels_3d', 'depths'):
                if results.get(k) is not None and len(results[k]):
                    results[k] = np.asarray(results[k])[keep]
        return results


@TRANSFORMS.register_module()
class Resize3D:
    """Resize image + 2D anns; scales cam2img accordingly
    (ref :1889-1915)."""

    def __init__(self, scale=None, scale_factor=None, keep_ratio=True, **kw):
        self.scale = scale
        self.scale_factor = scale_factor
        self.keep_ratio = keep_ratio

    def _resize(self, results, sw, sh):
        import cv2
        img = results['img']
        h, w = img.shape[:2]
        nw, nh = int(w * sw + 0.5), int(h * sh + 0.5)
        results['img'] = cv2.resize(img, (nw, nh))
        results['img_shape'] = results['img'].shape
        results['scale_factor'] = (sw, sh)
        if results.get('gt_bboxes') is not None \
                and len(results['gt_bboxes']):
            bb = np.asarray(results['gt_bboxes'], np.float32)
            bb *= np.array([sw, sh, sw, sh], np.float32)
            results['gt_bboxes'] = bb
        if results.get('centers_2d') is not None \
                and len(results['centers_2d']):
            results['centers_2d'] = np.asarray(
                results['centers_2d'], np.float32) * np.array(
                    [sw, sh], np.float32)
        cam2img = np.array(results['cam2img'], np.float32)
        cam2img[0] *= sw
        cam2img[1] *= sh
        results['cam2img'] = cam2img
        return results

    def __call__(self, results: dict) -> dict:
        h, w = results['img'].shape[:2]
        scale = results.get('scale', self.scale)
        if scale is not None:
            tw, th = scale
            if self.keep_ratio:
                s = min(tw / w, th / h)
                sw = sh = s
            else:
                sw, sh = tw / w, th / h
        else:
            sf = self.scale_factor
            sw, sh = (sf, sf) if np.isscalar(sf) else sf[:2]
        return self._resize(results, sw, sh)


@TRANSFORMS.register_module()
class RandomResize3D(Resize3D):
    """Randomly sample the target scale, then Resize3D (ref :1918-1954)."""

    def __init__(self, scale=None, ratio_range=None, keep_ratio=True, **kw):
        super().__init__(scale=scale, keep_ratio=keep_ratio)
        self.ratio_range = ratio_range

    def __call__(self, results: dict) -> dict:
        if 'scale' not in results:
            rng = _rng(results)
            if self.ratio_range is not None:
                r = rng.uniform(*self.ratio_range)
                base = self.scale
                results['scale'] = (int(base[0] * r), int(base[1] * r))
            elif isinstance(self.scale, (list, tuple)) \
                    and isinstance(self.scale[0], (list, tuple)):
                results['scale'] = tuple(
                    self.scale[rng.integers(len(self.scale))])
            else:
                results['scale'] = tuple(self.scale)
        return super().__call__(results)


@TRANSFORMS.register_module()
class RandomCrop3D:
    """Random image crop with cam2img principal-point correction
    (ref :1957-2162); reuses a predefined 'crop_size'/'img_crop_offset'
    when present (multi-view consistency)."""

    def __init__(self, crop_size: tuple, crop_type: str = 'absolute',
                 allow_negative_crop: bool = False,
                 bbox_clip_border: bool = True,
                 rel_offset_h: tuple = (0., 1.),
                 rel_offset_w: tuple = (0., 1.), **kw):
        self.crop_size = crop_size
        self.crop_type = crop_type
        self.allow_negative_crop = allow_negative_crop
        self.bbox_clip_border = bbox_clip_border
        self.rel_offset_h = rel_offset_h
        self.rel_offset_w = rel_offset_w

    def _get_crop_size(self, image_size, rng):
        h, w = image_size
        if self.crop_type == 'absolute':
            return (min(int(self.crop_size[0]), h),
                    min(int(self.crop_size[1]), w))
        if self.crop_type == 'relative':
            ch, cw = self.crop_size
            return (int(h * ch + 0.5), int(w * cw + 0.5))
        if self.crop_type == 'relative_range':
            ch = rng.uniform(self.crop_size[0], 1.0)
            cw = rng.uniform(self.crop_size[1], 1.0)
            return (int(h * ch + 0.5), int(w * cw + 0.5))
        # absolute_range
        ch = rng.integers(min(self.crop_size[0], h),
                          min(self.crop_size[1], h) + 1)
        cw = rng.integers(min(self.crop_size[0], w),
                          min(self.crop_size[1], w) + 1)
        return (int(ch), int(cw))

    def __call__(self, results: dict) -> Optional[dict]:
        rng = _rng(results)
        img = results['img']
        if 'crop_size' not in results:
            results['crop_size'] = self._get_crop_size(img.shape[:2], rng)
        ch, cw = results['crop_size']
        if 'img_crop_offset' not in results:
            mh = max(img.shape[0] - ch, 0)
            mw = max(img.shape[1] - cw, 0)
            oh = int(rng.integers(int(self.rel_offset_h[0] * mh),
                                  int(self.rel_offset_h[1] * mh) + 1))
            ow = int(rng.integers(int(self.rel_offset_w[0] * mw),
                                  int(self.rel_offset_w[1] * mw) + 1))
            results['img_crop_offset'] = [ow, oh]
        else:
            ow, oh = results['img_crop_offset']
        ch = min(ch, img.shape[0])
        cw = min(cw, img.shape[1])
        results['img'] = img[oh:oh + ch, ow:ow + cw]
        results['img_shape'] = results['img'].shape
        if results.get('gt_bboxes') is not None \
                and len(results['gt_bboxes']):
            bb = np.asarray(results['gt_bboxes'], np.float32) - np.array(
                [ow, oh, ow, oh], np.float32)
            if self.bbox_clip_border:
                bb[:, 0::2] = bb[:, 0::2].clip(0, cw)
                bb[:, 1::2] = bb[:, 1::2].clip(0, ch)
            keep = (bb[:, 2] > bb[:, 0]) & (bb[:, 3] > bb[:, 1])
            if not keep.any() and not self.allow_negative_crop:
                return None
            results['gt_bboxes'] = bb[keep]
            for k in ('gt_bboxes_labels', 'gt_bboxes_3d', 'gt_labels_3d',
                      'centers_2d', 'depths'):
                if results.get(k) is not None and len(results[k]):
                    results[k] = np.asarray(results[k])[keep]
            if results.get('centers_2d') is not None \
                    and len(results['centers_2d']):
                results['centers_2d'] = results['centers_2d'] - np.array(
                    [ow, oh], np.float32)
        if 'cam2img' in results and not isinstance(results['cam2img'], list):
            c = np.array(results['cam2img'], np.float32)
            K = c[:3, :3].copy()
            T = np.linalg.inv(K) @ c[:3]
            K[0, 2] -= ow
            K[1, 2] -= oh
            off = K @ T
            c[:off.shape[0], :off.shape[1]] = off
            results['cam2img'] = c
        return results


@TRANSFORMS.register_module()
class PhotoMetricDistortion3D:
    """Photometric distortion with reusable randomness (ref :2175-2266 on
    mmdet PhotoMetricDistortion): brightness, contrast (mode 0/1), HSV
    saturation/hue, channel swap — each with prob 0.5."""

    def __init__(self, brightness_delta: int = 32,
                 contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
                 hue_delta: int = 18, **kw):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    def _random_flags(self, rng):
        return (int(rng.integers(2)), int(rng.integers(2)),
                int(rng.integers(2)), int(rng.integers(2)),
                int(rng.integers(2)), int(rng.integers(2)),
                float(rng.uniform(-self.brightness_delta,
                                  self.brightness_delta)),
                float(rng.uniform(self.contrast_lower, self.contrast_upper)),
                float(rng.uniform(self.saturation_lower,
                                  self.saturation_upper)),
                float(rng.uniform(-self.hue_delta, self.hue_delta)),
                tuple(rng.permutation(3).tolist()))

    def __call__(self, results: dict) -> dict:
        import cv2
        rng = _rng(results)
        img = results['img'].astype(np.float32)
        if 'photometric_param' not in results:
            results['photometric_param'] = self._random_flags(rng)
        (mode, b_flag, c_flag, s_flag, h_flag, sw_flag, delta, alpha,
         sat, hue, swap) = results['photometric_param']
        if b_flag:
            img += delta
        if mode == 0 and c_flag:
            img *= alpha
        if s_flag or h_flag:
            hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                               cv2.COLOR_BGR2HSV).astype(np.float32)
            if s_flag:
                hsv[..., 1] *= sat
            if h_flag:
                hsv[..., 0] = (hsv[..., 0] + hue) % 180
            hsv[..., 1] = np.clip(hsv[..., 1], 0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8),
                               cv2.COLOR_HSV2BGR).astype(np.float32)
        if mode == 1 and c_flag:
            img *= alpha
        if sw_flag:
            img = img[..., list(swap)]
        results['img'] = img
        return results


@TRANSFORMS.register_module()
class MultiViewWrapper:
    """Run single-view transforms per camera with shared randomness
    (ref :2269-2370). Operates on this repo's 'imgs_raw' list plus listed
    calib fields."""

    def __init__(self, transforms: Sequence[dict],
                 override_aug_config: bool = True,
                 process_fields=('img', 'cam2img', 'lidar2cam'),
                 collected_keys=('scale', 'scale_factor', 'crop_size',
                                 'img_crop_offset', 'img_shape'),
                 randomness_keys=('scale', 'scale_factor', 'crop_size',
                                  'img_crop_offset', 'photometric_param'),
                 **kw):
        from ..det3d_dataset import compose
        self.transforms = compose(transforms)
        self.override = override_aug_config
        self.process_fields = list(process_fields)
        self.collected = list(collected_keys)
        self.random_keys = list(randomness_keys)

    def __call__(self, results: dict) -> dict:
        imgs = results.get('imgs_raw', results.get('img'))
        n = len(imgs)
        collected = {k: [] for k in self.collected}
        prev = {}
        for i in range(n):
            sub = {'_rng': _rng(results)}
            if i != 0 and self.override:
                for k in self.random_keys:
                    if k in prev:
                        sub[k] = prev[k]
            sub['img'] = imgs[i]
            for k in self.process_fields:
                if k == 'img':
                    continue
                if k in results:
                    sub[k] = np.asarray(results[k][i])
            sub = self.transforms(sub)
            prev = sub
            imgs[i] = sub['img']
            for k in self.process_fields:
                if k != 'img' and k in sub and k in results:
                    results[k][i] = sub[k]
            for k in self.collected:
                if k in sub:
                    collected[k].append(sub[k])
        results['imgs_raw'] = imgs
        for k, v in collected.items():
            if v:
                results[k] = v
        return results


@TRANSFORMS.register_module()
class GlobalAlignment:
    """Rotate/translate the scene by the dataset's axis_align_matrix
    (ref :543-630; ScanNet detection GT is axis-aligned)."""

    def __init__(self, rotation_axis: int, **kw):
        self.rotation_axis = rotation_axis

    def __call__(self, results: dict) -> dict:
        m = np.asarray(results['axis_align_matrix'], np.float32)
        assert m.shape == (4, 4)
        rot, trans = m[:3, :3], m[:3, 3]
        valid = np.zeros(3)
        valid[self.rotation_axis] = 1
        assert np.allclose(np.linalg.det(rot), 1.0, atol=1e-4)
        assert np.allclose(rot[self.rotation_axis], valid, atol=1e-5)
        pts = np.asarray(results['points'], np.float32).copy()
        pts[:, :3] = pts[:, :3] @ rot.T + trans
        results['points'] = pts
        return results


@TRANSFORMS.register_module()
class RandomJitterPoints:
    """Per-point gaussian jitter for seg training (ref :260-326)."""

    def __init__(self, jitter_std=(0.01, 0.01, 0.01),
                 clip_range=(-0.05, 0.05), **kw):
        if np.isscalar(jitter_std):
            jitter_std = [jitter_std] * 3
        self.jitter_std = np.asarray(jitter_std, np.float32)
        if clip_range is not None and np.isscalar(clip_range):
            clip_range = [-clip_range, clip_range]
        self.clip_range = clip_range

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        pts = np.asarray(results['points'], np.float32).copy()
        noise = rng.standard_normal((len(pts), 3)).astype(np.float32) \
            * self.jitter_std[None]
        if self.clip_range is not None:
            noise = np.clip(noise, self.clip_range[0], self.clip_range[1])
        pts[:, :3] += noise
        results['points'] = pts
        return results


@TRANSFORMS.register_module()
class RandomDropPointsColor:
    """Zero point colors with prob drop_ratio (ref :25-71; PAConv seg
    recipe). color_dims: column indices of the color channels (the repo
    stores points as plain arrays; indoor loaders put RGB at 3:6)."""

    def __init__(self, drop_ratio: float = 0.2,
                 color_dims: Sequence[int] = (3, 4, 5), **kw):
        self.drop_ratio = drop_ratio
        self.color_dims = list(color_dims)

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        # keep the reference's inverted-comparison quirk (:60-63)
        if rng.random() > 1.0 - self.drop_ratio:
            pts = np.asarray(results['points'], np.float32).copy()
            pts[:, self.color_dims] = 0.0
            results['points'] = pts
        return results


@TRANSFORMS.register_module()
class BackgroundPointsFilter:
    """Drop background points in the enlarged-box shell around GT
    (ref :1417-1478)."""

    def __init__(self, bbox_enlarge_range, **kw):
        if np.isscalar(bbox_enlarge_range):
            bbox_enlarge_range = [bbox_enlarge_range] * 3
        self.enlarge = np.asarray(bbox_enlarge_range, np.float32)

    def __call__(self, results: dict) -> dict:
        pts = np.asarray(results['points'], np.float32)
        gtb = np.asarray(results['gt_bboxes_3d'], np.float32)
        if not len(gtb):
            return results
        g = gtb[:, :7].copy()
        g[:, 2] += g[:, 5] / 2                 # bottom → gravity center
        ge = g.copy()
        ge[:, 3:6] += self.enlarge[None]
        fg = B.points_in_rbbox(pts[:, :3], g, origin=(0.5, 0.5, 0.5)) \
            .max(1)
        fge = B.points_in_rbbox(pts[:, :3], ge, origin=(0.5, 0.5, 0.5)) \
            .max(1)
        keep = ~(~fg & fge)
        results['points'] = pts[keep]
        for k in ('pts_instance_mask', 'pts_semantic_mask'):
            if results.get(k) is not None:
                results[k] = np.asarray(results[k])[keep]
        return results


@TRANSFORMS.register_module()
class VoxelBasedPointSampler:
    """Voxel-downsample current/previous sweeps to fixed budgets
    (ref :1482-1626). cfg dicts: voxel_size, point_cloud_range,
    max_num_points (per voxel), max_voxels."""

    def __init__(self, cur_sweep_cfg: dict,
                 prev_sweep_cfg: Optional[dict] = None,
                 time_dim: int = 3, **kw):
        self.cur = dict(cur_sweep_cfg)
        self.prev = dict(prev_sweep_cfg) if prev_sweep_cfg else None
        self.time_dim = time_dim

    @staticmethod
    def _voxel_sample(pts, cfg, rng):
        """First-come-first-served hard voxelize, 1 pt/voxel typical."""
        vs = np.asarray(cfg['voxel_size'], np.float32)
        pcr = np.asarray(cfg['point_cloud_range'], np.float32)
        mp = int(cfg['max_num_points'])
        mv = int(cfg['max_voxels'])
        c = np.floor((pts[:, :3] - pcr[:3]) / vs).astype(np.int64)
        grid = np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int64)
        ok = np.all((c >= 0) & (c < grid[None]), 1)
        lin = (c[:, 2] * grid[1] + c[:, 1]) * grid[0] + c[:, 0]
        out, counts = [], {}
        for i in np.nonzero(ok)[0]:
            key = lin[i]
            n = counts.get(key, 0)
            if n == 0 and len(counts) >= mv:
                continue
            if n < mp:
                counts[key] = n + 1
                out.append(pts[i])
        if not out:
            return pts[:1].repeat(mv * mp, 0)
        out = np.stack(out)
        need = mv * mp - len(out)
        if need > 0:
            out = np.concatenate([out, np.broadcast_to(
                out[:1], (need, out.shape[1]))], 0)
        return out

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        pts = np.asarray(results['points'], np.float32)
        extra = [pts]
        fields = []
        for k in ('pts_instance_mask', 'pts_semantic_mask'):
            if results.get(k) is not None:
                fields.append((k, pts.shape[1] + len(fields)))
                extra.append(np.asarray(results[k], np.float32)[:, None])
        merged = np.concatenate(extra, -1)
        cur_flag = merged[:, self.time_dim] == 0
        cur = merged[cur_flag]
        prev = merged[~cur_flag]
        if len(prev) == 0:
            prev = cur
        rng.shuffle(cur)
        rng.shuffle(prev)
        cur = self._voxel_sample(cur, self.cur, rng)
        if self.prev is not None:
            prev = self._voxel_sample(prev, self.prev, rng)
            merged = np.concatenate([cur, prev], 0)
        else:
            merged = cur
        results['points'] = merged[:, :pts.shape[1]]
        for k, d in fields:
            results[k] = merged[:, d]
        return results


@TRANSFORMS.register_module()
class IndoorPatchPointSample:
    """Sample num_points within a random valid block patch (ref
    :1157-1410; the PointNet++/ScanNet seg sampler)."""

    def __init__(self, num_points: int, block_size: float = 1.5,
                 ignore_index: Optional[int] = None,
                 use_normalized_coord: bool = False, num_try: int = 10,
                 enlarge_size: float = 0.2,
                 min_unique_num: Optional[int] = None,
                 eps: float = 1e-2, **kw):
        self.num_points = num_points
        self.block_size = block_size
        self.ignore_index = ignore_index
        self.use_normalized_coord = use_normalized_coord
        self.num_try = num_try
        self.enlarge_size = enlarge_size or 0.0
        self.min_unique_num = min_unique_num
        self.eps = eps

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        pts = np.asarray(results['points'], np.float32)
        sem = np.asarray(results['pts_semantic_mask'])
        coords = pts[:, :3]
        cmax, cmin = coords.max(0), coords.min(0)
        point_idxs = np.arange(len(pts))
        cur_center = coords[0]
        for _ in range(self.num_try):
            cur_center = coords[rng.integers(len(coords))]
            half = np.array([self.block_size / 2, self.block_size / 2, 0.0])
            lo = cur_center - half
            hi = cur_center + half
            lo[2], hi[2] = cmin[2], cmax[2]
            sel = np.all((coords >= lo - self.enlarge_size)
                         & (coords <= hi + self.enlarge_size), 1)
            if not sel.any():
                continue
            cc = coords[sel]
            csem = sem[sel]
            point_idxs = np.nonzero(sel)[0]
            inner = np.all((cc >= lo - self.eps) & (cc <= hi + self.eps), 1)
            if self.min_unique_num is None:
                vidx = np.ceil((cc[inner] - lo) / np.maximum(hi - lo, 1e-6)
                               * np.array([31.0, 31.0, 62.0]))
                vidx = np.unique(vidx[:, 0] * 31 * 62 + vidx[:, 1] * 62
                                 + vidx[:, 2])
                flag1 = len(vidx) / 31.0 / 31.0 / 62.0 >= 0.02
            else:
                flag1 = inner.sum() >= self.min_unique_num
            flag2 = True if self.ignore_index is None else \
                (csem != self.ignore_index).sum() / len(csem) >= 0.7
            if flag1 and flag2:
                break
        if len(point_idxs) >= self.num_points:
            choices = rng.choice(point_idxs, self.num_points, replace=False)
        else:
            dup = rng.choice(len(point_idxs),
                             self.num_points - len(point_idxs))
            choices = point_idxs[np.concatenate(
                [np.arange(len(point_idxs)), dup])]
        sel_coords = coords[choices].copy()
        attrs = pts[choices, 3:]
        centered = sel_coords.copy()
        centered[:, 0] -= cur_center[0]
        centered[:, 1] -= cur_center[1]
        if self.use_normalized_coord:
            attrs = np.concatenate(
                [attrs, sel_coords / np.maximum(cmax, 1e-6)], 1)
        results['points'] = np.concatenate([centered, attrs],
                                           1).astype(np.float32)
        results['pts_semantic_mask'] = sem[choices]
        if results.get('pts_instance_mask') is not None:
            results['pts_instance_mask'] = np.asarray(
                results['pts_instance_mask'])[choices]
        return results


def _fetch_mix_sample(results, pre_transform):
    """Draw another sample from the dataset handle for Polar/LaserMix."""
    dataset = results['dataset']
    idx = int(_rng(results).integers(len(dataset)))
    mix = dataset.get_data_info(idx)
    if pre_transform is not None:
        mix['dataset'] = dataset
        mix['_rng'] = _rng(results)
        mix = pre_transform(mix)
        mix.pop('dataset', None)
    return mix


@TRANSFORMS.register_module()
class PolarMix:
    """Swap azimuth sectors between two clouds + rotate-paste instance
    classes (ref :2373-2537; SemanticKITTI seg recipe)."""

    def __init__(self, instance_classes: List[int], swap_ratio: float = 0.5,
                 rotate_paste_ratio: float = 1.0,
                 pre_transform: Optional[Sequence[dict]] = None,
                 prob: float = 1.0, **kw):
        self.instance_classes = list(instance_classes)
        self.swap_ratio = swap_ratio
        self.rotate_paste_ratio = rotate_paste_ratio
        self.prob = prob
        if pre_transform is None:
            self.pre_transform = None
        else:
            from ..det3d_dataset import compose
            self.pre_transform = compose(pre_transform)

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        if rng.random() > self.prob:
            return results
        mix = _fetch_mix_sample(results, self.pre_transform)
        pts = np.asarray(results['points'], np.float32)
        sem = np.asarray(results['pts_semantic_mask'])
        mpts = np.asarray(mix['points'], np.float32)
        msem = np.asarray(mix['pts_semantic_mask'])
        if rng.random() < self.swap_ratio:
            start = (rng.random() - 1) * np.pi
            end = start + np.pi
            yaw = -np.arctan2(pts[:, 1], pts[:, 0])
            myaw = -np.arctan2(mpts[:, 1], mpts[:, 0])
            idx = (yaw <= start) | (yaw >= end)
            midx = (myaw > start) & (myaw < end)
            pts = np.concatenate([pts[idx], mpts[midx]], 0)
            sem = np.concatenate([sem[idx], msem[midx]], 0)
        if rng.random() < self.rotate_paste_ratio:
            inst = np.isin(msem, self.instance_classes)
            ipts, isem = mpts[inst], msem[inst]
            copies_p, copies_s = [ipts], [isem]
            for ang in (rng.random() * np.pi * 2 / 3,
                        (rng.random() + 1) * np.pi * 2 / 3):
                c, s = np.cos(ang), np.sin(ang)
                R = np.array([[c, s], [-s, c]], np.float32)
                rp = ipts.copy()
                rp[:, :2] = rp[:, :2] @ R
                copies_p.append(rp)
                copies_s.append(isem)
            pts = np.concatenate([pts] + copies_p, 0)
            sem = np.concatenate([sem] + copies_s, 0)
        results['points'] = pts
        results['pts_semantic_mask'] = sem
        return results


@TRANSFORMS.register_module()
class LaserMix:
    """Interleave pitch-angle bands of two clouds (ref :2540-2676)."""

    def __init__(self, num_areas: List[int],
                 pitch_angles: Sequence[float],
                 pre_transform: Optional[Sequence[dict]] = None,
                 prob: float = 1.0, **kw):
        self.num_areas = list(num_areas)
        assert len(pitch_angles) == 2 and pitch_angles[1] > pitch_angles[0]
        self.pitch_angles = pitch_angles
        self.prob = prob
        if pre_transform is None:
            self.pre_transform = None
        else:
            from ..det3d_dataset import compose
            self.pre_transform = compose(pre_transform)

    def __call__(self, results: dict) -> dict:
        rng = _rng(results)
        if rng.random() > self.prob:
            return results
        mix = _fetch_mix_sample(results, self.pre_transform)
        pts = np.asarray(results['points'], np.float32)
        sem = np.asarray(results['pts_semantic_mask'])
        mpts = np.asarray(mix['points'], np.float32)
        msem = np.asarray(mix['pts_semantic_mask'])
        lo = self.pitch_angles[0] / 180 * np.pi
        hi = self.pitch_angles[1] / 180 * np.pi

        def pitch(p):
            rho = np.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)
            return np.clip(np.arctan2(p[:, 2], rho), lo + 1e-5, hi - 1e-5)

        pit, mpit = pitch(pts), pitch(mpts)
        n = int(rng.choice(self.num_areas))
        angles = np.linspace(hi, lo, n + 1)
        out_p, out_s = [], []
        for i in range(n):
            s, e = angles[i + 1], angles[i]
            if i % 2 == 0:
                m = (pit > s) & (pit <= e)
                out_p.append(pts[m])
                out_s.append(sem[m])
            else:
                m = (mpit > s) & (mpit <= e)
                out_p.append(mpts[m])
                out_s.append(msem[m])
        results['points'] = np.concatenate(out_p, 0)
        results['pts_semantic_mask'] = np.concatenate(out_s, 0)
        return results


@TRANSFORMS.register_module()
class PointSegClassMapping:
    """Map raw semantic ids → contiguous train ids using the dataset's
    ``seg_label_mapping`` (ref loading.py PointSegClassMapping);
    out-of-table ids → 255 (ignore)."""

    def __call__(self, results: dict) -> dict:
        m = np.asarray(results['seg_label_mapping'], np.int64)
        seg = np.asarray(results['pts_semantic_mask']).astype(np.int64)
        out = np.full(seg.shape, 255, np.int64)
        ok = (seg >= 0) & (seg < len(m))
        out[ok] = m[seg[ok]]
        results['pts_semantic_mask'] = out
        return results
