"""Pack pipeline results into the fixed-shape device batch.

Ref: mmdet3d/datasets/transforms/formating.py:64-257 Pack3DDetInputs builds
``inputs`` + Det3DDataSample. The TPU build's contract is stricter: every
sample is padded to static capacities (num_points, max_gt) with validity
masks so batches stack into fixed-shape arrays for jit.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ...registry import TRANSFORMS


@TRANSFORMS.register_module()
class Pack3DDetInputs:
    def __init__(self, keys: Sequence[str] = (), num_points: int = 120000,
                 max_gt: int = 64, box_dim: int = 7,
                 max_gt_2d: int = 0,
                 mask_size: Sequence[int] = (),
                 meta_keys: Sequence[str] = (), **kw):
        self.num_points = num_points
        self.max_gt = max_gt
        self.box_dim = box_dim
        self.max_gt_2d = max_gt_2d   # >0 → pack per-camera 2D GT slots
        # (Hm, Wm) → also pack per-GT binary instance masks (nuImages
        # RLEs from the converter), nearest-downsampled to this shape
        self.mask_size = tuple(mask_size)
        self.meta_keys = list(meta_keys)

    def __call__(self, results: dict) -> dict:
        out = {}
        if 'points' in results:  # absent in image-only mono pipelines
            pts = np.asarray(results['points'], np.float32)
            P = self.num_points
            n = min(len(pts), P)
            points = np.zeros((P, pts.shape[1]), np.float32)
            points[:n] = pts[:n]
            mask = np.zeros((P,), bool)
            mask[:n] = True
            out = dict(points=points, points_mask=mask)
        if 'pts_semantic_mask' in results and 'points' in results:
            seg = np.full((P,), 255, np.int32)
            seg[:n] = np.asarray(results['pts_semantic_mask'],
                                 np.int32)[:n]
            out['pts_semantic_mask'] = seg
        gtb = results.get('gt_bboxes_3d')
        if gtb is not None:
            gtb = np.asarray(gtb, np.float32).reshape(-1, gtb.shape[-1]) \
                if np.size(gtb) else np.zeros((0, self.box_dim), np.float32)
            gtl = np.asarray(results.get('gt_labels_3d',
                                         np.zeros((0,), np.int64)))
            G = self.max_gt
            g = min(len(gtb), G)
            bd = max(self.box_dim, gtb.shape[1] if len(gtb) else 0)
            boxes = np.zeros((G, bd), np.float32)
            boxes[:g, :gtb.shape[1]] = gtb[:g]
            labels = np.zeros((G,), np.int32)
            labels[:g] = gtl[:g]
            gmask = np.zeros((G,), bool)
            gmask[:g] = True
            out.update(gt_bboxes_3d=boxes, gt_labels_3d=labels,
                       gt_mask=gmask)
        if 'img' in results and 'imgs' not in results:
            # mono-3D pipeline: one camera image + camera-frame GT
            # (ref Pack3DDetInputs keys=['img', 'gt_bboxes', ...,
            # 'centers_2d', 'depths'] in the SMOKE/PGD recipes)
            out['imgs'] = np.asarray(results['img'], np.float32)
            for k in ('cam2img', 'trans_mat'):
                if k in results:
                    out[k] = np.asarray(results[k], np.float32)
            G = self.max_gt
            for k, d in (('gt_bboxes', 4), ('centers_2d', 2)):
                if results.get(k) is not None:
                    v = np.asarray(results[k], np.float32).reshape(-1, d)
                    buf = np.zeros((G, d), np.float32)
                    buf[:min(len(v), G)] = v[:G]
                    out[k] = buf
            if results.get('depths') is not None:
                v = np.asarray(results['depths'], np.float32).ravel()
                buf = np.zeros((G,), np.float32)
                buf[:min(len(v), G)] = v[:G]
                out['depths'] = buf
        if 'imgs' in results:
            out['imgs'] = np.asarray(results['imgs'], np.float32)
            for k in ('cam2lidar', 'intrins', 'post_rots', 'post_trans',
                      'lidar2img'):
                if k in results:
                    out[k] = np.asarray(results[k], np.float32)
        if 'lidar_aug_matrix' in results:
            out['lidar_aug'] = np.asarray(results['lidar_aug_matrix'],
                                          np.float32)
        if self.max_gt_2d > 0 and 'anns_2d' in results:
            # padded per-camera 2D GT (StreamPETR aux 2D supervision):
            # [N_cam, G2, ...] + validity mask
            cams = results['anns_2d']
            N, G2 = len(cams), self.max_gt_2d
            b2 = np.zeros((N, G2, 4), np.float32)
            c2 = np.zeros((N, G2, 2), np.float32)
            d2 = np.zeros((N, G2), np.float32)
            l2 = np.zeros((N, G2), np.int32)
            m2 = np.zeros((N, G2), bool)
            for ci, anns in enumerate(cams):
                for gi, a in enumerate(anns[:G2]):
                    b2[ci, gi] = a['bbox']
                    c2[ci, gi] = a['center2d']
                    d2[ci, gi] = a.get('depth', 0.0)
                    l2[ci, gi] = a.get('bbox_label', 0)
                    m2[ci, gi] = True
            out.update(gt_bboxes_2d=b2, centers2d=c2, depths2d=d2,
                       gt_labels_2d=l2, gt_mask_2d=m2)
            if self.mask_size:
                Hm, Wm = self.mask_size
                seg = np.zeros((N, G2, Hm, Wm), np.uint8)
                for ci, anns in enumerate(cams):
                    for gi, a in enumerate(anns[:G2]):
                        rle = a.get('segmentation') or a.get('mask')
                        if rle is None:
                            continue
                        from ...utils.rle import mask_decode
                        m = mask_decode(rle)
                        # nearest downsample via index stride
                        yi = (np.arange(Hm) * m.shape[0] // Hm)
                        xi = (np.arange(Wm) * m.shape[1] // Wm)
                        seg[ci, gi] = m[yi[:, None], xi[None, :]]
                out['gt_masks_2d'] = seg
        meta = {k: results[k] for k in self.meta_keys if k in results}
        for k in ('sample_idx', 'token', 'lidar_path'):
            if k in results:
                meta[k] = results[k]
        out['metainfo'] = meta
        return out
