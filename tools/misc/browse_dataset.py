#!/usr/bin/env python
"""Render dataset samples after the training pipeline, for pipeline
debugging (ref: tools/misc/browse_dataset.py — there an Open3D window,
here headless BEV/image renders per sample).

Usage: python tools/misc/browse_dataset.py CONFIG [--out-dir browse_out]
       [--num-samples 5] [--task det|seg|mono_det]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--out-dir', default='browse_out')
    p.add_argument('--num-samples', type=int, default=5)
    p.add_argument('--task', default='det',
                   choices=['det', 'seg', 'mono_det'])
    args = p.parse_args()

    import numpy as np
    import tpu_bev3d.datasets  # noqa: F401 — register datasets
    from tpu_bev3d.config import Config
    from tpu_bev3d.registry import DATASETS
    from tpu_bev3d.visualization import Det3DVisualizer

    cfg = Config.fromfile(args.config)
    ds_cfg = dict(cfg.train_dataloader['dataset']) \
        if 'train_dataloader' in cfg else dict(cfg.train_dataset)
    ds = DATASETS.build(ds_cfg)
    classes = list(getattr(ds, 'classes', cfg.get('class_names', [])))
    vis = Det3DVisualizer(classes=classes)
    os.makedirs(args.out_dir, exist_ok=True)
    pcr = cfg.model.get('point_cloud_range', (-54, -54, -5, 54, 54, 3))

    n = min(args.num_samples, len(ds))
    for i in range(n):
        s = ds[i]
        if args.task == 'seg':
            out = vis.draw_seg_mask(
                np.asarray(s['points'])[:, :3],
                np.asarray(s['pts_semantic_mask']),
                out_file=os.path.join(args.out_dir, f'sample_{i}.png'),
                pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
        elif args.task == 'mono_det' or 'points' not in s:
            import matplotlib
            matplotlib.use('Agg')
            img = np.asarray(s['imgs'])
            img = img[0] if img.ndim == 4 else img
            gtm = np.asarray(s.get('gt_mask', []))
            boxes = np.asarray(s.get('gt_bboxes_3d', np.zeros((0, 7))))
            if gtm.size:
                boxes = boxes[gtm.astype(bool)]
            K = np.asarray(s.get('cam2img', np.eye(4)), np.float32)
            out = vis.draw_proj_bboxes_on_image(
                (img - img.min()) / max(img.ptp(), 1e-6),
                boxes[:, :7], K[:3] if K.shape[0] >= 3 else K,
                box_frame='camera',
                out_file=os.path.join(args.out_dir, f'sample_{i}.png'))
        else:
            mask = np.asarray(s.get('points_mask',
                                    np.ones(len(s['points']), bool)))
            gtm = np.asarray(s.get('gt_mask', [])).astype(bool)
            gt = np.asarray(s.get('gt_bboxes_3d', np.zeros((0, 7))))
            out = vis.draw_bev(
                points=np.asarray(s['points'])[mask],
                gt_bboxes=gt[gtm][:, :7] if gtm.size else None,
                out_file=os.path.join(args.out_dir, f'sample_{i}.png'),
                pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
        print(f'[{i + 1}/{n}] wrote {out}')


if __name__ == '__main__':
    main()
