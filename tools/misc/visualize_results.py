#!/usr/bin/env python
"""Render saved prediction results over their dataset frames (ref:
tools/misc/visualize_results.py — loads a results pkl produced by
tools/test.py --out and renders per-frame, headless).

Usage: python tools/misc/visualize_results.py CONFIG RESULTS.pkl
       [--out-dir vis_out] [--score-thr 0.3] [--num 10]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('results')
    p.add_argument('--out-dir', default='vis_out')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--num', type=int, default=10)
    args = p.parse_args()

    import numpy as np
    import tpu_bev3d.datasets  # noqa: F401
    from tpu_bev3d.config import Config
    from tpu_bev3d.registry import DATASETS
    from tpu_bev3d.visualization import Det3DVisualizer

    cfg = Config.fromfile(args.config)
    ds_cfg = dict(cfg.get('val_dataloader', cfg.get(
        'test_dataloader', cfg.get('train_dataloader')))['dataset']) \
        if any(k in cfg for k in ('val_dataloader', 'test_dataloader',
                                  'train_dataloader')) \
        else dict(cfg.get('val_dataset', cfg.train_dataset))
    ds = DATASETS.build(ds_cfg)
    with open(args.results, 'rb') as f:
        results = pickle.load(f)
    if isinstance(results, dict):
        results = results.get('results', list(results.values())[0])

    vis = Det3DVisualizer(classes=list(getattr(ds, 'classes', [])))
    os.makedirs(args.out_dir, exist_ok=True)
    pcr = cfg.model.get('point_cloud_range', (-54, -54, -5, 54, 54, 3))

    n = min(args.num, len(results), len(ds))
    for i in range(n):
        r = results[i]
        scores = np.asarray(r.get('scores', r.get('scores_3d', [])))
        boxes = np.asarray(r.get('bboxes', r.get('bboxes_3d',
                                                 np.zeros((0, 7)))))
        labels = np.asarray(r.get('labels', r.get('labels_3d',
                                                  np.zeros(0, np.int64))))
        keep = scores > args.score_thr if scores.size else np.zeros(0, bool)
        s = ds[i]
        if 'pts_semantic_mask' in r:
            out = vis.draw_seg_mask(
                np.asarray(s['points'])[:, :3],
                np.asarray(r['pts_semantic_mask']),
                out_file=os.path.join(args.out_dir, f'frame_{i}.png'),
                pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
        else:
            mask = np.asarray(s.get('points_mask',
                                    np.ones(len(s['points']), bool)))
            gtm = np.asarray(s.get('gt_mask', [])).astype(bool)
            gt = np.asarray(s.get('gt_bboxes_3d', np.zeros((0, 7))))
            out = vis.draw_bev(
                points=np.asarray(s['points'])[mask],
                gt_bboxes=gt[gtm][:, :7] if gtm.size else None,
                pred_bboxes=boxes[keep][:, :7] if keep.size else None,
                pred_labels=labels[keep] if keep.size else None,
                out_file=os.path.join(args.out_dir, f'frame_{i}.png'),
                pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
        print(f'[{i + 1}/{n}] wrote {out}')


if __name__ == '__main__':
    main()
