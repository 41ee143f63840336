#!/usr/bin/env python
"""Scripted walkthrough of the inference API — the analogue of the
reference's demo/inference_demo.ipynb, runnable headless.

Steps through: (1) building a detector from a config, (2) loading a
checkpoint (orbax dir or reference .pth via the mapping tables),
(3) single-cloud inference, (4) reading the prediction dict, and
(5) rendering a BEV visualization. Run with no arguments to use the
vendored KITTI demo cloud and a random-init PointPillars.

Usage: python demo/inference_demo.py [--config CFG] [--pcd CLOUD.bin]
       [--checkpoint DIR_or_PTH] [--out-dir demo_out]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', default=os.path.join(
        ROOT, 'configs/pointpillars/pointpillars_kitti_3class.py'))
    p.add_argument('--pcd', default=os.path.join(
        ROOT, 'tests/data/demo/kitti/000008.bin'))
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    import numpy as np

    print('== step 1: build the detector from config ==')
    from tpu_bev3d.apis import inference_detector, init_model
    model = init_model(args.config, checkpoint=args.checkpoint)
    print(f'   model type: {model.cfg.model.type}')

    print('== step 2: load a point cloud ==')
    if os.path.exists(args.pcd):
        pts = np.fromfile(args.pcd, np.float32).reshape(-1, 4)
    else:
        print(f'   ({args.pcd} missing; using a synthetic cloud)')
        rng = np.random.default_rng(0)
        pts = rng.uniform([0, -40, -3, 0], [70, 40, 1, 1],
                          (8192, 4)).astype(np.float32)
    print(f'   {pts.shape[0]} points, {pts.shape[1]} features')

    print('== step 3: run inference ==')
    result = inference_detector(model, pts)[0]

    print('== step 4: read the prediction dict ==')
    boxes = np.asarray(result['bboxes'])
    scores = np.asarray(result['scores'])
    labels = np.asarray(result['labels'])
    keep = scores >= args.score_thr
    print(f'   {int(keep.sum())} detections >= {args.score_thr} '
          f'(of {scores.shape[0]} slots)')
    for b, s, l in list(zip(boxes[keep], scores[keep], labels[keep]))[:5]:
        print(f'   label={int(l)} score={float(s):.3f} '
              f'xyz=({b[0]:.1f},{b[1]:.1f},{b[2]:.1f}) '
              f'lwh=({b[3]:.1f},{b[4]:.1f},{b[5]:.1f}) yaw={b[6]:.2f}')

    print('== step 5: render a BEV visualization ==')
    os.makedirs(args.out_dir, exist_ok=True)
    from tpu_bev3d.visualization import Det3DVisualizer
    vis = Det3DVisualizer()
    out_png = os.path.join(args.out_dir, 'inference_demo_bev.png')
    vis.draw_bev(points=pts, pred_bboxes=boxes[keep],
                 pred_labels=labels[keep], out_file=out_png)
    print(f'   wrote {out_png}')


if __name__ == '__main__':
    main()
